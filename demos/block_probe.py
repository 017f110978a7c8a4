"""Measure the bounce continuation set's SPATIAL LOCALITY on the flagship.

bounce_mode="full" pays a full-width combine (incl. the ~8 ms 2M-lane
texel gather) for round 1 even though only ~4% of lanes continue;
lane-granular compaction pays a 2M lax.sort + a 129k-row scatter-add
(~10.8 ms/tap fixed).  If the continuing rays are spatially clustered
(they are — one mirror sphere), compacting at BLOCK granularity makes the
compaction bookkeeping ~free: the sort runs over n/B block keys and the
writeback is cap_blk unique block-row adds.

This probe reports, for the 1080p flagship round-0 continuation mask:
alive lanes, and alive blocks (plus implied compacted width) for block
sizes 128..2048.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build
from chess2rt_tpu.ops.pallas_trace import combine_outputs
from chess2rt_tpu.ops.pallas_grad import build_diff_round0

W, H = 1920, 1080


def main():
    w, h = W, H
    if "--size" in sys.argv:
        w, h = (int(v) for v in sys.argv[sys.argv.index("--size") + 1].split("x"))
    packed, static = build(w, h)
    static = dataclasses.replace(static, use_pallas=True, fast_forward=True)
    print(f"# devices: {jax.devices()}  {w}x{h}", flush=True)
    n = w * h
    kern = build_diff_round0(static, w, h, False)
    # keep only block sizes that divide the pixel count (2048 doesn't
    # divide 1080p's 2073600; arbitrary --size values prune further)
    sizes = [b for b in (128, 256, 512, 1024) if n % b == 0]
    if not sizes:
        raise SystemExit(f"{w}x{h}: no probe block size divides n={n}")

    @jax.jit
    def stats(packed):
        from chess2rt_tpu.models.packed import TEX_BITMAP
        from chess2rt_tpu.ops import shade as S

        o = kern(packed, (0.2, 0.3))
        _, cont, _, _, _ = combine_outputs(packed, static, o, None)
        win = o["win"]
        is_bmp = (S.tex_kind_of(static, jnp.maximum(win, 0)) == TEX_BITMAP) & (win >= 0)
        out = [cont.sum(), is_bmp.sum()]
        for b in sizes:
            out.append(cont.reshape(n // b, b).any(axis=1).sum())
        for b in sizes:
            out.append(is_bmp.reshape(n // b, b).any(axis=1).sum())
        return jnp.stack([x.astype(jnp.int32) for x in out])

    s = np.asarray(stats(packed))
    print(f"alive lanes:  {s[0]} / {n}  ({100.0 * s[0] / n:.2f}%)")
    print(f"is_bmp lanes: {s[1]} / {n}  ({100.0 * s[1] / n:.2f}%)")
    k = 2
    for b, nb in zip(sizes, s[k : k + len(sizes)]):
        print(
            f"cont   B={b:5d}: blocks {nb:6d} / {n // b:6d}"
            f"  -> width {nb * b:8d} lanes ({100.0 * nb * b / n:.2f}%)"
        )
    k += len(sizes)
    for b, nb in zip(sizes, s[k : k + len(sizes)]):
        print(
            f"is_bmp B={b:5d}: blocks {nb:6d} / {n // b:6d}"
            f"  -> width {nb * b:8d} lanes ({100.0 * nb * b / n:.2f}%)"
        )


if __name__ == "__main__":
    main()
