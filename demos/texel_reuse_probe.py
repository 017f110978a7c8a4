"""AA-tap texel-key stability probe (round 4).

Measures, per AA kernel tap offset (renderer.d:235-242), the fraction of
rays whose bilinear texel QUAD KEY differs from the base tap's — the
premise check for `texel_tap_reuse` (reuse the base tap's gathered quads,
re-gather only changed lanes; ops/pallas_trace._reused_quads).

Measured on the flagship (lecture5 + mirror, 1080p, v5e, 2026-08-19):
changed fraction per tap = [0.39, 0.30, 0.50, 0.53] — the horizon floor
and globe are MINIFIED (texel footprint per pixel > 1), so sub-pixel
offsets land on different quads half the time and the reuse machinery
LOSES (67.8 vs 65.5 ms).  On magnified-texture scenes the fraction drops
toward the silhouette-edge share and reuse pays; run this probe before
flipping `texel_tap_reuse` on.

    python demos/texel_reuse_probe.py [--size 1920x1080]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from bench import build
    from chess2rt_tpu.ops import shade as S
    from chess2rt_tpu.ops.pallas_trace import build_round0_kernel
    from chess2rt_tpu.render.pipeline import AA_KERNEL

    w, h = (int(v) for v in args.size.split("x"))
    packed, static = build(w, h)
    static = dataclasses.replace(static, aa_enabled=False)
    kern = build_round0_kernel(static, w, h, interpret=args.cpu)

    def keys_of(off):
        o = kern(packed, jnp.asarray(off, jnp.float32))
        winc = jnp.maximum(o["win"], 0)
        onehot = S.node_onehot(static, winc)
        _, key, _, _ = S.bitmap_plan(packed, static, winc, o["u"], o["v"], onehot)
        return key

    @jax.jit
    def fracs():
        k0 = keys_of((0.0, 0.0))
        return jnp.stack(
            [jnp.mean((keys_of(off) != k0).astype(jnp.float32)) for off in AA_KERNEL]
        )

    out = np.asarray(fracs())
    for off, f in zip(AA_KERNEL, out):
        print(f"tap {off}: changed texel-key fraction {f:.4f}")
    print(
        "verdict:",
        "reuse plausible" if out.max() < 0.10 else "reuse will NOT pay (minified textures)",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
