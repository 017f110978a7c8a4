"""Inverse rendering THROUGH the bump extension: recover the BumpTexture
strength and a surface albedo from a target image, on hardware, via the
bump hybrid's custom VJP (ops/pallas_grad.build_bump_round0 — the fast
kernel-record forward, the tangent-carrying leaf-pinned reshade backward).

Scene: the demos/bump_probe.py coverage scene with the CSG node left
un-bumped, so the hybrid takes its FAST forward (_fast_bump_ok) — the
fit exercises exactly the production bump path.  The demo perturbs
``bump_strength`` (x0.3) and the shared Lambert albedo (x0.6), recovers
both with Adam on pixel L2, and finishes with an on-hardware central-
difference check on the strength scale (strength enters the perturbed
normal linearly and the texel picks don't depend on it, so with a fixed
key the loss is a smooth deterministic function of it).

    python demos/bump_inverse.py --cpu     # quick CPU run
    python demos/bump_inverse.py           # TPU (fused bump hybrid)

Exits nonzero unless both parameters recover.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from chess2rt_tpu.grad import InverseProblem, fit  # noqa: E402
from chess2rt_tpu.render.pipeline import render_frame  # noqa: E402
from demos.bump_probe import build  # noqa: E402


def fd_check(packed, static, key):
    """Central-difference check of d(loss)/d(bump-strength scale).

    The autodiff side differentiates w.r.t. the FULL ScenePacked pytree
    and takes the directional derivative along bump_strength (dL/ds at
    s=1 == <dL/dstrength, strength>): the scalar-scale and single-field
    grad graphs are yet more triggers of the TPU fusion-pass SIGILL
    (CLAUDE.md env facts), while the full-pytree grad is exactly the
    graph the fit and `demos/bump_probe.py --grad` compile and run."""

    def loss(s):
        p = dataclasses.replace(packed, bump_strength=packed.bump_strength * s)
        return (render_frame(p, static, key) ** 2).mean()

    g_packed = jax.jit(
        jax.grad(lambda p: (render_frame(p, static, key) ** 2).mean())
    )(packed)
    g = float((g_packed.bump_strength * packed.bump_strength).sum())
    # h must stay under the cos_t > 0 kink spacing: unlike light power
    # (linear in the shading), strength moves lighting CUTOFF thresholds,
    # so the loss is piecewise-smooth.  Measured ladder at 160x120 on TPU:
    # h=1e-2 reads 30% off (kink crossings), 1e-3 still 15%, 3e-4
    # converges to autodiff at rel ~1e-4 (kink density grows with the
    # lane count; 96x72 CPU converged already at 1e-3)
    h = 3e-4
    fd = (
        float(jax.jit(loss)(jnp.float32(1.0 + h)))
        - float(jax.jit(loss)(jnp.float32(1.0 - h)))
    ) / (2 * h)
    rel = abs(g - fd) / max(abs(fd), 1e-12)
    print(f"FD check (bump strength): autodiff {g:.6e} vs central-diff {fd:.6e} (rel {rel:.2e})")
    return rel < 2e-2 and g != 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="160x120")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    packed, static = build(w, h, bump=True, csg_bump=False)
    static = dataclasses.replace(static, aa_enabled=False, use_pallas=not args.cpu)
    from chess2rt_tpu.ops.pallas_grad import _fast_bump_ok

    assert _fast_bump_ok(static), "demo scene must take the fast bump forward"
    key = jax.random.PRNGKey(7)
    target = render_frame(packed, static, key)
    print(f"# backend {jax.default_backend()}; {w}x{h}, bump hybrid fast path")

    wrong = dataclasses.replace(
        packed,
        bump_strength=packed.bump_strength * 0.3,
        mat_color=packed.mat_color * 0.6,
    )

    log = lambda i, l: (i % 25 == 0) and print(f"step {i}: loss {l:.3e}")  # noqa: E731
    prob = InverseProblem(
        static=static, target=target,
        train_fields=("bump_strength", "mat_color"),
        learning_rate=2e-2, steps=args.steps,
        # strength is O(8) while albedo is O(1): matching Adam scale
        update_scales={"bump_strength": 4.0},
    )
    fitted, losses = fit(wrong, prob, key=key, on_step=log)

    bumped = np.asarray([ns.bump_idx >= 0 for ns in static.nodes])
    err_strength = float(
        jnp.abs(fitted.bump_strength - packed.bump_strength)[bumped].max()
        / jnp.abs(packed.bump_strength)[bumped].max()
    )
    err_albedo = float(jnp.abs(fitted.mat_color - packed.mat_color).max())
    print(
        f"loss {losses[0]:.3e} -> {losses[-1]:.3e}; bump strength rel err "
        f"{err_strength:.4f}; albedo err {err_albedo:.4f}"
    )

    fd_ok = fd_check(packed, static, key)
    ok = (
        losses[-1] < losses[0] * 0.02
        and err_strength < 0.02
        and err_albedo < 0.02
        and fd_ok
    )
    print("RECOVERED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
