"""Inverse rendering demo (BASELINE config #5).

Renders a target frame from lecture4 + a red sphere, perturbs material
colors, light power, and the sphere position, then recovers them with
Adam on pixel L2 — optionally sharded over all visible devices
(--distributed).  Prints recovery errors; exits nonzero on failure.

    JAX_PLATFORMS=cpu python demos/inverse_render.py          # quick CPU run
    python demos/inverse_render.py --distributed               # TPU / mesh
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from chess2rt_tpu.grad import InverseProblem, fit  # noqa: E402
from chess2rt_tpu.models import types as T  # noqa: E402
from chess2rt_tpu.models.packed import pack_scene  # noqa: E402
from chess2rt_tpu.render.pipeline import render_frame  # noqa: E402
from chess2rt_tpu.scene.loader import parse_scene_from_file  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x48")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    sc = parse_scene_from_file("/root/reference/data/lecture4.sdl")
    sc.settings.frameWidth, sc.settings.frameHeight = w, h
    sc.camera.set_frame_size(w, h)
    sc.settings.AAEnabled = False
    sc.nodes.append(
        T.Node(
            name="ball",
            geometry=T.Sphere(name="b", center=(0.0, 60.0, 150.0), R=40.0),
            shader=T.Lambert(name="red", color=(0.9, 0.1, 0.1)),
        )
    )
    packed, static = pack_scene(sc, dtype=jnp.float32)
    target = render_frame(packed, static, jax.random.PRNGKey(0))

    # perturb: colors x0.4, light power x0.5, sphere shifted 1.5 units
    wrong = dataclasses.replace(
        packed,
        mat_color=packed.mat_color * 0.4,
        checker_c2=packed.checker_c2 * 0.4,
        light_power=packed.light_power * 0.5,
        sphere_center=packed.sphere_center + jnp.asarray([[1.5, 0.0, 0.0]]),
    )

    mesh = None
    if args.distributed:
        from chess2rt_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(f"mesh: {mesh.devices.size} devices")

    prob = InverseProblem(
        static=static,
        target=target,
        train_fields=("mat_color", "checker_c2", "light_power", "sphere_center"),
        learning_rate=2e-2,
        steps=args.steps,
        mesh=mesh,
        checkpoint_path=args.checkpoint,
    )
    fitted, losses = fit(wrong, prob, on_step=lambda i, l: (i % 25 == 0) and print(f"step {i}: loss {l:.3e}"))

    err_color = float(jnp.abs(fitted.mat_color - packed.mat_color).max())
    err_pos = float(jnp.abs(fitted.sphere_center - packed.sphere_center).max())
    rel_power = float(jnp.abs(fitted.light_power - packed.light_power) / packed.light_power)
    print(
        f"loss {losses[0]:.3e} -> {losses[-1]:.3e}; max color err {err_color:.3f}; "
        f"sphere pos err {err_pos:.2f}; light power rel err {rel_power:.3f}"
    )
    ok = losses[-1] < losses[0] * 0.1 and err_color < 0.2
    print("RECOVERED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
