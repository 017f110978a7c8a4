"""CLI entry point: headless render to BMP.

Parity with the reference app surface (app.d:9-39, gui/raytracer_demo.d):
* ``--file=<scene>`` flag (app.d:15); when omitted, the default scene is
  resolved like RTDemo.getPathToDefaultScene (raytracer_demo.d:19-42):
  ``$CHESS2RT_DATA_DIR`` (or the reference data dir) + the scene path named
  by ``default_scene.path``.
* the scene is pretty-printed after load (Scene.toString dump,
  raytracer_demo.d:156).
* screenshots go to ``output/img_<ISO-time>.bmp`` with the reference's
  naming scheme (raytracer_demo.d:227-238) when no --output is given.
* ``--debug-pixel X,Y`` reproduces the left-click single-pixel trace dump
  (renderer.d:46-57, raytracer_demo.d:240-266) — ray, hit node, distance,
  color, hit point, normal, UV — via the float64 oracle, which matches the
  reference's double math.

Interactive SDL windowing is intentionally out of scope for TPU pods
(SURVEY.md §7.1 step 10): headless render + image output covers the
capability.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def default_scene_path() -> str:
    data_dir = os.environ.get("CHESS2RT_DATA_DIR", "/root/reference/data")
    pointer = os.path.join(data_dir, "default_scene.path")
    with open(pointer) as f:
        rel = f.read().strip()
    return os.path.join(data_dir, rel)


def screenshot_name() -> str:
    # img_<ISO-8601, ':' replaced>.bmp (raytracer_demo.d:44-53)
    stamp = time.strftime("%Y-%m-%dT%H.%M.%S")
    return os.path.join("output", f"img_{stamp}.bmp")


def debug_pixel(scene, x: int, y: int) -> str:
    """Single-pixel trace dump (parity: raytracer_demo.d:247-265)."""
    import numpy as np

    from .oracle.renderer import OracleRenderer, begin_frame, get_screen_rays

    r = OracleRenderer(scene)
    orig, dir = get_screen_rays(scene.camera, r.frame, np.array([float(x)]), np.array([float(y)]))
    rec, win = r.closest_hit(orig, dir)
    color = r.raytrace(orig, dir)
    lines = [
        f"Mouse click at: ({x}, {y})",
        f"  Ray origin: ({orig[0][0]:.6g}, {orig[0][1]:.6g}, {orig[0][2]:.6g})",
        f"  Ray direction: ({dir[0][0]:.6g}, {dir[0][1]:.6g}, {dir[0][2]:.6g})",
    ]
    if win[0] < 0:
        lines.append("  No intersection (environment)")
    else:
        node = scene.nodes[int(win[0])]
        lines += [
            f"  Hit node: '{node.name}' geometry={type(node.geometry).__name__} "
            f"shader={type(node.shader).__name__}",
            f"  Distance: {rec.dist[0]:.6g}",
            f"  Color: ({color[0][0]:.6g}, {color[0][1]:.6g}, {color[0][2]:.6g})",
            f"  Hit point: ({rec.p[0][0]:.6g}, {rec.p[0][1]:.6g}, {rec.p[0][2]:.6g})",
            f"  Normal: ({rec.normal[0][0]:.6g}, {rec.normal[0][1]:.6g}, {rec.normal[0][2]:.6g})",
            f"  UV: ({rec.u[0]:.6g}, {rec.v[0]:.6g})",
        ]
    return "\n".join(lines)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="chess2rt_tpu", description=__doc__.split("\n")[0])
    ap.add_argument("--file", default=None, help="scene file (.sdl or .json)")
    ap.add_argument("--output", "-o", default=None, help="output BMP path (default: output/img_<time>.bmp)")
    ap.add_argument("--size", default=None, help="override frame size, WxH")
    ap.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    ap.add_argument("--backend", choices=["jax", "oracle"], default="jax",
                    help="jax = the TPU pipeline; oracle = the float64 numpy reference")
    ap.add_argument("--distributed", action="store_true", help="shard pixels over all visible devices")
    ap.add_argument("--debug-pixel", default=None, metavar="X,Y",
                    help="dump a single-pixel trace (click-to-inspect parity) and exit")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quiet", "-q", action="store_true", help="skip the scene dump")
    ap.add_argument("--stats", action="store_true", help="print per-frame timing")
    args = ap.parse_args(argv)

    from .scene.loader import parse_scene_from_file

    path = args.file or default_scene_path()
    scene = parse_scene_from_file(path)

    if args.size:
        w, h = (int(v) for v in args.size.lower().split("x"))
        scene.settings.frameWidth, scene.settings.frameHeight = w, h
        scene.camera.set_frame_size(w, h)

    if not args.quiet:
        print(f"Loading scene: {path}")
        print(scene.pretty())

    if args.debug_pixel:
        x, y = (int(v) for v in args.debug_pixel.split(","))
        print(debug_pixel(scene, x, y))
        return 0

    t0 = time.perf_counter()
    if args.backend == "oracle":
        from .oracle import render_scene

        img = render_scene(scene, seed=args.seed)
    else:
        import jax
        import jax.numpy as jnp

        dtype = jnp.float64 if args.dtype == "f64" else jnp.float32
        if args.dtype == "f64":
            jax.config.update("jax_enable_x64", True)
        key = jax.random.PRNGKey(args.seed)
        if args.distributed:
            from .models.packed import pack_scene
            from .parallel import make_mesh, render_frame_distributed

            packed, static = pack_scene(scene, dtype=dtype)
            img = render_frame_distributed(packed, static, make_mesh(), key)
        else:
            from .render.pipeline import render_scene_jax

            img = render_scene_jax(scene, dtype=dtype, key=key)
        import numpy as np

        img = np.asarray(jax.block_until_ready(img))
    dt = time.perf_counter() - t0

    out_path = args.output or screenshot_name()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    from .imageio.bmp import save_bmp_file

    save_bmp_file(out_path, img)
    print(f"Saved {scene.settings.frameWidth}x{scene.settings.frameHeight} render to {out_path}")
    if args.stats:
        npx = scene.settings.frameWidth * scene.settings.frameHeight
        print(f"Frame time: {dt:.3f} s ({npx/dt/1e6:.2f} Mpx/s, backend={args.backend})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
