from .pipeline import build_render_fn, render_frame, render_scene_jax, trace_whitted

__all__ = ["build_render_fn", "render_frame", "render_scene_jax", "trace_whitted"]
