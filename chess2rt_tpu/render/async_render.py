"""Async render dispatch (renderSceneAsync parity, renderer.d:23-44).

The reference spawns a render thread that walks a multi-pass pipeline —
coarse prepass flat-fill (renderer.d:110-127), 1-sample main pass
(:133-141), AA resample (:183-186) — publishing the framebuffer to the GUI
after each pass and checking the ``needsRendering`` stop request BETWEEN
passes (renderer.d:129, :147, :180).  This wrapper reproduces that
structure on the device: each pass is one jitted dispatch, the callback
fires per pass with the progressively-refined frame, and ``request_stop``
cancels cooperatively at pass granularity — exactly the reference's
cancellation grain (a per-bucket stop has no equivalent in a batch
renderer, SURVEY.md §2.7)."""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np


class RenderHandle:
    def __init__(self):
        self._done = threading.Event()
        self._stop = threading.Event()
        self.frame: Optional[np.ndarray] = None
        self.passes_completed = 0
        self.error: Optional[BaseException] = None

    @property
    def is_rendering(self) -> bool:
        return not self._done.is_set()

    def request_stop(self) -> None:
        """Cooperative cancellation (the needsRendering flag's stop role)."""
        self._stop.set()

    def result(self, timeout=None) -> np.ndarray:
        self._done.wait(timeout)
        if self.error is not None:
            raise self.error
        return self.frame


def render_scene_async(
    scene,
    callback: Optional[Callable[[np.ndarray], None]] = None,
    dtype=None,
    key=None,
    prepass_scale: int = 16,
) -> RenderHandle:
    """Kick off a progressive multi-pass render on a worker thread; returns
    immediately with a RenderHandle (isRendering semantics, renderer.d:23-44).

    Pass schedule (mirrors renderRT, renderer.d:83-189):
      1. prepass: 1 ray per ``prepass_scale``-pixel block, flat-filled —
         skipped when the scene disables prepassEnabled;
      2. main: full-resolution base sample (AA off);
      3. AA: the 5-tap supersample — skipped when AAEnabled is off or
         prepassOnly is set.
    ``callback`` (the GUI display role) receives the frame after every
    completed pass; ``request_stop()`` takes effect between passes."""
    handle = RenderHandle()

    def work():
        try:
            import dataclasses

            import jax
            import jax.numpy as jnp

            from ..models.packed import pack_scene
            from .pipeline import render_frame

            k = key
            if handle._stop.is_set():
                return
            packed, static = pack_scene(scene, dtype=dtype or jnp.float32)
            if k is None:
                k = jax.random.PRNGKey(0)

            def publish(img):
                handle.frame = np.asarray(img)
                handle.passes_completed += 1
                if callback is not None:
                    callback(handle.frame)

            def run_pass(st):
                out = jax.jit(lambda p, kk: render_frame(p, st, kk), static_argnums=())(packed, k)
                return np.asarray(jax.block_until_ready(out))

            # PASS 1: coarse prepass flat-fill (renderer.d:110-127)
            if getattr(scene.settings, "prepassEnabled", True) and prepass_scale > 1:
                if handle._stop.is_set():
                    return
                s = prepass_scale
                coarse = dataclasses.replace(
                    static,
                    width=max(1, static.width // s),
                    height=max(1, static.height // s),
                    aa_enabled=False,
                )
                img = run_pass(coarse)
                img = np.repeat(np.repeat(img, s, axis=0), s, axis=1)[: static.height, : static.width]
                publish(img)
                if getattr(scene.settings, "prepassOnly", False):
                    return

            # PASS 2: full-res base sample (renderer.d:133-141)
            if handle._stop.is_set():
                return
            publish(run_pass(dataclasses.replace(static, aa_enabled=False)))

            # PASS 3/4: AA supersample (renderer.d:183-186)
            if static.aa_enabled:
                if handle._stop.is_set():
                    return
                publish(run_pass(static))
        except BaseException as e:  # surfaced via result()
            handle.error = e
        finally:
            handle._done.set()

    threading.Thread(target=work, name="chess2rt-render", daemon=True).start()
    return handle
