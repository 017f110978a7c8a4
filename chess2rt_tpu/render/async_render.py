"""Async render dispatch (renderSceneAsync parity, renderer.d:23-44).

The reference spawns a render thread and communicates with the GUI through
two atomic bools (isRendering + a needsRendering stop request checked
between passes).  The TPU equivalent: device dispatch is already async, so
the wrapper just runs pack+jit+block on a worker thread and exposes the
same two signals — ``is_rendering`` and ``request_stop()``.  Stopping is
cooperative at pass granularity like the reference: a stop before dispatch
skips the frame; once the device is running a frame, it completes
(SURVEY.md §2.7: the per-bucket stop has no equivalent in a batch
renderer)."""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np


class RenderHandle:
    def __init__(self):
        self._done = threading.Event()
        self._stop = threading.Event()
        self.frame: Optional[np.ndarray] = None
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
) -> RenderHandle:
    """Kick off a full-frame render on a worker thread; returns immediately
    with a RenderHandle (isRendering semantics of renderer.d:23-44)."""
    handle = RenderHandle()

    def work():
        try:
            import jax
            import jax.numpy as jnp

            from ..models.packed import pack_scene
            from .pipeline import render_frame

            if handle._stop.is_set():
                return
            packed, static = pack_scene(scene, dtype=dtype or jnp.float32)
            if handle._stop.is_set():
                return
            k = key if key is not None else jax.random.PRNGKey(0)
            out = jax.jit(lambda p, kk: render_frame(p, static, kk))(packed, k)
            handle.frame = np.asarray(jax.block_until_ready(out))
            if callback is not None and not handle._stop.is_set():
                callback(handle.frame)
        except BaseException as e:  # surfaced via result()
            handle.error = e
        finally:
            handle._done.set()

    threading.Thread(target=work, name="chess2rt-render", daemon=True).start()
    return handle
