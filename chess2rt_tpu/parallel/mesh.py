"""Distribution: pixel-tile data parallelism over a jax.sharding.Mesh.

The reference's only parallelism is a thread pool over 48x48 image buckets
(renderer.d:133-136, SURVEY.md §2.7).  The TPU-native equivalent is:

* a 1-D device mesh over all chips (across hosts when launched under
  ``jax.distributed.initialize``) with axis name ``"px"``;
* the flattened pixel/ray batch **sharded** over that axis, the ScenePacked
  parameter pytree **replicated**;
* the forward render is embarrassingly parallel — zero collectives; the
  framebuffer shards are gathered only at the host boundary;
* the backward pass (inverse rendering) combines per-shard parameter
  gradients with a single ``pmean`` — XLA lowers it to an all-reduce over
  ICI within a slice and DCN across hosts, overlapped with backward compute
  by the latency-hiding scheduler (SURVEY.md §5.8).

Everything is expressed with ``shard_map`` so the collectives are explicit
and the per-shard code is exactly the single-chip pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.packed import ScenePacked, SceneStatic
from ..render.pipeline import AA_KERNEL, begin_frame, render_samples

AXIS = "px"


def make_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis "px" shards pixels."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (AXIS,))


def _pixel_coords(static: SceneStatic, n_shards: int, dtype):
    """Flat pixel coords padded to a multiple of the shard count.  Padding
    pixels re-render pixel (0, 0) and are dropped on reshape."""
    W, H = static.width, static.height
    n = W * H
    pad = (-n) % n_shards
    ys, xs = np.mgrid[0:H, 0:W]
    xf = np.concatenate([xs.reshape(-1), np.zeros(pad, dtype=np.int64)])
    yf = np.concatenate([ys.reshape(-1), np.zeros(pad, dtype=np.int64)])
    return xf.astype(dtype), yf.astype(dtype), n


def _frame_from_samples(flat, static: SceneStatic):
    n = static.width * static.height
    return flat[:n].reshape(static.height, static.width, 3)


def _sample_pixels(packed: ScenePacked, static: SceneStatic, xf, yf, key):
    """Per-shard sampling incl. the AA supersample — identical math to the
    single-chip render_frame (render/pipeline.py)."""
    frame = begin_frame(packed.camera, static.width / static.height)
    img = render_samples(packed, static, frame, xf, yf, key)
    if static.aa_enabled:
        offsets = jnp.asarray(AA_KERNEL, dtype=xf.dtype)

        def aa_body(carry, off):
            i, acc = carry
            kk = jax.random.fold_in(key, i)
            s = render_samples(packed, static, frame, xf + off[0], yf + off[1], kk)
            return (i + 1, acc + s), None

        (_, acc), _ = jax.lax.scan(aa_body, (jnp.int32(1), img), offsets)
        img = acc / 5.0
    return img


def make_sharded_render_fn(static: SceneStatic, mesh: Mesh):
    """Compile ``fn(packed, key) -> [H, W, 3]`` with pixels sharded over the
    mesh.  Per-shard work = the plain single-chip sampling pipeline."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
    )
    def shard_render(packed: ScenePacked, xf, yf, key):
        # decorrelate stochastic sampling (DoF/GI jitter) across shards
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        return _sample_pixels(packed, static, xf, yf, key)

    n_shards = mesh.devices.size

    @jax.jit
    def fn(packed: ScenePacked, key):
        dt = packed.node_matrix.dtype
        xf, yf, _ = _pixel_coords(static, n_shards, np.float64)
        xs = jax.device_put(jnp.asarray(xf, dtype=dt), NamedSharding(mesh, P(AXIS)))
        ys = jax.device_put(jnp.asarray(yf, dtype=dt), NamedSharding(mesh, P(AXIS)))
        flat = shard_render(packed, xs, ys, key)
        return _frame_from_samples(flat, static)

    return fn


def render_frame_distributed(packed: ScenePacked, static: SceneStatic, mesh=None, key=None):
    """One-shot distributed render."""
    mesh = mesh if mesh is not None else make_mesh()
    fn = make_sharded_render_fn(static, mesh)
    return fn(packed, key if key is not None else jax.random.PRNGKey(0))


def make_sharded_value_and_grad(static: SceneStatic, mesh: Mesh):
    """Compile ``fn(packed, target_hw3, key) -> (loss, grads)`` for inverse
    rendering: pixel-sharded forward, per-shard backward, and a single pmean
    all-reduce of the parameter gradients over ICI/DCN (SURVEY.md §5.8).

    loss = mean squared error against the target frame."""
    n_shards = mesh.devices.size

    def shard_loss(packed, xf, yf, target, weight, key):
        img = _sample_pixels(packed, static, xf, yf, key)
        # weight zeroes the padding lanes so they don't pollute the loss
        return ((img - target) ** 2 * weight[..., None]).sum() / (static.width * static.height * 3)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS, None), P(AXIS), P()),
        out_specs=(P(), P()),
    )
    def shard_step(packed, xf, yf, target, weight, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
        loss, grads = jax.value_and_grad(shard_loss)(packed, xf, yf, target, weight, key)
        # ``packed`` enters with spec P() (replicated over the mesh), so
        # shard_map's AD transposes its broadcast with an automatic psum:
        # ``grads`` is already the cross-shard-summed (= global, since the
        # per-shard loss carries the global normalization) gradient — this
        # IS the ICI/DCN all-reduce of SURVEY.md §5.8, inserted by the
        # partitioner and overlapped with backward compute.  The scalar loss
        # is still per-shard and needs its explicit psum.
        return jax.lax.psum(loss, AXIS), grads

    @jax.jit
    def fn(packed: ScenePacked, target, key):
        dt = packed.node_matrix.dtype
        xf, yf, n = _pixel_coords(static, n_shards, np.float64)
        pad = xf.shape[0] - n
        sh = NamedSharding(mesh, P(AXIS))
        xs = jax.device_put(jnp.asarray(xf, dtype=dt), sh)
        ys = jax.device_put(jnp.asarray(yf, dtype=dt), sh)
        tflat = target.reshape(-1, 3).astype(dt)
        tflat = jnp.concatenate([tflat, jnp.zeros((pad, 3), dtype=dt)])
        weight = jnp.concatenate([jnp.ones(n, dtype=dt), jnp.zeros(pad, dtype=dt)])
        tflat = jax.device_put(tflat, NamedSharding(mesh, P(AXIS, None)))
        weight = jax.device_put(weight, sh)
        return shard_step(packed, xs, ys, tflat, weight, key)

    return fn
