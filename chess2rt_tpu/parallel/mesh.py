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


def make_mesh_2d(devices=None, hosts=None) -> Mesh:
    """2-D (hosts x chips) mesh (SURVEY.md §5.8).  Pixels shard over BOTH
    axes (the flat ray batch is tiled over the full device grid); the
    gradient all-reduce then decomposes into a chip-axis reduce riding ICI
    and a host-axis reduce riding DCN.  ``hosts`` defaults to
    jax.process_count() when multi-process, else the largest power-of-two
    split."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if hosts is None:
        hosts = jax.process_count()
        if hosts <= 1 or n % hosts:
            hosts = 1
            while n % (hosts * 2) == 0 and (hosts * 2) * (hosts * 2) <= n:
                hosts *= 2
    assert n % hosts == 0, (n, hosts)
    return Mesh(devices.reshape(hosts, n // hosts), ("host", "chip"))


def _axes(mesh: Mesh):
    return tuple(mesh.axis_names)


def _linear_index(axes):
    """Global linear shard index over (possibly several) mesh axes."""
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
    return idx


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
    mesh (1-D "px" or 2-D (host, chip) — the flat ray batch tiles over ALL
    mesh axes).  Per-shard work = the plain single-chip pipeline."""
    axes = _axes(mesh)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P()),
        out_specs=P(axes),
    )
    def shard_render(packed: ScenePacked, xf, yf, key):
        # decorrelate stochastic sampling (DoF/GI jitter) across shards
        key = jax.random.fold_in(key, _linear_index(axes))
        return _sample_pixels(packed, static, xf, yf, key)

    n_shards = mesh.devices.size

    @jax.jit
    def fn(packed: ScenePacked, key):
        dt = packed.node_matrix.dtype
        xf, yf, _ = _pixel_coords(static, n_shards, np.float64)
        xs = jax.device_put(jnp.asarray(xf, dtype=dt), NamedSharding(mesh, P(axes)))
        ys = jax.device_put(jnp.asarray(yf, dtype=dt), NamedSharding(mesh, P(axes)))
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
    axes = _axes(mesh)

    def shard_loss(packed, xf, yf, target, weight, key):
        img = _sample_pixels(packed, static, xf, yf, key)
        # weight zeroes the padding lanes so they don't pollute the loss
        return ((img - target) ** 2 * weight[..., None]).sum() / (static.width * static.height * 3)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axes), P(axes), P(axes, None), P(axes), P()),
        out_specs=(P(), P()),
        # the texel-gradient custom VJP (ops/shade._quad_gather) is opaque
        # to the varying-mesh-axes inference, which then can't prove the
        # grads replicated; the explicit psums below make it true by
        # construction (asserted against single-device grads in
        # tests/test_parallel.py)
        check_vma=False,
    )
    def shard_step(packed, xf, yf, target, weight, key):
        key = jax.random.fold_in(key, _linear_index(axes))
        loss, grads = jax.value_and_grad(shard_loss)(packed, xf, yf, target, weight, key)
        # Per-shard gradients are combined by ONE explicit psum per leaf —
        # the ICI/DCN all-reduce of SURVEY.md §5.8 (on a 2-D (host, chip)
        # mesh XLA decomposes it into an ICI stage and a DCN stage),
        # overlapped with backward compute by the latency-hiding scheduler.
        # (With check_vma=False — needed because the texel-gradient
        # custom VJP is opaque to the replication checker — shard_map does
        # NOT insert the broadcast-transpose psum automatically; grads
        # correctness vs single-device is pinned by tests/test_parallel.py.)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axes), grads)
        return jax.lax.psum(loss, axes), grads

    @jax.jit
    def fn(packed: ScenePacked, target, key):
        dt = packed.node_matrix.dtype
        xf, yf, n = _pixel_coords(static, n_shards, np.float64)
        pad = xf.shape[0] - n
        sh = NamedSharding(mesh, P(axes))
        xs = jax.device_put(jnp.asarray(xf, dtype=dt), sh)
        ys = jax.device_put(jnp.asarray(yf, dtype=dt), sh)
        tflat = target.reshape(-1, 3).astype(dt)
        tflat = jnp.concatenate([tflat, jnp.zeros((pad, 3), dtype=dt)])
        weight = jnp.concatenate([jnp.ones(n, dtype=dt), jnp.zeros(pad, dtype=dt)])
        tflat = jax.device_put(tflat, NamedSharding(mesh, P(axes, None)))
        weight = jax.device_put(weight, sh)
        return shard_step(packed, xs, ys, tflat, weight, key)

    return fn
