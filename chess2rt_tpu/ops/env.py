"""Environment (miss shader).

The reference Environment returns black unconditionally (environment.d:5-15)
but is the declared hook for a cubemap skybox (the BASELINE zaphod config
lists one; the reference README credits a cubemap screenshot).  This module
implements the natural completion: a 6-face cubemap sampled by ray
direction with bilinear filtering, differentiable w.r.t. the texels.

Face layout (standard cube-mapping, major-axis projection):
    0:+X  1:-X  2:+Y  3:-Y  4:+Z  5:-Z
with per-face (u, v) from the two minor axes over the major magnitude.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_cubemap(cubemap, dir):
    """cubemap [6, S, S, 3], dir [..., 3] (need not be normalized) -> [..., 3]."""
    x, y, z = dir[..., 0], dir[..., 1], dir[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    # face + projective coords (sc, tc, ma) per the standard table
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)

    face = jnp.where(
        is_x,
        jnp.where(x > 0, 0, 1),
        jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    sc = jnp.where(
        is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x))
    )
    tc = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))

    s = (sc / ma + 1.0) * 0.5
    t = (tc / ma + 1.0) * 0.5

    size = cubemap.shape[1]
    fx = s * (size - 1)
    fy = t * (size - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, size - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(fy), 0, size - 1).astype(jnp.int32)
    p = (fx - x0)[..., None]
    q = (fy - y0)[..., None]
    # one 12-float quad gather per ray instead of 4 taps (see
    # ops/shade._quad_atlas; here neighbours clamp at face edges)
    xn = cubemap[:, :, 1:]
    xn = jnp.concatenate([xn, xn[:, :, -1:]], axis=2)
    yn = cubemap[:, 1:]
    yn = jnp.concatenate([yn, yn[:, -1:]], axis=1)
    xyn = yn[:, :, 1:]
    xyn = jnp.concatenate([xyn, xyn[:, :, -1:]], axis=2)
    quads = jnp.concatenate([cubemap, xn, yn, xyn], axis=-1)
    g = quads[face, y0, x0]
    return (
        g[..., 0:3] * (1 - p) * (1 - q)
        + g[..., 3:6] * p * (1 - q)
        + g[..., 6:9] * (1 - p) * q
        + g[..., 9:12] * p * q
    )
