"""Device-side camera: differentiable ray generation (camera.d:77-174).

``begin_frame`` computes the rotated screen-corner vectors in-graph from the
traced camera parameters, so gradients flow to pos/yaw/pitch/roll/fov;
``screen_rays`` bilinearly interpolates the corners per pixel.  DoF jitter
uses jax.random (threefry) instead of the reference's time-seeded libc rand
(util/random.d:7-10) — renders are reproducible per key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.packed import CameraPacked
from ..utils import vec


def _norm(v):
    return v / jnp.sqrt((v * v).sum(-1, keepdims=True))


def begin_frame(cam: CameraPacked, aspect: float):
    """Screen corners + basis from camera params (camera.d:77-117)."""
    dt = cam.pos.dtype
    rad = jnp.asarray(jnp.pi / 180.0, dt)
    x = -aspect
    y = 1.0
    len_xy = jnp.sqrt(jnp.asarray(x * x + y * y, dt))
    wanted = jnp.tan(cam.fov * (rad / 2))
    scaling = wanted / len_xy
    xs = x * scaling
    ys = y * scaling
    one = jnp.ones((), dt)

    rot = (
        vec.rotate_z(cam.roll * rad, xp=jnp)
        @ vec.rotate_x(cam.pitch * rad, xp=jnp)
        @ vec.rotate_y(cam.yaw * rad, xp=jnp)
    ).astype(dt)

    mulr = lambda v: jnp.stack(v, axis=-1) @ rot  # row-vector times matrix  # noqa: E731
    return {
        "up_left": mulr([xs, ys, one]) + cam.pos,
        "up_right": mulr([-xs, ys, one]) + cam.pos,
        "down_left": mulr([xs, -ys, one]) + cam.pos,
        # row-vector multiply: e_i @ rot = rot row i (imported_types.d:13-20)
        "right_dir": rot[0],
        "up_dir": rot[1],
        "front_dir": rot[2],
        "pos": cam.pos,
    }


def screen_rays(cam: CameraPacked, frame, width, height, x, y, stereo_offset=0.0, dof=False, key=None):
    """getScreenRay over a batch of (possibly fractional) pixel coords
    (camera.d:119-174).  stereo_offset in {-1, 0, +1}."""
    fx = (x / width)[..., None]
    fy = (y / height)[..., None]
    target = (
        frame["up_left"]
        + (frame["up_right"] - frame["up_left"]) * fx
        + (frame["down_left"] - frame["up_left"]) * fy
    )
    orig = jnp.broadcast_to(frame["pos"], target.shape)
    dir = _norm(target - frame["pos"])
    if stereo_offset:
        orig = orig + frame["right_dir"] * (stereo_offset * cam.stereo_separation)
    if not dof:
        return orig, dir

    # depth of field (camera.d:154-173): focal point along the ray, origin
    # jittered on the unit disc scaled by discMultiplier (= 10/fNumber).
    cos_theta = (dir * frame["front_dir"]).sum(-1)
    M = cam.focal_plane_dist / cos_theta
    T = orig + dir * M[..., None]
    k1, k2 = jax.random.split(key)
    angle = jax.random.uniform(k1, x.shape, dtype=x.dtype) * (2 * jnp.pi)
    rad = jnp.sqrt(jax.random.uniform(k2, x.shape, dtype=x.dtype))
    dx = jnp.sin(angle) * rad * cam.disc_multiplier
    dy = jnp.cos(angle) * rad * cam.disc_multiplier
    orig = frame["pos"] + dx[..., None] * frame["right_dir"] + dy[..., None] * frame["up_dir"]
    if stereo_offset:
        orig = orig + frame["right_dir"] * (stereo_offset * cam.stereo_separation)
    dir = _norm(T - orig)
    return orig, dir
