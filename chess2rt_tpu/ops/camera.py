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
    ul = mulr([xs, ys, one])
    ur = mulr([-xs, ys, one])
    dl = mulr([xs, -ys, one])
    return {
        # *_rel corners are pos-FREE: the reference adds camera.pos here and
        # subtracts it again per ray (camera.d:105-147).  In f32 that round
        # trip cancels catastrophically (corner.y = 165.0196 keeps only
        # ~2e-5 absolute precision around pos.y = 165, so grazing dir.y is
        # wrong by ~0.3% and horizon-plane UVs land on the wrong texels).
        # Interpolating the O(1) relative corners keeps full f32 precision;
        # the sums are mathematically identical.
        "up_left_rel": ul,
        "up_right_rel": ur,
        "down_left_rel": dl,
        # absolute corners kept for parity consumers (debug dumps)
        "up_left": ul + cam.pos,
        "up_right": ur + cam.pos,
        "down_left": dl + cam.pos,
        # row-vector multiply: e_i @ rot = rot row i (imported_types.d:13-20)
        "right_dir": rot[0],
        "up_dir": rot[1],
        "front_dir": rot[2],
        "pos": cam.pos,
    }


def screen_rays(
    cam: CameraPacked, frame, width, height, x, y, stereo_offset=0.0, dof=False, key=None,
    disc_uv=None,
):
    """getScreenRay over a batch of (possibly fractional) pixel coords
    (camera.d:119-174).  stereo_offset in {-1, 0, +1}.

    ``disc_uv``: optional precomputed (angle_u, rad_u) uniforms for the DoF
    disc sample, replacing the in-function draw.  Lane-compacted callers
    use it to reproduce the full-width RNG stream exactly: threefry
    uniforms are positional, so ``uniform(k, (n,))[sel]`` gathered outside
    equals what full-width lanes ``sel`` would draw, while a shape-[cap]
    draw here would not (adaptive-AA DoF compaction)."""
    fx = (x / width)[..., None]
    fy = (y / height)[..., None]
    # interpolate pos-free corners (see begin_frame): dir never touches the
    # large camera position, so grazing rays keep full relative precision
    target_rel = (
        frame["up_left_rel"]
        + (frame["up_right_rel"] - frame["up_left_rel"]) * fx
        + (frame["down_left_rel"] - frame["up_left_rel"]) * fy
    )
    dir = _norm(target_rel)
    stereo_off = frame["right_dir"] * (stereo_offset * cam.stereo_separation) if stereo_offset else 0.0
    if not dof:
        orig = jnp.broadcast_to(frame["pos"], target_rel.shape)
        if stereo_offset:
            orig = orig + stereo_off
        return orig, dir

    # depth of field (camera.d:154-173): focal point along the ray, origin
    # jittered on the unit disc scaled by discMultiplier (= 10/fNumber).
    # Computed pos-relative throughout (T_rel = T - pos) for the same
    # precision reason as above.
    cos_theta = (dir * frame["front_dir"]).sum(-1)
    M = cam.focal_plane_dist / cos_theta
    T_rel = stereo_off + dir * M[..., None]  # focal point, relative to pos
    if disc_uv is None:
        k1, k2 = jax.random.split(key)
        angle_u = jax.random.uniform(k1, x.shape, dtype=x.dtype)
        rad_u = jax.random.uniform(k2, x.shape, dtype=x.dtype)
    else:
        angle_u, rad_u = disc_uv
    angle = angle_u * (2 * jnp.pi)
    rad = jnp.sqrt(rad_u)
    dx = jnp.sin(angle) * rad * cam.disc_multiplier
    dy = jnp.cos(angle) * rad * cam.disc_multiplier
    orig_off = dx[..., None] * frame["right_dir"] + dy[..., None] * frame["up_dir"] + stereo_off
    orig = frame["pos"] + orig_off
    dir = _norm(T_rel - orig_off)
    return orig, dir
