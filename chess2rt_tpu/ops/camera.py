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
import numpy as np

from ..models.packed import CameraPacked
from ..utils import vec


def _norm(v):
    return v / jnp.sqrt((v * v).sum(-1, keepdims=True))


def _begin_frame_df(cam: CameraPacked, aspect: float):
    """Screen corners in df32 (two-float ~f64) precision.

    Reproduces beginFrame's f64 corner math (camera.d:77-117) with
    emulated double-float arithmetic (ops/df32.py): angles, tan(fov/2),
    the 3-rotation product and the corner row-vector multiplies all carry
    ~48-bit significands, so the per-ray direction rounded back to f32 is
    correctly rounded — the ~1-2 ulp corner errors that the 1/dir.y
    horizon amplification turns into whole-texel UV mistakes are gone
    (round-4 VERDICT item 5; opt-in via SceneStatic.compensated_raygen).

    Returns {"ul": [(hi,lo)]*3, "dx": ..., "dy": ...} where dx = ur-ul,
    dy = dl-ul are the interpolation deltas, each component a df32 pair
    of f32 scalars.
    """
    from . import df32 as df

    rad = np.pi / 180.0  # host f64; split exactly into df32 below
    fov_half = df.mul_f32(df.const(rad / 2.0), cam.fov)
    wanted = df.tan(fov_half)
    # x = -aspect, y = 1 (camera.d:88-93); aspect is a host f64
    aspect_d = df.const(float(aspect))
    len_xy = df.sqrt(df.add(df.mul(aspect_d, aspect_d), df.const(1.0)))
    scaling = df.div(wanted, len_xy)
    xs = df.neg(df.mul(aspect_d, scaling))
    ys = scaling
    one = df.const(1.0)

    def rot_axis(i, j, angle):
        s, c = df.sincos(df.mul_f32(df.const(rad), angle))
        zero, uno = df.const(0.0), df.const(1.0)
        m = [[uno if r == col else zero for col in range(3)] for r in range(3)]
        m[i][i] = c
        m[i][j] = df.neg(s)
        m[j][i] = s
        m[j][j] = c
        return m

    def matmul(a, b):
        return [
            [
                df.add(df.add(df.mul(a[r][0], b[0][col]), df.mul(a[r][1], b[1][col])),
                       df.mul(a[r][2], b[2][col]))
                for col in range(3)
            ]
            for r in range(3)
        ]

    # rotZ(roll) @ rotX(pitch) @ rotY(yaw), row-vector convention
    rot = matmul(matmul(rot_axis(0, 1, cam.roll), rot_axis(1, 2, cam.pitch)),
                 rot_axis(2, 0, cam.yaw))

    def mulr(v):  # row vector times matrix: out_j = sum_i v_i rot[i][j]
        return [
            df.add(df.add(df.mul(v[0], rot[0][j]), df.mul(v[1], rot[1][j])),
                   df.mul(v[2], rot[2][j]))
            for j in range(3)
        ]

    ul = mulr([xs, ys, one])
    ur = mulr([df.neg(xs), ys, one])
    dl = mulr([xs, df.neg(ys), one])
    return {
        "ul": ul,
        "dx": [df.sub(ur[j], ul[j]) for j in range(3)],
        "dy": [df.sub(dl[j], ul[j]) for j in range(3)],
    }


def begin_frame(cam: CameraPacked, aspect: float, compensated: bool = False):
    """Screen corners + basis from camera params (camera.d:77-117).

    ``compensated=True`` additionally attaches df32 (two-float) corner
    pairs under key "df"; ``screen_rays`` then interpolates those and
    rounds the direction to f32 last (see _begin_frame_df).
    """
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
    out = {} if not compensated else {"df": _begin_frame_df(cam, aspect)}
    out.update({
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
    })
    return out


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
    if "df" in frame and not dof:
        # compensated (df32) interpolation: corners, pixel fractions and
        # the normalize all carry ~48-bit significands; dir is rounded to
        # f32 LAST, so it is correctly rounded per component (the opt-in
        # compensated_raygen path — see _begin_frame_df)
        from . import df32 as dfm

        c = frame["df"]
        fx_d = dfm.div((x, jnp.zeros_like(x)), dfm.const(float(width), like=x))
        fy_d = dfm.div((y, jnp.zeros_like(y)), dfm.const(float(height), like=y))
        t = [
            dfm.add(c["ul"][j],
                    dfm.add(dfm.mul(c["dx"][j], fx_d), dfm.mul(c["dy"][j], fy_d)))
            for j in range(3)
        ]
        n2 = dfm.add(dfm.add(dfm.mul(t[0], t[0]), dfm.mul(t[1], t[1])),
                     dfm.mul(t[2], t[2]))
        ln = dfm.sqrt(n2)
        dir = jnp.stack([dfm.to_f32(dfm.div(t[j], ln)) for j in range(3)], axis=-1)
        target_rel = jnp.stack([dfm.to_f32(t[j]) for j in range(3)], axis=-1)
    else:
        # interpolate pos-free corners (see begin_frame): dir never touches
        # the large camera position, so grazing rays keep full relative
        # precision
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
