"""Pallas TPU kernel: fused primary-ray render pass.

SURVEY.md §7.1 step 9: after parity, fuse ray-gen + intersect + shade for
the primary bounce into one kernel so the whole per-pixel pipeline runs
out of VMEM with zero HBM round-trips between stages.  The pure-XLA
pipeline (render/pipeline.py) remains the correctness anchor and the
general path; this kernel accelerates the common single-bounce case:

  supported: leaf geometries (plane/sphere/cube) with identity or
  offset-only transforms, flat/checker/procedure2 textures,
  Lambert/Phong shading, any number of point lights, ambient.
  unsupported (falls back to XLA): CSG nodes, bitmap textures (per-lane
  gathers), matrix transforms, reflection/refraction bounces, DoF/GI/
  stereo sampling.

Design notes
* Rays are processed in (8, 128) f32 tiles — the native VPU tile — as
  **SoA scalars**: every vector quantity is three (8, 128) registers, so
  no awkward [..., 3] layouts reach Mosaic.
* The node/light loops unroll statically inside the kernel (scene sizes
  are small); per-node parameters arrive as an f32 parameter vector in
  SMEM, scalar-prefetched so Mosaic folds the reads.
* The camera corner vectors are precomputed outside (they're 7 vec3s) and
  shipped in the same parameter vector, keeping the kernel differentiable
  — but note: this kernel is FORWARD-ONLY (no custom VJP yet); gradient
  paths use the XLA pipeline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.packed import (
    LAMBERT,
    PHONG,
    TEX_CHECKER,
    TEX_NONE,
    TEX_PROC2,
    ScenePacked,
    SceneStatic,
)
from ..ops.camera import begin_frame

TILE = (8, 128)
TILE_N = TILE[0] * TILE[1]
INF = 1e30


def supports(static: SceneStatic) -> bool:
    """True when the fused kernel covers this scene + sampling mode."""
    if static.dof or static.gi_enabled or static.stereo:
        return False
    for ns in static.nodes:
        if ns.geom[0] == "csg":
            return False
        if ns.geom[0] == "plane":
            # offset planes shift the limit window / UVs; only identity here
            if not ns.identity_transform:
                return False
        elif not (ns.identity_transform or ns.offset_only):
            # sphere/cube + translate folds exactly into the center param
            return False
        if ns.shader_kind not in (LAMBERT, PHONG):
            return False
        if ns.tex_kind not in (TEX_NONE, TEX_CHECKER, TEX_PROC2):
            return False
        if ns.geom[0] == "sphere" and ns.tex_kind != TEX_NONE:
            # spherical UVs need atan2/asin, unimplemented in Mosaic; all
            # reference textured spheres use bitmaps (unsupported anyway)
            return False
    return True


# --------------------------------------------------------------------------
# In-kernel geometry (mirrors ops/geometry.py on (8,128) SoA tiles)
# --------------------------------------------------------------------------


def _plane_closest_t(y0, limit, ox, oy, oz, dx, dy, dz):
    miss = ((oy > y0) & (dy > -1e-9)) | ((oy < y0) & (dy < 1e-9))
    nonzero = dy != 0
    inv = jnp.where(nonzero, -1.0 / jnp.where(nonzero, dy, 1.0), 0.0)
    t = (oy - y0) * inv
    px = ox + dx * t
    pz = oz + dz * t
    ok = (~miss) & nonzero & (jnp.abs(px) <= limit) & (jnp.abs(pz) <= limit)
    dist = jnp.where(ok, t, INF)
    zero = jnp.zeros_like(t)
    one = jnp.ones_like(t)
    return dict(dist=dist, px=px, py=jnp.full_like(t, y0), pz=pz,
                nx=zero, ny=one, nz=zero, u=px, v=pz)


def _sphere_closest_t(cx, cy, cz, r, ox, oy, oz, dx, dy, dz):
    """No UVs: supports() rejects textured spheres (atan2/asin are
    unimplemented in Mosaic and only UVs need them)."""
    hx, hy, hz = ox - cx, oy - cy, oz - cz
    A = dx * dx + dy * dy + dz * dz
    B = 2.0 * (hx * dx + hy * dy + hz * dz)
    C = hx * hx + hy * hy + hz * hz - r * r
    D = B * B - 4.0 * A * C
    has = D >= 0
    sq = jnp.sqrt(jnp.where(has, D, 0.0))
    x1 = (-B + sq) / (2.0 * A)
    x2 = (-B - sq) / (2.0 * A)
    sol = jnp.where(x2 < 0, x1, x2)
    ok = has & (sol >= 0)
    t = jnp.where(ok, sol, 0.0)
    px, py, pz = ox + dx * t, oy + dy * t, oz + dz * t
    rx, ry, rz = px - cx, py - cy, pz - cz
    inv_len = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-30))
    zero = jnp.zeros_like(t)
    return dict(dist=jnp.where(ok, sol, INF), px=px, py=py, pz=pz,
                nx=rx * inv_len, ny=ry * inv_len, nz=rz * inv_len, u=zero, v=zero)


def _cube_closest_t(cx, cy, cz, side, ox, oy, oz, dx, dy, dz):
    half = side * 0.5
    best = None
    axes = ((1, (oy, dy, cy), (ox, dx, cx), (oz, dz, cz)),
            (0, (ox, dx, cx), (oy, dy, cy), (oz, dz, cz)),
            (2, (oz, dz, cz), (ox, dx, cx), (oy, dy, cy)))
    # face UV conventions per axis (ops/geometry.py _CUBE_FACES)
    for axis, (oA, dA, cA), (oB, dB, cB), (oC, dC, cC) in axes:
        valid = jnp.abs(dA) >= 1e-9
        inv = jnp.where(valid, -1.0 / jnp.where(valid, dA, 1.0), 0.0)
        for s in (-1.0, 1.0):
            t = (oA - (cA + s * half)) * inv
            pB = oB + dB * t
            pC = oC + dC * t
            inside = (pB >= cB - half) & (pB <= cB + half) & (pC >= cC - half) & (pC <= cC + half)
            ok = valid & (t >= 0) & inside
            dist = jnp.where(ok, t, INF)
            pA = oA + dA * t
            if axis == 1:
                px, py, pz = pB, pA, pC
                nx, ny, nz = 0.0 * t, s + 0.0 * t, 0.0 * t
                u, v = pB - cB, pC - cC
            elif axis == 0:
                px, py, pz = pA, pB, pC
                nx, ny, nz = s + 0.0 * t, 0.0 * t, 0.0 * t
                u, v = pB - cB, pC - cC
            else:
                px, py, pz = pB, pC, pA
                nx, ny, nz = 0.0 * t, 0.0 * t, s + 0.0 * t
                u, v = pB - cB, pC - cC
            cand = dict(dist=dist, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz, u=u, v=v)
            if best is None:
                best = cand
            else:
                better = cand["dist"] < best["dist"]
                best = {k: jnp.where(better, cand[k], best[k]) for k in cand}
    return best


# --------------------------------------------------------------------------
# Kernel builder
# --------------------------------------------------------------------------


def build_primary_kernel(static: SceneStatic, width: int, height: int, interpret: bool = False):
    """Returns fn(packed) -> [H*W, 3] radiance via one fused pallas_call.

    Scene parameters enter as a flat f32 vector (SMEM) so the kernel is
    re-usable across parameter values without recompilation.
    ``interpret=True`` runs the Pallas interpreter (CPU testing)."""
    assert supports(static)
    n = width * height
    n_pad = -(-n // TILE_N) * TILE_N
    grid = (n_pad // TILE_N,)

    # --- parameter vector layout -----------------------------------------
    # [0:21)  camera: up_left(3) dx_vec(3) dy_vec(3) pos(3) ambient(3)
    #         then AA sub-pixel offset (2), then per-light stride 6:
    #         pos(3) colorxpower(3); per-node stride 40 (see NODE_STRIDE)
    def pack_params(packed: ScenePacked, offset=(0.0, 0.0)):
        frame = begin_frame(packed.camera, width / height)
        up_left = frame["up_left"]
        dxv = (frame["up_right"] - frame["up_left"]) / width
        dyv = (frame["down_left"] - frame["up_left"]) / height
        parts = [
            up_left,
            dxv,
            dyv,
            frame["pos"],
            packed.ambient,
            jnp.asarray(offset, dtype=jnp.float32).reshape(2),
        ]
        for li in range(static.n_lights):
            parts.append(packed.light_pos[li])
            parts.append(packed.light_color[li] * packed.light_power[li])
        for i, ns in enumerate(static.nodes):
            kind, gi = ns.geom
            off = packed.node_offset[i]
            if kind == "plane":
                g = jnp.stack([packed.plane_y[gi] + off[1], packed.plane_limit[gi], 0.0, 0.0])
                # NB plane limit check is in un-offset coords in the XLA path
                # only for identity transforms; offset planes shift y only.
            elif kind == "sphere":
                c = packed.sphere_center[gi] + off
                g = jnp.stack([c[0], c[1], c[2], packed.sphere_r[gi]])
            else:
                c = packed.cube_center[gi] + off
                g = jnp.stack([c[0], c[1], c[2], packed.cube_side[gi]])
            parts.append(g)
            parts.append(packed.mat_color[i])
            parts.append(jnp.stack([packed.mat_exponent[i], packed.mat_strength[i]]))
            parts.append(packed.checker_c1[i])
            parts.append(packed.checker_c2[i])
            parts.append(packed.checker_size[i][None])
            parts.append(packed.proc2_color_u[i].reshape(-1))
            parts.append(packed.proc2_color_v[i].reshape(-1))
            parts.append(packed.proc2_freq_u[i])
            parts.append(packed.proc2_freq_v[i])
        return jnp.concatenate([p.reshape(-1).astype(jnp.float32) for p in parts])

    NODE_STRIDE = 4 + 3 + 2 + 3 + 3 + 1 + 9 + 9 + 3 + 3  # 40
    LIGHT_BASE = 17  # after camera(15) + offset(2)
    NODE_BASE = LIGHT_BASE + 6 * static.n_lights

    def node_off(i):
        return NODE_BASE + i * NODE_STRIDE

    # --- kernel body ------------------------------------------------------

    def kernel(prm_ref, out_r, out_g, out_b):
        pid = pl.program_id(0)
        base = pid * TILE_N
        lin = base + jax.lax.broadcasted_iota(jnp.int32, TILE, 0) * TILE[1] + jax.lax.broadcasted_iota(
            jnp.int32, TILE, 1
        )
        p = lambda k: prm_ref[k]  # noqa: E731

        xpix = (lin % width).astype(jnp.float32) + p(15)  # AA sub-pixel offset
        ypix = (lin // width).astype(jnp.float32) + p(16)

        # ray-gen (camera.d:119-147): target = upLeft + dxv*x + dyv*y
        tx = p(0) + p(3) * xpix + p(6) * ypix
        ty = p(1) + p(4) * xpix + p(7) * ypix
        tz = p(2) + p(5) * xpix + p(8) * ypix
        ox, oy, oz = p(9), p(10), p(11)
        dx, dy, dz = tx - ox, ty - oy, tz - oz
        inv_len = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        dx, dy, dz = dx * inv_len, dy * inv_len, dz * inv_len
        ox = jnp.zeros_like(dx) + ox
        oy = jnp.zeros_like(dy) + oy
        oz = jnp.zeros_like(dz) + oz

        def intersect_all(ox, oy, oz, dx, dy, dz):
            best = None
            win = jnp.full(TILE, -1, dtype=jnp.int32)
            for i, ns in enumerate(static.nodes):
                b = node_off(i)
                kind = ns.geom[0]
                if kind == "plane":
                    cand = _plane_closest_t(p(b), p(b + 1), ox, oy, oz, dx, dy, dz)
                elif kind == "sphere":
                    cand = _sphere_closest_t(p(b), p(b + 1), p(b + 2), p(b + 3), ox, oy, oz, dx, dy, dz)
                else:
                    cand = _cube_closest_t(p(b), p(b + 1), p(b + 2), p(b + 3), ox, oy, oz, dx, dy, dz)
                if best is None:
                    best = cand
                    win = jnp.where(cand["dist"] < INF, i, win)
                else:
                    better = cand["dist"] <= best["dist"]
                    improved = better & (cand["dist"] < INF)
                    win = jnp.where(improved, i, win)
                    best = {k: jnp.where(better, cand[k], best[k]) for k in cand}
            return best, win

        hit, win = intersect_all(ox, oy, oz, dx, dy, dz)
        hitmask = win >= 0

        # faceforward (imported_types.d:69-73)
        ndotd = dx * hit["nx"] + dy * hit["ny"] + dz * hit["nz"]
        sgn = jnp.where(ndotd < 0, 1.0, -1.0)
        nx, ny, nz = hit["nx"] * sgn, hit["ny"] * sgn, hit["nz"] * sgn

        # per-node diffuse color + material params, selected by win id
        dr = jnp.zeros(TILE, jnp.float32)
        dg = jnp.zeros(TILE, jnp.float32)
        db = jnp.zeros(TILE, jnp.float32)
        exp_t = jnp.ones(TILE, jnp.float32)
        str_t = jnp.zeros(TILE, jnp.float32)
        is_phong = jnp.zeros(TILE, jnp.bool_)
        for i, ns in enumerate(static.nodes):
            b = node_off(i)
            m = win == i
            if ns.tex_kind == TEX_CHECKER:
                size = p(b + 9 + 6)
                cxi = jnp.floor(hit["u"] / size).astype(jnp.int32)
                cyi = jnp.floor(hit["v"] / size).astype(jnp.int32)
                white = ((cxi + cyi) & 1).astype(jnp.bool_)
                cr = jnp.where(white, p(b + 9 + 3), p(b + 9 + 0))
                cg = jnp.where(white, p(b + 9 + 4), p(b + 9 + 1))
                cb = jnp.where(white, p(b + 9 + 5), p(b + 9 + 2))
            elif ns.tex_kind == TEX_PROC2:
                pb = b + 16
                cr = jnp.zeros(TILE, jnp.float32)
                cg = jnp.zeros(TILE, jnp.float32)
                cb = jnp.zeros(TILE, jnp.float32)
                for band in range(3):
                    su = jnp.sin(hit["u"] * p(pb + 18 + band))
                    sv = jnp.sin(hit["v"] * p(pb + 21 + band))
                    cr += p(pb + band * 3 + 0) * su + p(pb + 9 + band * 3 + 0) * sv
                    cg += p(pb + band * 3 + 1) * su + p(pb + 9 + band * 3 + 1) * sv
                    cb += p(pb + band * 3 + 2) * su + p(pb + 9 + band * 3 + 2) * sv
            else:
                cr = jnp.full(TILE, p(b + 4))
                cg = jnp.full(TILE, p(b + 5))
                cb = jnp.full(TILE, p(b + 6))
            dr = jnp.where(m, cr, dr)
            dg = jnp.where(m, cg, dg)
            db = jnp.where(m, cb, db)
            exp_t = jnp.where(m, p(b + 7), exp_t)
            str_t = jnp.where(m, p(b + 8), str_t)
            if ns.shader_kind == PHONG:
                is_phong = is_phong | m

        # direct lighting with shadow rays (shader.d:67-105, :197-250)
        lr = jnp.full(TILE, p(12))
        lg = jnp.full(TILE, p(13))
        lb = jnp.full(TILE, p(14))
        sr = jnp.zeros(TILE, jnp.float32)
        sg = jnp.zeros(TILE, jnp.float32)
        sb = jnp.zeros(TILE, jnp.float32)
        eps = 1e-3  # f32 shadow offset (ops/shade.py shadow_eps)
        sx = hit["px"] + nx * eps
        sy = hit["py"] + ny * eps
        sz = hit["pz"] + nz * eps
        for li in range(static.n_lights):
            lbase = LIGHT_BASE + li * 6
            lx, ly, lz = p(lbase), p(lbase + 1), p(lbase + 2)
            tlx, tly, tlz = lx - hit["px"], ly - hit["py"], lz - hit["pz"]
            dist2 = tlx * tlx + tly * tly + tlz * tlz
            inv_l = jax.lax.rsqrt(jnp.maximum(dist2, 1e-30))
            ldx, ldy, ldz = tlx * inv_l, tly * inv_l, tlz * inv_l
            # shadow: any node with hit dist <= |to-from| occludes
            target = jnp.sqrt(jnp.maximum((lx - sx) ** 2 + (ly - sy) ** 2 + (lz - sz) ** 2, 1e-30))
            inv_t = 1.0 / target
            sdx, sdy, sdz = (lx - sx) * inv_t, (ly - sy) * inv_t, (lz - sz) * inv_t
            shadow_hit, _ = intersect_all(sx, sy, sz, sdx, sdy, sdz)
            vis = shadow_hit["dist"] > target
            cos_t = ldx * nx + ldy * ny + ldz * nz
            gate = vis & (cos_t > 0)
            w = jnp.where(gate, cos_t / dist2, 0.0)
            lr += p(lbase + 3) * w
            lg += p(lbase + 4) * w
            lb += p(lbase + 5) * w
            if any(ns.shader_kind == PHONG for ns in static.nodes):
                # R = reflect(-lightDir, N), normalized; cosGamma = R . -d
                mdotn = (-ldx) * nx + (-ldy) * ny + (-ldz) * nz
                rx = -ldx - 2.0 * mdotn * nx
                ry = -ldy - 2.0 * mdotn * ny
                rz = -ldz - 2.0 * mdotn * nz
                inv_r = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz, 1e-30))
                cos_g = (rx * (-dx) + ry * (-dy) + rz * (-dz)) * inv_r
                sgate = vis & (cos_g > 0)
                spec_w = jnp.where(sgate, jnp.power(jnp.maximum(cos_g, 0.0), exp_t) * str_t / dist2, 0.0)
                sr += p(lbase + 3) * spec_w
                sg += p(lbase + 4) * spec_w
                sb += p(lbase + 5) * spec_w

        outr = dr * lr
        outg = dg * lg
        outb = db * lb
        if any(ns.shader_kind == PHONG for ns in static.nodes):
            outr += jnp.where(is_phong, sr, 0.0)
            outg += jnp.where(is_phong, sg, 0.0)
            outb += jnp.where(is_phong, sb, 0.0)

        out_r[:] = jnp.where(hitmask, outr, 0.0)
        out_g[:] = jnp.where(hitmask, outg, 0.0)
        out_b[:] = jnp.where(hitmask, outb, 0.0)

    n_prm = NODE_BASE + NODE_STRIDE * len(static.nodes)

    @jax.jit
    def render(packed: ScenePacked, offset=jnp.zeros(2, dtype=jnp.float32)):
        prm = pack_params(packed, offset)
        r, g, b = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[
                pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(TILE, lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad // TILE[1], TILE[1]), jnp.float32),
                jax.ShapeDtypeStruct((n_pad // TILE[1], TILE[1]), jnp.float32),
                jax.ShapeDtypeStruct((n_pad // TILE[1], TILE[1]), jnp.float32),
            ],
            interpret=interpret,
        )(prm)
        rgb = jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)
        return rgb[:n]

    return render
