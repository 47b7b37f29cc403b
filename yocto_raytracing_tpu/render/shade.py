"""Hit-attribute evaluation and Blinn-Phong/hair shading.

Parity: shade (src/raytrace.cpp:88-211) re-designed from per-ray recursion to
a batched, differentiable wavefront step:

* the traversal (ops/traverse.py) returns detached hit topology
  (instance id, prim id); ``eval_hit`` *recomputes* barycentrics and hit
  attributes differentiably from the gathered vertices, so gradients flow to
  vertex positions, instance frames, camera and materials while the discrete
  structure stays fixed (detached-traversal gradients);
* all lights' shadow rays are stacked into one (L*N) any-hit traversal —
  one compiled kernel and a larger, better-utilized batch than the
  reference's per-light recursion (raytrace.cpp:121-133);
* point lights exactly replicate the reference's quirky light vector
  ``transform_point(light_frame, light_pos - p)`` (raytrace.cpp:129-130) —
  correct for the identity-rotation light frames all scenes use;
* hair BRDF uses the reference's ``sqrt(1 - |n.l|)`` pseudo-sine
  (raytrace.cpp:164-174), clamped at 0 to avoid the NaN the C code would
  produce for |n.l| > 1 rounding;
* Blinn-Phong exponent ``ns = rs ? 2/rs^4 - 2 : 1e6`` (raytrace.cpp:144);
* ambient ``amb * kd * kd_txt`` added once per shade (raytrace.cpp:115-119,
  206) regardless of shadowing.

Precision rule: frame transforms use explicit VPU multiply-adds
(ops/intersect.py), never einsum/matmul — MXU matmuls run at bf16 input
precision by default and break f32 parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import intersect as isect
from ..scene import PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE
from . import texture as texture_mod

RAY_EPS = np.float32(1e-4)
FLT_MAX = np.float32(3.4028235e38)

# r5 packed prim-row gather (see eval_hit); "legacy" restores the r4
# four-gather path for in-process A/Bs (scripts/shade_bound.py)
import os as _os  # noqa: E402

_PACKED_PRIM_GATHER = _os.environ.get("YRT_SHADE_GATHER", "") != "legacy"


_normalize = isect.safe_normalize


def eval_hit(scene, ro, rd, inst, prim):
    """Differentiable hit attributes from detached (inst, prim) topology.

    Returns dict with world-space p, n, texcoord uv, barycentrics ew (N, 3),
    and the per-lane local ray. Lanes with inst/prim < 0 produce garbage the
    caller must mask.

    Gathers are the dominant shade cost on TPU (each ~10 ns/row regardless
    of width), so per-hit attributes are fetched from CONCATENATED tables —
    one (N, 12) instance row, one (N, 4) prim row, three (N, 8) vertex rows
    — instead of a dozen narrow gathers. The concats are (V, 8)-sized
    device ops built from the differentiable scene leaves each call, so
    gradients still flow to pos/norm/texcoord/frames; arithmetic and
    values are unchanged.
    """
    inst_s = jnp.maximum(inst, 0)
    prim_s = jnp.maximum(prim, 0)
    # instance row also carries material id + hair flag as f32 (exact for
    # small ints) so shade_step needs no extra per-ray instance gathers
    ipk = jnp.concatenate(
        [scene.inst_axes.reshape(-1, 9), scene.inst_o,
         scene.inst_mat[:, None].astype(jnp.float32),
         scene.inst_is_lines[:, None].astype(jnp.float32)],
        axis=1)[inst_s]                                     # (N, 14)
    axes = ipk[:, 0:9].reshape(-1, 3, 3)
    io = ipk[:, 9:12]
    lo, ld = isect.transform_ray_inverse(axes, io, ro, rd)

    vert = jnp.concatenate([scene.pos, scene.norm, scene.texcoord],
                           axis=1)                          # (V, 8)
    if _PACKED_PRIM_GATHER:
        # r5 gather packing: all three vertices' attributes + ptype in
        # ONE prim-indexed (P, 25) table, so the per-ray fetch is a
        # single row gather instead of a (N, 4) prim gather + three
        # (N, 8) vertex gathers (TPU gathers cost per ROW, not per byte
        # — PERF.md shade bound). The table itself is built by three
        # P-row gathers (P << N). The gathered VALUES are identical (a
        # gather of a gather) and gradients flow to pos/norm/texcoord
        # through both gather levels; the different producer graph lets
        # XLA contract downstream fma chains differently (<= tonemap
        # quantization end to end — tests/test_shade_gather.py).
        # YRT_SHADE_GATHER=legacy selects the r4 path for A/Bs.
        prim_tab = jnp.concatenate(
            [vert[scene.prim_v[:, 0]], vert[scene.prim_v[:, 1]],
             vert[scene.prim_v[:, 2]],
             scene.prim_type[:, None].astype(jnp.float32)],
            axis=1)                                         # (P, 25)
        row = prim_tab[prim_s]                              # (N, 25)
        a0, a1, a2 = row[:, 0:8], row[:, 8:16], row[:, 16:24]
        ptype = row[:, 24]                                  # f32, exact
    else:
        ppk = jnp.concatenate([scene.prim_v, scene.prim_type[:, None]],
                              axis=1)[prim_s]               # (N, 4)
        pv = ppk[:, 0:3]
        ptype = ppk[:, 3]
        a0 = vert[pv[:, 0]]
        a1 = vert[pv[:, 1]]
        a2 = vert[pv[:, 2]]
    v0, n0, t0 = a0[:, 0:3], a0[:, 3:6], a0[:, 6:8]
    v1, n1, t1 = a1[:, 0:3], a1[:, 3:6], a1[:, 6:8]
    v2, n2, t2 = a2[:, 0:3], a2[:, 3:6], a2[:, 6:8]

    # triangle barycentrics (Möller-Trumbore solve, scene.cpp:229-263)
    e1 = v1 - v0
    e2 = v2 - v0
    r = jnp.cross(ld, e2)
    den = isect.dot(r, e1)
    inv_den = 1.0 / jnp.where(den == 0, 1.0, den)
    cvec = lo - v0
    w1 = isect.dot(r, cvec) * inv_den
    svec = jnp.cross(cvec, e1)
    w2 = isect.dot(svec, ld) * inv_den

    # line parameter s (scene.cpp:285-307)
    v = v1 - v0
    w = lo - v0
    a = isect.dot(ld, ld)
    b = isect.dot(ld, v)
    c = isect.dot(v, v)
    d = isect.dot(ld, w)
    e = isect.dot(v, w)
    det = a * c - b * b
    s_line = jnp.clip((a * e - b * d) / jnp.where(det == 0, 1.0, det), 0.0, 1.0)

    is_tri = ptype == PRIM_TRIANGLE
    is_line = ptype == PRIM_LINE
    ew0 = jnp.where(is_tri, 1.0 - w1 - w2, jnp.where(is_line, 1.0 - s_line, 1.0))
    ew1 = jnp.where(is_tri, w1, jnp.where(is_line, s_line, 0.0))
    ew2 = jnp.where(is_tri, w2, 0.0)
    ew = jnp.stack([ew0, ew1, ew2], axis=-1)

    def lerp3(x0, x1, x2):
        return (x0 * ew0[:, None] + x1 * ew1[:, None] + x2 * ew2[:, None])

    p_local = lerp3(v0, v1, v2)
    n_local = lerp3(n0, n1, n2)
    uv = lerp3(t0, t1, t2)

    # instance-space eval (src/scene.h:210-218): transform point; normal via
    # transform_direction which normalizes after rotation
    p_world = isect.transform_point(axes, io, p_local)
    n_world = _normalize(isect.transform_vector(axes, n_local))

    return dict(p=p_world, n=n_world, uv=uv, ew=ew,
                mat=ipk[:, 12].astype(jnp.int32),
                is_lines=ipk[:, 13] == 1.0)


def shade_step(scene, ro, rd, hits, amb, active, occluder,
               has_kd_textures=True, has_ks_textures=True,
               light_pos=None):
    """One wavefront bounce of the reference shade() body.

    ``occluder(p, d, tmin, tmax, mask)`` with (L, N, ...) stacked shadow rays
    -> (L, N) bool occlusion (the any-hit traversal, injected to avoid a
    circular import).

    ``has_kd_textures``/``has_ks_textures`` are STATIC scene facts
    (SceneMeta): when no material references a texture slot, the four
    bilinear texel gathers for that slot are compiled out entirely.

    Returns (color, kr, p, refl_dir, hit_mask): ``color`` is this bounce's
    direct + ambient contribution, ``kr`` the reflection throughput factor,
    ``p``/``refl_dir`` the next wavefront's ray.
    """
    mask = active & hits["hit"]
    inst = jnp.where(mask, hits["inst"], 0)
    prim = jnp.where(mask, hits["prim"], 0)

    at = eval_hit(scene, ro, rd, inst, prim)
    p = at["p"]
    n = at["n"]
    uv = at["uv"]

    # ONE (N, 16) material row per ray instead of eight narrow gathers;
    # texture ids and the kd/ks textures' logical (w, h) ride as f32
    # (exact for small ints) — the per-Mt id->dims gathers are tiny
    mat = at["mat"]
    is_lines = at["is_lines"]
    kd_tid = jnp.maximum(scene.mat_kd_txt, 0)
    ks_tid = jnp.maximum(scene.mat_ks_txt, 0)
    mpk = jnp.concatenate(
        [scene.mat_kd, scene.mat_ks, scene.mat_kr, scene.mat_rs[:, None],
         scene.mat_kd_txt[:, None].astype(jnp.float32),
         scene.mat_ks_txt[:, None].astype(jnp.float32),
         scene.tex_w[kd_tid][:, None].astype(jnp.float32),
         scene.tex_h[kd_tid][:, None].astype(jnp.float32),
         scene.tex_w[ks_tid][:, None].astype(jnp.float32),
         scene.tex_h[ks_tid][:, None].astype(jnp.float32)], axis=1)[mat]
    kd = mpk[:, 0:3]
    ks = mpk[:, 3:6]
    kr = mpk[:, 6:9]
    rs = mpk[:, 9]
    kd_txt = mpk[:, 10].astype(jnp.int32)
    ks_txt = mpk[:, 11].astype(jnp.int32)

    # textures (always repeat-wrap sRGB for kd/ks, raytrace.cpp:153-157)
    if has_kd_textures:
        has_kd_txt = kd_txt >= 0
        kd_tex = texture_mod.eval_texture(scene, jnp.maximum(kd_txt, 0),
                                          uv, True, wh=(mpk[:, 12],
                                                        mpk[:, 13]))
        kd_eff = jnp.where(has_kd_txt[:, None], kd * kd_tex, kd)
    else:
        kd_eff = kd
    if has_ks_textures:
        has_ks_txt = ks_txt >= 0
        ks_tex = texture_mod.eval_texture(scene, jnp.maximum(ks_txt, 0),
                                          uv, True, wh=(mpk[:, 14],
                                                        mpk[:, 15]))
        ks_eff = jnp.where(has_ks_txt[:, None], ks * ks_tex, ks)
    else:
        ks_eff = ks

    # ambient la = amb * kd (* kd_txt), added unconditionally
    # (raytrace.cpp:115-119, 206)
    la = amb[None, :] * kd_eff

    ns = jnp.where(rs != 0,
                   2.0 / jnp.power(jnp.where(rs != 0, rs, 1.0), 4.0) - 2.0,
                   jnp.float32(1e6))
    vvec = _normalize(ro - p)

    num_lights = scene.light_ke.shape[0]
    color = jnp.zeros_like(p)
    if num_lights:
        # build all shadow rays, one stacked traversal
        # quirk-exact light vector: transform_point(light_frame, lpos - p)
        # (raytrace.cpp:129-130). ``light_pos`` overrides the per-light
        # shape-space position with per-ray AREA samples (render/lights.py)
        # — (L, N, 3); the deterministic path broadcasts pos[0].
        lpos = (scene.light_pos[:, None, :] if light_pos is None
                else light_pos)
        diff = lpos - p[None, :, :]                               # (L, N, 3)
        lvec = isect.transform_point(
            scene.light_axes[:, None, :, :],
            scene.light_o[:, None, :], diff)
        rdist = isect.safe_sqrt(isect.dot(lvec, lvec))            # (L, N)
        ldir = _normalize(lvec)

        # shadow ray (p, l, tmin=0.01, tmax=r-0.01), raytrace.cpp:131-133;
        # when tmax < tmin the traversal finds nothing and the light is
        # unshadowed, like the reference's slab-test rejection
        occ = occluder(
            jnp.broadcast_to(p[None], ldir.shape), ldir,
            jnp.full(rdist.shape, 0.01, jnp.float32), rdist - 0.01,
            jnp.broadcast_to(mask[None], rdist.shape))
        lit = mask[None, :] & ~occ                                # (L, N)

        ke_r2 = (scene.light_ke[:, None, :]
                 / jnp.maximum(rdist * rdist, 1e-38)[..., None])  # (L, N, 3)
        h = _normalize(vvec[None] + ldir)
        ndl = isect.dot(n[None], ldir)
        ndh = isect.dot(n[None], h)
        # hair BRDF (raytrace.cpp:162-175) vs Blinn-Phong (177-180)
        sinnl = isect.safe_sqrt(jnp.maximum(0.0, 1.0 - jnp.abs(ndl)))
        sinnh = isect.safe_sqrt(jnp.maximum(0.0, 1.0 - jnp.abs(ndh)))
        diff_w = jnp.where(is_lines[None], sinnl, jnp.maximum(0.0, ndl))
        spec_w = jnp.where(is_lines[None],
                           isect.safe_pow(sinnh, ns[None]),
                           isect.safe_pow(jnp.maximum(0.0, ndh), ns[None]))
        contrib = (kd_eff[None] * ke_r2 * diff_w[..., None]
                   + ks_eff[None] * ke_r2 * spec_w[..., None])
        # per-pixel accumulation in light order (raytrace.cpp:121-185)
        color = jnp.sum(jnp.where(lit[..., None], contrib, 0.0), axis=0)

    color = color + la
    color = jnp.where(mask[:, None], color, 0.0)

    # mirror reflection ray (raytrace.cpp:187-204)
    refl_dir = n * (2.0 * isect.dot(n, vvec))[:, None] - vvec
    kr = jnp.where(mask[:, None], kr, 0.0)

    return color, kr, p, refl_dir, mask
