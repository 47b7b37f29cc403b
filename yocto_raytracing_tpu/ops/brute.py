"""Brute-force scene intersection — the correctness oracle for the BVH.

The reference keeps its own linear-scan oracle (intersect_ray,
src/scene.cpp:311-367) that the BVH path superseded; we keep the same
discipline: property tests assert BVH == brute force on random rays.

Vectorized over (ray, instance-prim pair): O(N * Q) memory, so use on small
scenes / small batches only.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import intersect as isect
from ..scene import DeviceScene, PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE

FLT_MAX = np.float32(3.4028235e38)


def _instance_shapes(scene: DeviceScene, meta) -> list:
    """Recover instance -> shape id from shape roots."""
    root_to_shape = {r: i for i, r in enumerate(meta.shape_node_root)}
    return [root_to_shape[int(r)] for r in np.asarray(scene.inst_shape_root)]


def _pairs(scene: DeviceScene, meta):
    """All (instance, prim) candidate pairs as (Q,) index arrays."""
    prim_starts = list(meta.shape_prim_offset) + [meta.num_prims]
    inst_shape = _instance_shapes(scene, meta)
    pi, pp = [], []
    for ii in range(meta.num_instances):
        sid = inst_shape[ii]
        prims = np.arange(prim_starts[sid], prim_starts[sid + 1], dtype=np.int32)
        pi.append(np.full(len(prims), ii, np.int32))
        pp.append(prims)
    return (np.concatenate(pi) if pi else np.zeros(0, np.int32),
            np.concatenate(pp) if pp else np.zeros(0, np.int32))


def intersect_scene_brute(
    scene: DeviceScene,
    meta,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
):
    """Nearest hit by testing every (instance, prim) pair at once.

    Tie semantics differ from sequential scan: the reference's last-tested
    equal-t prim wins (t <= tmax accepted, scene.cpp:229-263); here the
    highest pair index wins, which is the same ordering for the common case
    of instances scanned in order.
    """
    pair_inst_np, pair_prim_np = _pairs(scene, meta)
    pair_inst = jnp.asarray(pair_inst_np)
    pair_prim = jnp.asarray(pair_prim_np)

    axes = scene.inst_axes[pair_inst]          # (Q, 3, 3)
    io = scene.inst_o[pair_inst]               # (Q, 3)
    pv = scene.prim_v[pair_prim]               # (Q, 3)
    ptype = scene.prim_type[pair_prim]         # (Q,)
    v0 = scene.pos[pv[:, 0]]
    v1 = scene.pos[pv[:, 1]]
    v2 = scene.pos[pv[:, 2]]
    r0 = scene.radius[pv[:, 0]]
    r1 = scene.radius[pv[:, 1]]

    # broadcast rays (N, 1, 3) against pairs (1, Q, ...)
    lo, ld = isect.transform_ray_inverse(
        axes[None], io[None], ro[:, None, :], rd[:, None, :])
    tmin_b = tmin[:, None]
    tmax_b = tmax[:, None]

    th, tt, _, _ = isect.intersect_triangle(
        lo, ld, tmin_b, tmax_b, v0[None], v1[None], v2[None])
    lh, lt, _ = isect.intersect_line(
        lo, ld, tmin_b, tmax_b, v0[None], v1[None], r0[None], r1[None])
    ph, pt = isect.intersect_point(lo, ld, tmin_b, tmax_b, v0[None], r0[None])

    hit = jnp.where(ptype == PRIM_TRIANGLE, th,
                    jnp.where(ptype == PRIM_LINE, lh, ph))
    t = jnp.where(ptype == PRIM_TRIANGLE, tt,
                  jnp.where(ptype == PRIM_LINE, lt, pt))
    t = jnp.where(hit, t, FLT_MAX)

    # nearest with last-equal-wins: flip order and use argmin (first wins)
    t_rev = t[:, ::-1]
    best_rev = jnp.argmin(t_rev, axis=1)
    q = t.shape[1]
    best = q - 1 - best_rev
    best_t = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
    any_hit = jnp.any(hit, axis=1)
    return dict(
        hit=any_hit,
        inst=jnp.where(any_hit, pair_inst[best], -1),
        prim=jnp.where(any_hit, pair_prim[best], -1),
        t=jnp.where(any_hit, best_t, tmax),
    )
