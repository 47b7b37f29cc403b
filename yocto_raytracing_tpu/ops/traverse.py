"""Two-level BVH traversal as a vectorized wavefront stack machine.

The reference traverses per-ray with recursion-free stacks of node ids
(src/scene.cpp:386-480), switching to a nested shape-BVH walk at scene
leaves. On TPU there is no per-lane control flow, so this re-design runs
*one* ``lax.while_loop`` over a whole ray batch:

* the node pool is unified (scene tree + all shape trees, bvh.py), so a
  stack entry is ``(node id, instance id)``; instance id -1 means the
  scene level (identity transform);
* every iteration pops one entry per ray (masked when a ray's stack is
  empty), gathers the node, slab-tests, then either pushes 2 children,
  pushes up-to-4 instance shape-roots (scene leaf), or intersects up-to-4
  primitives (shape leaf);
* rays that finish early keep popping a sentinel until the whole batch
  drains — the classic SIMT tradeoff, mitigated upstream by tiling rays
  coherently.

The traversal returns integer hit topology only (instance, prim, t); the
differentiable hit attributes are recomputed outside (render/shade.py) so
gradients never flow through the discrete traversal (detached-traversal
design).

``any_hit=True`` reproduces intersect_any's early-out (src/scene.cpp:414,
473): the first accepted intersection clears the stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import intersect as isect
from ..scene import DeviceScene, PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE

FLT_MAX = jnp.float32(3.4028235e38)


@partial(jax.jit, static_argnames=("any_hit", "max_stack"))
def intersect_scene(
    scene: DeviceScene,
    ro: jnp.ndarray,     # (N, 3) world ray origins
    rd: jnp.ndarray,     # (N, 3) world ray directions
    tmin: jnp.ndarray,   # (N,)
    tmax: jnp.ndarray,   # (N,)
    any_hit: bool = False,
    max_stack: int = 64,
):
    """Nearest-hit (or any-hit) intersection of a ray batch with the scene.

    Returns dict with 'hit' (N,) bool, 'inst' (N,) i32, 'prim' (N,) i32
    (global prim id), 't' (N,) f32 (local-space distance, = world for the
    rigid frames the format supports).
    """
    n = ro.shape[0]
    i32 = jnp.int32

    stack_node = jnp.zeros((n, max_stack), i32)
    stack_inst = jnp.full((n, max_stack), -1, i32)
    # push root (node 0, scene level)
    sp = jnp.ones((n,), i32)

    state = dict(
        stack_node=stack_node,
        stack_inst=stack_inst,
        sp=sp,
        t=tmax.astype(jnp.float32),
        hit_inst=jnp.full((n,), -1, i32),
        hit_prim=jnp.full((n,), -1, i32),
    )

    rows = jnp.arange(n)
    ident = jnp.eye(3, dtype=jnp.float32)

    def cond(st):
        return jnp.any(st["sp"] > 0)

    def body(st):
        sp = st["sp"]
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = st["stack_node"][rows, top]
        inst = st["stack_inst"][rows, top]
        sp = jnp.where(active, sp - 1, sp)

        # gather node fields
        nb_min = scene.node_bbox_min[node]
        nb_max = scene.node_bbox_max[node]
        nstart = scene.node_start[node]
        ncount = scene.node_count[node]
        nleaf = scene.node_isleaf[node] == 1
        nkind = scene.node_kind[node]

        # instance-local ray (identity when inst < 0)
        has_inst = inst >= 0
        safe_inst = jnp.maximum(inst, 0)
        axes = jnp.where(has_inst[:, None, None],
                         scene.inst_axes[safe_inst], ident)
        io = jnp.where(has_inst[:, None], scene.inst_o[safe_inst], 0.0)
        lo, ld = isect.transform_ray_inverse(axes, io, ro, rd)

        bhit = active & isect.intersect_bbox(lo, ld, tmin, st["t"],
                                             nb_min, nb_max)

        # --- case 1: internal node -> push both children
        push_children = bhit & ~nleaf
        new_sn = st["stack_node"]
        new_si = st["stack_inst"]
        # reference pushes (start, start+1) in order; LIFO pops start+1 first
        for k in range(2):
            slot = jnp.where(push_children, sp + k, 0)
            val = nstart + k
            new_sn = new_sn.at[rows, slot].set(
                jnp.where(push_children, val, new_sn[rows, slot]))
            new_si = new_si.at[rows, slot].set(
                jnp.where(push_children, inst, new_si[rows, slot]))
        sp = jnp.where(push_children, sp + 2, sp)

        # --- case 2: scene leaf -> push shape roots of up-to-4 instances
        scene_leaf = bhit & nleaf & (nkind == 0)
        for k in range(4):
            pk = scene_leaf & (k < ncount)
            item = scene.leaf_items[jnp.where(pk, nstart + k, 0)]
            root = scene.inst_shape_root[jnp.where(pk, item, 0)]
            slot = jnp.where(pk, sp, 0)
            new_sn = new_sn.at[rows, slot].set(
                jnp.where(pk, root, new_sn[rows, slot]))
            new_si = new_si.at[rows, slot].set(
                jnp.where(pk, item, new_si[rows, slot]))
            sp = jnp.where(pk, sp + 1, sp)

        # --- case 3: shape leaf -> intersect up-to-4 prims
        prim_leaf = bhit & nleaf & (nkind == 1)
        t_best = st["t"]
        hit_inst = st["hit_inst"]
        hit_prim = st["hit_prim"]
        got_hit = jnp.zeros_like(prim_leaf)
        for k in range(4):
            pk = prim_leaf & (k < ncount)
            prim = scene.leaf_items[jnp.where(pk, nstart + k, 0)]
            pv = scene.prim_v[prim]
            ptype = scene.prim_type[prim]
            v0 = scene.pos[pv[:, 0]]
            v1 = scene.pos[pv[:, 1]]
            v2 = scene.pos[pv[:, 2]]
            r0 = scene.radius[pv[:, 0]]
            r1 = scene.radius[pv[:, 1]]

            th, tt, _, _ = isect.intersect_triangle(
                lo, ld, tmin, t_best, v0, v1, v2)
            lh, lt, _ = isect.intersect_line(
                lo, ld, tmin, t_best, v0, v1, r0, r1)
            ph, pt = isect.intersect_point(lo, ld, tmin, t_best, v0, r0)

            hit_k = jnp.where(
                ptype == PRIM_TRIANGLE, th,
                jnp.where(ptype == PRIM_LINE, lh, ph)) & pk
            t_k = jnp.where(
                ptype == PRIM_TRIANGLE, tt,
                jnp.where(ptype == PRIM_LINE, lt, pt))

            t_best = jnp.where(hit_k, t_k, t_best)
            hit_inst = jnp.where(hit_k, inst, hit_inst)
            hit_prim = jnp.where(hit_k, prim, hit_prim)
            got_hit = got_hit | hit_k

        if any_hit:
            sp = jnp.where(got_hit, 0, sp)

        return dict(
            stack_node=new_sn,
            stack_inst=new_si,
            sp=sp,
            t=t_best,
            hit_inst=hit_inst,
            hit_prim=hit_prim,
        )

    out = jax.lax.while_loop(cond, body, state)
    return dict(
        hit=out["hit_prim"] >= 0,
        inst=out["hit_inst"],
        prim=out["hit_prim"],
        t=out["t"],
    )
