"""Two-level BVH traversal as a vectorized wavefront machine.

The reference traverses per-ray with recursion-free stacks of node ids
(src/scene.cpp:386-480), switching to a nested shape-BVH walk at scene
leaves. On TPU there is no per-lane control flow, so this re-design runs
*one* ``lax.while_loop`` over a whole ray batch. Two implementations:

* ``intersect_scene`` (default, stackless): the BVH is *threaded* with skip
  pointers (bvh.py _thread_tree), so per-ray state is a handful of scalars
  (current node, current instance, scene-leaf slot) — no (N, stack) arrays
  and no scatter per step, the TPU-friendly layout. The two-level descent
  is a flat state machine: entering a scene leaf walks its up-to-4
  instances' shape trees in forward order before resuming at the leaf's
  skip pointer.
* ``intersect_scene_stack``: the direct stack-machine transcription, kept
  as a cross-check oracle for the threaded traversal (tests assert
  equality, like the reference keeps its brute-force scan,
  src/scene.cpp:311-367).

Both reproduce the reference's visit order exactly — internal nodes
descend the SECOND child first (LIFO pop of (start, start+1) pushes,
scene.cpp:461-463), scene-leaf instances and leaf prims go forward — which
matters because equal-t ties are resolved by test order (last wins).

The traversal returns integer hit topology only (instance, prim, t); the
differentiable hit attributes are recomputed outside (render/shade.py) so
gradients never flow through the discrete traversal (detached-traversal
design).

``any_hit=True`` reproduces intersect_any's early-out (src/scene.cpp:414,
473): the first accepted intersection retires the ray.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from . import intersect as isect
from ..scene import DeviceScene, PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE

FLT_MAX = np.float32(3.4028235e38)


def _leaf_prims_hit(scene, lo, ld, tmin, t_best, nstart, ncount, active,
                    inst, hit_inst, hit_prim):
    """Test up to 4 prims of a shape leaf (forward order, last tie wins)."""
    got_hit = jnp.zeros_like(active)
    for k in range(4):
        pk = active & (k < ncount)
        prim = scene.leaf_items[jnp.where(pk, nstart + k, 0)]
        pv = scene.prim_v[prim]
        ptype = scene.prim_type[prim]
        v0 = scene.pos[pv[:, 0]]
        v1 = scene.pos[pv[:, 1]]
        v2 = scene.pos[pv[:, 2]]
        r0 = scene.radius[pv[:, 0]]
        r1 = scene.radius[pv[:, 1]]

        th, tt, _, _ = isect.intersect_triangle(lo, ld, tmin, t_best,
                                                v0, v1, v2)
        lh, lt, _ = isect.intersect_line(lo, ld, tmin, t_best, v0, v1,
                                         r0, r1)
        ph, pt = isect.intersect_point(lo, ld, tmin, t_best, v0, r0)

        hit_k = jnp.where(ptype == PRIM_TRIANGLE, th,
                          jnp.where(ptype == PRIM_LINE, lh, ph)) & pk
        t_k = jnp.where(ptype == PRIM_TRIANGLE, tt,
                        jnp.where(ptype == PRIM_LINE, lt, pt))

        t_best = jnp.where(hit_k, t_k, t_best)
        hit_inst = jnp.where(hit_k, inst, hit_inst)
        hit_prim = jnp.where(hit_k, prim, hit_prim)
        got_hit = got_hit | hit_k
    return t_best, hit_inst, hit_prim, got_hit


@partial(jax.jit, static_argnames=("any_hit", "max_stack"))
def intersect_scene(
    scene: DeviceScene,
    ro: jnp.ndarray,     # (N, 3) world ray origins
    rd: jnp.ndarray,     # (N, 3) world ray directions
    tmin: jnp.ndarray,   # (N,)
    tmax: jnp.ndarray,   # (N,)
    any_hit: bool = False,
    max_stack: int = 64,  # unused (stack-machine API compat)
):
    """Nearest-hit (or any-hit) intersection of a ray batch with the scene.

    Stackless threaded traversal (module docstring). Returns dict with
    'hit' (N,) bool, 'inst' (N,) i32, 'prim' (N,) i32 (global prim id),
    't' (N,) f32.
    """
    del max_stack
    n = ro.shape[0]
    i32 = jnp.int32
    neg1 = jnp.full((n,), -1, i32)

    state = dict(
        node=jnp.zeros((n,), i32),   # current node (-1 = ray retired)
        inst=neg1,                   # current instance (-1 = scene level)
        sleaf=neg1,                  # scene leaf being expanded
        slot=jnp.zeros((n,), i32),   # index into the scene leaf's items
        t=tmax.astype(jnp.float32),
        hit_inst=neg1,
        hit_prim=neg1,
    )
    ident = jnp.eye(3, dtype=jnp.float32)

    def cond(st):
        return jnp.any(st["node"] >= 0)

    def body(st):
        live = st["node"] >= 0
        node = jnp.maximum(st["node"], 0)
        inst = st["inst"]

        nb_min = scene.node_bbox_min[node]
        nb_max = scene.node_bbox_max[node]
        nstart = scene.node_start[node]
        ncount = scene.node_count[node]
        nleaf = scene.node_isleaf[node] == 1
        nkind = scene.node_kind[node]
        nskip = scene.node_skip[node]

        # instance-local ray (identity at scene level)
        has_inst = inst >= 0
        safe_inst = jnp.maximum(inst, 0)
        axes = jnp.where(has_inst[:, None, None],
                         scene.inst_axes[safe_inst], ident)
        io = jnp.where(has_inst[:, None], scene.inst_o[safe_inst], 0.0)
        lo, ld = isect.transform_ray_inverse(axes, io, ro, rd)

        bhit = live & isect.intersect_bbox(lo, ld, tmin, st["t"],
                                           nb_min, nb_max)

        # prim leaf: intersect up to 4 prims
        prim_leaf = bhit & nleaf & (nkind == 1)
        t, hit_inst, hit_prim, got_hit = _leaf_prims_hit(
            scene, lo, ld, tmin, st["t"], nstart, ncount, prim_leaf,
            inst, st["hit_inst"], st["hit_prim"])

        # --- next-node resolution ---
        # descend: internal hit -> second child (reference LIFO order);
        # scene-leaf hit -> first instance's shape root
        scene_enter = bhit & nleaf & (nkind == 0)
        item0 = scene.leaf_items[jnp.where(scene_enter, nstart, 0)]
        root0 = scene.inst_shape_root[jnp.where(scene_enter, item0, 0)]

        descend = bhit & ~nleaf
        nxt = jnp.where(descend, nstart + 1,
                        jnp.where(scene_enter, root0, nskip))
        new_inst = jnp.where(scene_enter, item0, inst)
        new_sleaf = jnp.where(scene_enter, node, st["sleaf"])
        new_slot = jnp.where(scene_enter, 0, st["slot"])

        # shape tree exhausted (nxt == -1 while inside an instance):
        # advance to the scene leaf's next instance, else resume at the
        # scene leaf's skip pointer
        exhausted = live & (nxt < 0) & (new_inst >= 0)
        sleaf_s = jnp.maximum(new_sleaf, 0)
        sl_start = scene.node_start[sleaf_s]
        sl_count = scene.node_count[sleaf_s]
        next_slot = new_slot + 1
        more = exhausted & (next_slot < sl_count)
        item_n = scene.leaf_items[jnp.where(more, sl_start + next_slot, 0)]
        root_n = scene.inst_shape_root[jnp.where(more, item_n, 0)]
        sl_skip = scene.node_skip[sleaf_s]

        nxt = jnp.where(more, root_n, jnp.where(exhausted, sl_skip, nxt))
        new_inst = jnp.where(more, item_n,
                             jnp.where(exhausted, -1, new_inst))
        new_slot = jnp.where(more, next_slot, new_slot)
        new_sleaf = jnp.where(exhausted & ~more, -1, new_sleaf)

        nxt = jnp.where(live, nxt, -1)
        if any_hit:
            nxt = jnp.where(got_hit, -1, nxt)

        return dict(node=nxt, inst=new_inst, sleaf=new_sleaf, slot=new_slot,
                    t=t, hit_inst=hit_inst, hit_prim=hit_prim)

    out = jax.lax.while_loop(cond, body, state)
    return dict(
        hit=out["hit_prim"] >= 0,
        inst=out["hit_inst"],
        prim=out["hit_prim"],
        t=out["t"],
    )


@partial(jax.jit, static_argnames=("any_hit", "max_stack"))
def intersect_scene_stack(
    scene: DeviceScene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    any_hit: bool = False,
    max_stack: int = 64,
):
    """Stack-machine traversal (cross-check oracle for intersect_scene).

    Direct transcription of the reference's per-ray stacks
    (src/scene.cpp:386-480) vectorized over the batch: every iteration pops
    one (node, instance) entry per ray; internal nodes push 2 children,
    scene leaves push up-to-4 instance shape roots (reversed so they pop
    forward), shape leaves intersect up-to-4 prims.
    """
    n = ro.shape[0]
    i32 = jnp.int32

    stack_node = jnp.zeros((n, max_stack), i32)
    stack_inst = jnp.full((n, max_stack), -1, i32)
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

        nb_min = scene.node_bbox_min[node]
        nb_max = scene.node_bbox_max[node]
        nstart = scene.node_start[node]
        ncount = scene.node_count[node]
        nleaf = scene.node_isleaf[node] == 1
        nkind = scene.node_kind[node]

        has_inst = inst >= 0
        safe_inst = jnp.maximum(inst, 0)
        axes = jnp.where(has_inst[:, None, None],
                         scene.inst_axes[safe_inst], ident)
        io = jnp.where(has_inst[:, None], scene.inst_o[safe_inst], 0.0)
        lo, ld = isect.transform_ray_inverse(axes, io, ro, rd)

        bhit = active & isect.intersect_bbox(lo, ld, tmin, st["t"],
                                             nb_min, nb_max)

        # internal: push both children (pop order matches reference)
        push_children = bhit & ~nleaf
        new_sn = st["stack_node"]
        new_si = st["stack_inst"]
        for k in range(2):
            slot = jnp.where(push_children, sp + k, 0)
            val = nstart + k
            new_sn = new_sn.at[rows, slot].set(
                jnp.where(push_children, val, new_sn[rows, slot]))
            new_si = new_si.at[rows, slot].set(
                jnp.where(push_children, inst, new_si[rows, slot]))
        sp = jnp.where(push_children, sp + 2, sp)

        # scene leaf: push shape roots reversed so they pop forward
        scene_leaf = bhit & nleaf & (nkind == 0)
        for k in range(3, -1, -1):
            pk = scene_leaf & (k < ncount)
            item = scene.leaf_items[jnp.where(pk, nstart + k, 0)]
            root = scene.inst_shape_root[jnp.where(pk, item, 0)]
            slot = jnp.where(pk, sp, 0)
            new_sn = new_sn.at[rows, slot].set(
                jnp.where(pk, root, new_sn[rows, slot]))
            new_si = new_si.at[rows, slot].set(
                jnp.where(pk, item, new_si[rows, slot]))
            sp = jnp.where(pk, sp + 1, sp)

        # shape leaf: intersect prims
        prim_leaf = bhit & nleaf & (nkind == 1)
        t_best, hit_inst, hit_prim, got_hit = _leaf_prims_hit(
            scene, lo, ld, tmin, st["t"], nstart, ncount, prim_leaf,
            inst, st["hit_inst"], st["hit_prim"])

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
