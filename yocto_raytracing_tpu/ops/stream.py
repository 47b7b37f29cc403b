"""Streaming cluster-scan intersection — the TPU-native fast path.

The reference's BVH traversal (src/scene.cpp:386-480) is pointer chasing:
per-ray node stacks and data-dependent gathers. On TPU that lowers to
scalarized gathers and runs ~6x SLOWER than the single-thread C++ (measured
0.06 Mrays/s). This module replaces it with a formulation that maps to the
hardware:

**Key invariant.** The reference's stack machine visits nodes in a FIXED,
ray-independent preorder (LIFO of a static tree: second child first,
scene-leaf instances forward, leaf prims forward). Bbox tests only SKIP
subtrees, they never reorder them — and a skipped subtree can never accept
a hit (any surface point inside a box has its ray parameter inside the
box's slab interval, which the robustness-factored test just rejected
against [tmin, t_best]). Therefore testing EVERY prim, in that fixed DFS
order, with the exact same inclusive ``t <= t_best`` acceptance, produces
bit-identical results — hits, distances, and equal-t tie winners.

**The scan.** Prims are re-ordered into DFS order and packed into clusters
of 128 (lane-width). Intersection = one ``lax.scan`` over (instance,
cluster) steps: transform the whole ray batch into the instance frame
(VPU), slab-test the cluster's conservative bbox (mask), dense-test 128
prims against all rays (VPU/MXU tiles), fold the per-cluster winner into
the running (t, inst, prim) with last-equal-t-wins. Every memory access is
a static contiguous slice — no gathers anywhere.

Instanced shapes share one prim table; each scan step pairs an instance
frame with one cluster of its shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import intersect as isect
from ..scene import PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE

FLT_MAX = jnp.float32(3.4028235e38)
CLUSTER = 128
SUPER = 8   # clusters per supercluster


def _pytree(cls):
    names = [f for f in cls.__dataclass_fields__]
    jax.tree_util.register_pytree_node(
        cls,
        lambda s: (tuple(getattr(s, n) for n in names), None),
        lambda _, leaves: cls(**dict(zip(names, leaves))),
    )
    return cls


@_pytree
@dataclass
class StreamScene:
    """Scan tables; all leaves device arrays.

    Prim pool re-ordered to reference DFS test order, padded per shape to a
    multiple of 128. Steps pair an instance with one cluster of its shape.
    """

    # prim clusters: (C, 128) lanes
    v0: Any        # (C, 128, 3) f32 local-space
    v1: Any        # (C, 128, 3)
    v2: Any        # (C, 128, 3)
    r0: Any        # (C, 128)
    r1: Any        # (C, 128)
    ptype: Any     # (C, 128) i32 (PRIM_*; -1 = padding lane)
    gid: Any       # (C, 128) i32 global prim id (original pool numbering)
    cb_min: Any    # (C, 3) f32 cluster bbox (local space)
    cb_max: Any    # (C, 3)
    # per-cluster metadata (indexed dynamically from the inner loop)
    ctype: Any     # (C,) i32 0=tri-only 1=line-only 2=point-only 3=mixed
    # supercluster bboxes (local space), contiguous per shape
    sb_min: Any    # (SC, 3) f32
    sb_max: Any    # (SC, 3)
    # instances in scene-DFS order
    inst_id: Any   # (I,) i32 original instance id (hit reporting)
    inst_axes: Any  # (I, 3, 3) f32
    inst_o: Any    # (I, 3) f32
    inst_wb_min: Any  # (I, 3) f32 world bbox of the instanced shape
    inst_wb_max: Any  # (I, 3)
    inst_sc_base: Any  # (I,) i32 first supercluster of the shape
    inst_n_sc: Any     # (I,) i32 supercluster count of the shape
    inst_cl_base: Any  # (I,) i32 first cluster of the shape


def _dfs_leaf_items(start, count, isleaf, leaf_items, root):
    """Leaf items in the reference's visit order (second child first)."""
    out = []
    stack = [root]
    while stack:
        n = stack.pop()
        if isleaf[n]:
            s = start[n]
            out.extend(leaf_items[s: s + count[n]].tolist())
        else:
            stack.append(start[n])      # popped second
            stack.append(start[n] + 1)  # popped first
    return out


def build_stream_scene(host, dev, meta) -> StreamScene:
    """Build scan tables from the host scene + built DeviceScene/BVH.

    Uses the flat BVH already in ``dev`` so the DFS order is exactly the
    order the (parity-exact) traversal tests prims in.
    """
    start = np.asarray(dev.node_start)
    count = np.asarray(dev.node_count)
    isleaf = np.asarray(dev.node_isleaf)
    leaf_items = np.asarray(dev.leaf_items)
    pos = np.asarray(dev.pos)
    radius = np.asarray(dev.radius)
    prim_v = np.asarray(dev.prim_v)
    prim_type = np.asarray(dev.prim_type)
    inst_axes = np.asarray(dev.inst_axes)
    inst_o = np.asarray(dev.inst_o)

    # per-shape DFS prim order + clusters
    n_shapes = len(meta.shape_node_root)
    shape_cluster_base = []
    v0l, v1l, v2l, r0l, r1l, tyl, gidl = [], [], [], [], [], [], []
    cbmin_l, cbmax_l = [], []
    ncl = 0
    for sid in range(n_shapes):
        order = _dfs_leaf_items(start, count, isleaf, leaf_items,
                                meta.shape_node_root[sid])
        order = np.asarray(order, np.int32)
        p = len(order)
        pad = (-p) % (CLUSTER * SUPER)
        nc = (p + pad) // CLUSTER
        shape_cluster_base.append((ncl, nc))
        ncl += nc

        pv = prim_v[order]
        ty = prim_type[order]
        a = pos[pv[:, 0]]
        b = pos[pv[:, 1]]
        c = pos[pv[:, 2]]
        ra = radius[pv[:, 0]]
        rb = radius[pv[:, 1]]
        if pad:
            zpad3 = np.zeros((pad, 3), np.float32)
            a = np.concatenate([a, zpad3])
            b = np.concatenate([b, zpad3])
            c = np.concatenate([c, zpad3])
            ra = np.concatenate([ra, np.zeros(pad, np.float32)])
            rb = np.concatenate([rb, np.zeros(pad, np.float32)])
            ty = np.concatenate([ty, np.full(pad, -1, np.int32)])
            order = np.concatenate([order, np.zeros(pad, np.int32)])
        v0l.append(a.reshape(nc, CLUSTER, 3))
        v1l.append(b.reshape(nc, CLUSTER, 3))
        v2l.append(c.reshape(nc, CLUSTER, 3))
        r0l.append(ra.reshape(nc, CLUSTER))
        r1l.append(rb.reshape(nc, CLUSTER))
        tyl.append(ty.reshape(nc, CLUSTER))
        gidl.append(order.reshape(nc, CLUSTER))
        # conservative cluster bbox (points/lines inflated by radius,
        # matching the reference prim bounds, src/scene.cpp:521-547)
        for k in range(nc):
            sel = tyl[-1][k] >= 0
            if not sel.any():
                cbmin_l.append(np.full(3, np.float32(3.4e38)))
                cbmax_l.append(np.full(3, np.float32(-3.4e38)))
                continue
            aa, bb, cc = (x.reshape(nc, CLUSTER, 3)[k][sel]
                          for x in (v0l[-1].reshape(nc, CLUSTER, 3),
                                    v1l[-1].reshape(nc, CLUSTER, 3),
                                    v2l[-1].reshape(nc, CLUSTER, 3)))
            rra = r0l[-1][k][sel][:, None]
            rrb = r1l[-1][k][sel][:, None]
            tt = tyl[-1][k][sel][:, None]
            infl_a = np.where(tt != PRIM_TRIANGLE, rra, 0.0)
            infl_b = np.where(tt != PRIM_TRIANGLE, rrb, 0.0)
            lo = np.minimum(np.minimum(aa - infl_a, bb - infl_b), cc)
            hi = np.maximum(np.maximum(aa + infl_a, bb + infl_b), cc)
            # triangles use all 3 verts; lines ignore v2 (== v0 by pool
            # construction) and points repeat v0: the min/max above are a
            # superset either way, which is all a cull bbox needs
            cbmin_l.append(lo.min(axis=0))
            cbmax_l.append(hi.max(axis=0))

    v0 = np.concatenate(v0l).astype(np.float32)
    v1 = np.concatenate(v1l).astype(np.float32)
    v2 = np.concatenate(v2l).astype(np.float32)
    r0 = np.concatenate(r0l).astype(np.float32)
    r1 = np.concatenate(r1l).astype(np.float32)
    ptype = np.concatenate(tyl).astype(np.int32)
    gid = np.concatenate(gidl).astype(np.int32)
    cb_min = np.stack(cbmin_l).astype(np.float32)
    cb_max = np.stack(cbmax_l).astype(np.float32)

    # instance order = scene-tree DFS leaf order (root = node 0)
    inst_order = _dfs_leaf_items(start, count, isleaf, leaf_items, 0)
    root_to_shape = {r: i for i, r in enumerate(meta.shape_node_root)}
    inst_shape = [root_to_shape[int(r)]
                  for r in np.asarray(dev.inst_shape_root)]

    from ..bvh import bbox_to_world

    # per-cluster homogeneous-type tag for the scan's specialized branches
    ctype = np.empty(ncl, np.int32)
    for k in range(ncl):
        present = set(np.unique(ptype[k][ptype[k] >= 0]).tolist())
        if present <= {PRIM_TRIANGLE}:
            ctype[k] = 0
        elif present <= {PRIM_LINE}:
            ctype[k] = 1
        elif present <= {PRIM_POINT}:
            ctype[k] = 2
        else:
            ctype[k] = 3

    # supercluster bboxes, contiguous per shape
    sb_min = cb_min.reshape(-1, SUPER, 3).min(axis=1)
    sb_max = cb_max.reshape(-1, SUPER, 3).max(axis=1)
    shape_sc_base = [(b // SUPER, nc // SUPER)
                     for (b, nc) in shape_cluster_base]

    # instances in scene-DFS order + per-instance shape world bboxes
    ii_l, ax_l, o_l = [], [], []
    wmin_l, wmax_l, scb_l, nsc_l, clb_l = [], [], [], [], []
    for ii in inst_order:
        sid = inst_shape[ii]
        base, nc = shape_cluster_base[sid]
        axes = inst_axes[ii]
        o = inst_o[ii]
        smin = cb_min[base: base + nc].min(axis=0)
        smax = cb_max[base: base + nc].max(axis=0)
        wmin, wmax = bbox_to_world(axes, o, smin, smax)
        ii_l.append(ii)
        ax_l.append(axes)
        o_l.append(o)
        wmin_l.append(wmin)
        wmax_l.append(wmax)
        scb_l.append(shape_sc_base[sid][0])
        nsc_l.append(shape_sc_base[sid][1])
        clb_l.append(base)

    wb_min = np.stack(wmin_l).astype(np.float32)
    wb_max = np.stack(wmax_l).astype(np.float32)

    return StreamScene(
        v0=v0, v1=v1, v2=v2, r0=r0, r1=r1, ptype=ptype, gid=gid,
        cb_min=cb_min, cb_max=cb_max, ctype=ctype,
        sb_min=sb_min.astype(np.float32), sb_max=sb_max.astype(np.float32),
        inst_id=np.asarray(ii_l, np.int32),
        inst_axes=np.stack(ax_l).astype(np.float32),
        inst_o=np.stack(o_l).astype(np.float32),
        inst_wb_min=wb_min, inst_wb_max=wb_max,
        inst_sc_base=np.asarray(scb_l, np.int32),
        inst_n_sc=np.asarray(nsc_l, np.int32),
        inst_cl_base=np.asarray(clb_l, np.int32),
    )


BLOCK_RAYS = 2048  # rays per skip-granularity block


@partial(jax.jit, static_argnames=("any_hit",))
def intersect_stream(
    stream: StreamScene,
    ro: jnp.ndarray,     # (N, 3)
    rd: jnp.ndarray,     # (N, 3)
    tmin: jnp.ndarray,   # (N,)
    tmax: jnp.ndarray,   # (N,)
    any_hit: bool = False,
):
    """Nearest-hit (or any-hit) by scanning all clusters in DFS order.

    Rays are processed in blocks of BLOCK_RAYS (sequential ``lax.map``):
    the bbox-skip conds then fire per (cluster, block) — a full 262k-ray
    batch almost never skips anything (some ray somewhere intersects every
    cluster), while coherent 2k blocks skip most of the scene.

    Returns the same dict as traverse.intersect_scene and is bit-identical
    to it (module docstring).
    """
    n = ro.shape[0]
    if n > BLOCK_RAYS:
        pad = (-n) % BLOCK_RAYS
        def pad0(x, v=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], v, x.dtype)])
        blocks = jax.lax.map(
            lambda args: _intersect_block(stream, *args, any_hit=any_hit),
            (pad0(ro).reshape(-1, BLOCK_RAYS, 3),
             pad0(rd).reshape(-1, BLOCK_RAYS, 3),
             pad0(tmin).reshape(-1, BLOCK_RAYS),
             pad0(tmax, -FLT_MAX).reshape(-1, BLOCK_RAYS)))
        return {k: v.reshape(-1)[:n] for k, v in blocks.items()}
    return _intersect_block(stream, ro, rd, tmin, tmax, any_hit=any_hit)


@partial(jax.jit, static_argnames=("any_hit",))
def _intersect_block(
    stream: StreamScene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    any_hit: bool = False,
):
    n = ro.shape[0]
    # world-space ray with the identity-frame normalization the reference's
    # scene-level traversal applies (transform_direction_inverse normalizes)
    rd_w = isect.safe_normalize(rd)

    init = dict(
        t=tmax.astype(jnp.float32),
        hit_inst=jnp.full((n,), -1, jnp.int32),
        hit_prim=jnp.full((n,), -1, jnp.int32),
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CLUSTER), 1)

    def dense_test(st, c, inst_id, lo, ld, active):
        """Test all 128 cluster prims; returns the folded state."""
        v0 = stream.v0[c]        # (128, 3)
        v1 = stream.v1[c]
        v2 = stream.v2[c]
        r0 = stream.r0[c]
        r1 = stream.r1[c]
        ty = stream.ptype[c]
        gid = stream.gid[c]

        lo_b = lo[:, None, :]    # (N, 1, 3)
        ld_b = ld[:, None, :]
        tmin_b = tmin[:, None]
        tbest_b = st["t"][:, None]

        def tri_only(_):
            h, t, _, _ = isect.intersect_triangle(
                lo_b, ld_b, tmin_b, tbest_b, v0[None], v1[None], v2[None])
            return h & (ty >= 0), t

        def line_only(_):
            h, t, _ = isect.intersect_line(
                lo_b, ld_b, tmin_b, tbest_b, v0[None], v1[None],
                r0[None], r1[None])
            return h & (ty >= 0), t

        def point_only(_):
            h, t = isect.intersect_point(lo_b, ld_b, tmin_b, tbest_b,
                                         v0[None], r0[None])
            return h & (ty >= 0), t

        def mixed(_):
            th, tt, _, _ = isect.intersect_triangle(
                lo_b, ld_b, tmin_b, tbest_b, v0[None], v1[None], v2[None])
            lh, lt, _ = isect.intersect_line(
                lo_b, ld_b, tmin_b, tbest_b, v0[None], v1[None],
                r0[None], r1[None])
            ph, pt = isect.intersect_point(lo_b, ld_b, tmin_b, tbest_b,
                                           v0[None], r0[None])
            h = jnp.where(ty == PRIM_TRIANGLE, th,
                          jnp.where(ty == PRIM_LINE, lh,
                                    jnp.where(ty == PRIM_POINT, ph, False)))
            t = jnp.where(ty == PRIM_TRIANGLE, tt,
                          jnp.where(ty == PRIM_LINE, lt, pt))
            return h, t

        hit, t = jax.lax.switch(stream.ctype[c],
                                [tri_only, line_only, point_only, mixed],
                                None)
        hit = hit & active[:, None]
        t = jnp.where(hit, t, FLT_MAX)

        # within-cluster winner: smallest t, LAST lane on equal t (the
        # sequential test order is forward with inclusive replace).
        # Reductions only — a per-row gather would scalarize on TPU.
        t_min = jnp.min(t, axis=1)
        is_win = hit & (t == t_min[:, None])
        k = jnp.max(jnp.where(is_win, lane, -1), axis=1)
        prim_k = jnp.sum(jnp.where(lane == k[:, None], gid[None], 0), axis=1)
        any_k = k >= 0

        # fold: inclusive t <= t_best accepted (last equal-t wins)
        accept = any_k & (t_min <= st["t"])
        return dict(
            t=jnp.where(accept, t_min, st["t"]),
            hit_inst=jnp.where(accept, inst_id, st["hit_inst"]),
            hit_prim=jnp.where(accept, prim_k, st["hit_prim"]),
        )

    def clusters_body(st, cl_base, j, inst_id, lo, ld, m_inst):
        """One supercluster: slab-gate its SUPER clusters."""
        def inner(k, st):
            c = cl_base + j * SUPER + k
            m_cl = isect.intersect_bbox(lo, ld, tmin, st["t"],
                                        stream.cb_min[c][None],
                                        stream.cb_max[c][None])
            active = m_inst & m_cl
            return jax.lax.cond(
                jnp.any(active),
                lambda: dense_test(st, c, inst_id, lo, ld, active),
                lambda: st)

        return jax.lax.fori_loop(0, SUPER, inner, st)

    def instance_body(st, ii):
        """One instance: transform once, walk its superclusters."""
        m_inst = isect.intersect_bbox(
            ro, rd_w, tmin, st["t"],
            stream.inst_wb_min[ii][None], stream.inst_wb_max[ii][None])
        if any_hit:
            m_inst = m_inst & (st["hit_prim"] < 0)

        def expand():
            # instance-local ray (the transform of an identity frame
            # normalizes rd again, like the reference — keep for parity)
            lo, ld = isect.transform_ray_inverse(
                stream.inst_axes[ii][None], stream.inst_o[ii][None], ro, rd)
            sc_base = stream.inst_sc_base[ii]
            cl_base = stream.inst_cl_base[ii]
            inst_id = stream.inst_id[ii]

            def sc_body(j, st):
                m_sc = isect.intersect_bbox(
                    lo, ld, tmin, st["t"],
                    stream.sb_min[sc_base + j][None],
                    stream.sb_max[sc_base + j][None])
                mask = m_inst & m_sc
                return jax.lax.cond(
                    jnp.any(mask),
                    lambda: clusters_body(st, cl_base, j, inst_id, lo, ld,
                                          mask),
                    lambda: st)

            return jax.lax.fori_loop(0, stream.inst_n_sc[ii], sc_body, st)

        return jax.lax.cond(jnp.any(m_inst), expand, lambda: st)

    # phase 1: per-block instance shortlist. ONE dense vectorized slab pass
    # over all instances' world bboxes (rays x instances), reduced to a
    # per-instance any-ray survival vector, then compacted with nonzero.
    # The walk loop is bounded by the ACTUAL survivor count — per-iteration
    # control-flow overhead (~us on the TPU sequencer) is paid only for
    # instances the block can possibly hit. nonzero preserves ascending
    # order = scene-DFS order, so the parity test order is unchanged.
    n_inst = stream.inst_wb_min.shape[0]
    m_all = isect.intersect_bbox(
        ro[:, None, :], rd_w[:, None, :], tmin[:, None], tmax[:, None],
        stream.inst_wb_min[None], stream.inst_wb_max[None])  # (N, I)
    surv = jnp.any(m_all, axis=0)
    cand = jnp.nonzero(surv, size=n_inst, fill_value=0)[0].astype(jnp.int32)
    count = jnp.sum(surv.astype(jnp.int32))

    def walk(i, st):
        return instance_body(st, cand[i])

    out = jax.lax.fori_loop(0, count, walk, init)

    return dict(
        hit=out["hit_prim"] >= 0,
        inst=out["hit_inst"],
        prim=out["hit_prim"],
        t=out["t"],
    )
