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
identical results — hits, distances, and equal-t tie winners — up to XLA
FMA contraction: separately-compiled programs may contract ``a*b + c``
into fma() differently depending on fusion shape, drifting ``t`` by <= 1
ULP between the scan and the traversal oracle (tests/test_stream.py pins
exactly this contract).

**The scan.** Prims are re-ordered into DFS order and packed into clusters
of 128 (lane-width). Intersection per ray block: shortlist instances with
one dense (rays x instances) world-bbox pass; per surviving instance,
transform the ray batch into the instance frame (VPU), dense-slab-test ALL
cluster bboxes at once (rays x clusters), compact the surviving cluster
ids, then one fori over that worklist dense-testing 128 prims per step and
folding the winner into the running (t, inst, prim) with
last-equal-t-wins. Control-flow regions (while/cond bodies) cost ~25 us of
TPU sequencer overhead each — 10x a dense 128-prim test — so the design
spends regions only on work that actually happens and replaces every
skip-branch with a dense mask + compaction. Every memory access is a
static contiguous slice — no per-ray gathers anywhere.

**Layout.** All per-primitive data and every intermediate is stored as
component PLANES — separate x/y/z arrays of shape (C, 128) — never as
trailing-3 vectors. TPU vregs are (8 sublanes, 128 lanes) tiles over the
LAST TWO dims; a (rays, prims, 3) intermediate puts the size-3 axis on the
lanes and wastes 125/128 of every vector op (measured 57 us per
2048x128-pair cluster test, ~5% of VPU peak). In plane form the same math
runs on dense (rays, 128-prim) tiles. The arithmetic is the exact same
f32 ops in the exact same order as ops/intersect.py, so results stay
bit-identical to the traversal oracle (tests/test_stream.py).
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

FLT_MAX = np.float32(3.4028235e38)
SLACK = np.float32(1.00000024)  # slab robustness factor (scene.cpp:380)
CLUSTER = 128
GROUP = 64          # instances per shortlist super-group (hierarchical
#                     shortlist; the reference handles many-instance
#                     scenes with a scene-level hierarchy over instances,
#                     src/scene.cpp:446-480 — this is its two-stage
#                     block-coherent analogue)
HIER_MIN_INST = 256  # below this the flat (N, I) shortlist is cheaper
#                      than a group pass + per-group refinement regions


# fields kept as STATIC (hashable aux_data, not traced leaves): the flat
# scan path unrolls the instance stage in Python and slices static cluster
# windows, and the fused dense test specializes on which prim TYPES the
# scene contains — so these must be compile-time constants
STATIC_FIELDS = ("s_cl_base", "s_n_cl", "s_has_lines", "s_has_points")

# r5 fused dense-test EXPERIMENT (see _dense_test), opt-in via
# YRT_DENSE_FOLD=fused. Measured a frame-level NO-OP on the real chip
# (interleaved A/B, scripts/ab_dense_fold.py: refl 1.29s vs 1.29s,
# instance10000 quarter 28.34s vs 28.34s) — XLA:TPU already fuses the
# production fold's reductions inside the in-frame loop nest, even
# though a standalone fori context shows the multi-consumer structure
# costing ~250 us/test (scripts/intersect_ladder.py; PERF.md r5).
# Since the fused kernel also contracts fma chains differently (up to
# ~64 ULP of t at grazing incidence, breaking the <= 1 ULP stream
# oracle contract) it stays OFF by default: all cost, no benefit.
import os as _os_env  # noqa: E402

_FUSED_DENSE = _os_env.environ.get("YRT_DENSE_FOLD", "") == "fused"


def _pytree(cls):
    names = [f for f in cls.__dataclass_fields__]
    dyn = [n for n in names if n not in STATIC_FIELDS]
    sta = [n for n in names if n in STATIC_FIELDS]
    jax.tree_util.register_pytree_node(
        cls,
        lambda s: (tuple(getattr(s, n) for n in dyn),
                   tuple(getattr(s, n) for n in sta)),
        lambda aux, leaves: cls(**dict(zip(dyn, leaves)),
                                **dict(zip(sta, aux))),
    )
    return cls


@_pytree
@dataclass
class StreamScene:
    """Scan tables; all leaves device arrays.

    Prim pool re-ordered to reference DFS test order, padded per shape to a
    multiple of 128. Steps pair an instance with one cluster of its shape.
    Vertex data lives as x/y/z planes (see module docstring).
    """

    # prim clusters: (C, 128) lanes, one array per vector component
    v0x: Any; v0y: Any; v0z: Any   # noqa: E702 — plane triples read as rows
    v1x: Any; v1y: Any; v1z: Any   # noqa: E702
    v2x: Any; v2y: Any; v2z: Any   # noqa: E702
    r0: Any        # (C, 128)
    r1: Any        # (C, 128)
    ptype: Any     # (C, 128) i32 (PRIM_*; -1 = padding lane)
    gid: Any       # (C, 128) i32 global prim id (original pool numbering)
    cb_min: Any    # (C, 3) f32 cluster bbox (local space)
    cb_max: Any    # (C, 3)
    # per-cluster metadata (indexed dynamically from the inner loop)
    ctype: Any     # (C,) i32 0=tri-only 1=line-only 2=point-only 3=mixed
    # instances in scene-DFS order
    inst_id: Any   # (I,) i32 original instance id (hit reporting)
    inst_axes: Any  # (I, 3, 3) f32
    inst_o: Any    # (I, 3) f32
    inst_wb_min: Any  # (I, 3) f32 world bbox of the instanced shape
    inst_wb_max: Any  # (I, 3)
    inst_n_cl: Any     # (I,) i32 cluster count of the shape
    inst_cl_base: Any  # (I,) i32 first cluster of the shape
    # hierarchical shortlist (r5): merged world bboxes of GROUP consecutive
    # scene-DFS instances. DFS order is the scene BVH's leaf order, so a
    # group is a spatially compact set and its merged bbox is tight. The
    # per-block shortlist then slab-tests (rays x n_groups) instead of
    # (rays x instances) — 64x less mask memory, which is what forced
    # instance10000 down to 8192-ray blocks in r4 (see MAX_BLOCK_ELEMS).
    grp_wb_min: Any = None  # (ceil(I/GROUP), 3) f32
    grp_wb_max: Any = None  # (ceil(I/GROUP), 3)
    # STATIC (aux_data) copies for the flat path's Python-unrolled
    # instance stage: tuples of ints, never traced
    s_cl_base: Any = ()   # (I,) tuple
    s_n_cl: Any = ()      # (I,) tuple
    # STATIC prim-type presence: the fused dense test compiles line/
    # point intersectors only when the scene contains them (True/True
    # is the conservative default: all types computed, masked by ty)
    s_has_lines: Any = True
    s_has_points: Any = True


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
        pad = (-p) % CLUSTER
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

    # instances in scene-DFS order + per-instance shape world bboxes
    ii_l, ax_l, o_l = [], [], []
    wmin_l, wmax_l, ncl_l, clb_l = [], [], [], []
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
        ncl_l.append(nc)
        clb_l.append(base)

    wb_min = np.stack(wmin_l).astype(np.float32)
    wb_max = np.stack(wmax_l).astype(np.float32)

    # super-group bboxes for the hierarchical shortlist: merge GROUP
    # consecutive scene-DFS instances (= scene BVH leaf order, spatially
    # compact). Padding slots get the empty bbox (+max/-max), which the
    # slab test can never hit.
    n_i = wb_min.shape[0]
    n_grp = -(-max(n_i, 1) // GROUP)
    gpad = n_grp * GROUP - n_i
    gmin = np.concatenate(
        [wb_min, np.full((gpad, 3), FLT_MAX, np.float32)]) if gpad else wb_min
    gmax = np.concatenate(
        [wb_max, np.full((gpad, 3), -FLT_MAX, np.float32)]) if gpad else wb_max
    grp_wb_min = gmin.reshape(n_grp, GROUP, 3).min(axis=1)
    grp_wb_max = gmax.reshape(n_grp, GROUP, 3).max(axis=1)

    def plane(arr, k):
        return np.ascontiguousarray(arr[:, :, k])

    return StreamScene(
        v0x=plane(v0, 0), v0y=plane(v0, 1), v0z=plane(v0, 2),
        v1x=plane(v1, 0), v1y=plane(v1, 1), v1z=plane(v1, 2),
        v2x=plane(v2, 0), v2y=plane(v2, 1), v2z=plane(v2, 2),
        r0=r0, r1=r1, ptype=ptype, gid=gid,
        cb_min=cb_min, cb_max=cb_max, ctype=ctype,
        inst_id=np.asarray(ii_l, np.int32),
        inst_axes=np.stack(ax_l).astype(np.float32),
        inst_o=np.stack(o_l).astype(np.float32),
        inst_wb_min=wb_min, inst_wb_max=wb_max,
        inst_n_cl=np.asarray(ncl_l, np.int32),
        inst_cl_base=np.asarray(clb_l, np.int32),
        grp_wb_min=grp_wb_min, grp_wb_max=grp_wb_max,
        s_cl_base=tuple(int(x) for x in clb_l),
        s_n_cl=tuple(int(x) for x in ncl_l),
        s_has_lines=bool((ptype == PRIM_LINE).any()),
        s_has_points=bool((ptype == PRIM_POINT).any()),
    )


# ---------------------------------------------------------------------------
# plane-form math — the exact f32 ops of ops/intersect.py in the exact same
# order, on (rays, prims) component planes instead of trailing-3 vectors
# ---------------------------------------------------------------------------

def _dot3(ax, ay, az, bx, by, bz):
    """Left-associative 3-dot, mirroring isect.dot's pinned add order."""
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    """Component form of jnp.cross for 3-vectors."""
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _normalize3(vx, vy, vz):
    """safe_normalize in planes (0 -> 0, src/vmath.h:118-122)."""
    n2 = _dot3(vx, vy, vz, vx, vy, vz)
    gt = n2 > 0
    inv = 1.0 / jnp.sqrt(jnp.where(gt, n2, 1.0))
    return (jnp.where(gt, vx * inv, vx), jnp.where(gt, vy * inv, vy),
            jnp.where(gt, vz * inv, vz))


def _bbox_hit(ox, oy, oz, ix, iy, iz, tmin, tmax, bn, bx):
    """Slab test vs one box; ``i*`` are precomputed 1/d (parity:
    isect.intersect_bbox = scene.cpp:370-382 incl. NaN-drop + slack)."""
    t0x = (bn[0] - ox) * ix
    t1x = (bx[0] - ox) * ix
    t0y = (bn[1] - oy) * iy
    t1y = (bx[1] - oy) * iy
    t0z = (bn[2] - oz) * iz
    t1z = (bx[2] - oz) * iz
    tlx = jnp.where(ix < 0, t1x, t0x)
    thx = jnp.where(ix < 0, t0x, t1x)
    tly = jnp.where(iy < 0, t1y, t0y)
    thy = jnp.where(iy < 0, t0y, t1y)
    tlz = jnp.where(iz < 0, t1z, t0z)
    thz = jnp.where(iz < 0, t0z, t1z)
    tlx = jnp.where(jnp.isnan(tlx), -jnp.inf, tlx)
    tly = jnp.where(jnp.isnan(tly), -jnp.inf, tly)
    tlz = jnp.where(jnp.isnan(tlz), -jnp.inf, tlz)
    thx = jnp.where(jnp.isnan(thx), jnp.inf, thx)
    thy = jnp.where(jnp.isnan(thy), jnp.inf, thy)
    thz = jnp.where(jnp.isnan(thz), jnp.inf, thz)
    lo = jnp.maximum(jnp.maximum(jnp.maximum(tlx, tly), tlz), tmin)
    hi = jnp.minimum(jnp.minimum(jnp.minimum(thx, thy), thz), tmax) * SLACK
    return lo <= hi


def _tri_planes(ox, oy, oz, dx, dy, dz, tmin, tmax,
                v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z):
    """Möller-Trumbore in planes (parity: isect.intersect_triangle =
    scene.cpp:229-263). Ray comps (N,1); vert comps (128,)."""
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    rx, ry, rz = _cross3(dx, dy, dz, e2x, e2y, e2z)
    den = _dot3(rx, ry, rz, e1x, e1y, e1z)
    safe_den = jnp.where(den == 0, jnp.float32(1), den)
    inv_den = jnp.float32(1) / safe_den
    cx, cy, cz = ox - v0x, oy - v0y, oz - v0z
    w1 = _dot3(rx, ry, rz, cx, cy, cz) * inv_den
    sx, sy, sz = _cross3(cx, cy, cz, e1x, e1y, e1z)
    w2 = _dot3(sx, sy, sz, dx, dy, dz) * inv_den
    t = _dot3(sx, sy, sz, e2x, e2y, e2z) * inv_den
    hit = ((den != 0)
           & (w1 >= 0) & (w1 <= 1)
           & (w2 >= 0) & (w1 + w2 <= 1)
           & (t >= tmin) & (t <= tmax))
    return hit, jnp.where(hit, t, FLT_MAX)


def _line_planes(ox, oy, oz, dx, dy, dz, tmin, tmax,
                 v0x, v0y, v0z, v1x, v1y, v1z, r0, r1):
    """Capsule segment in planes (parity: isect.intersect_line =
    scene.cpp:285-307)."""
    vx, vy, vz = v1x - v0x, v1y - v0y, v1z - v0z
    wx, wy, wz = ox - v0x, oy - v0y, oz - v0z
    a = _dot3(dx, dy, dz, dx, dy, dz)
    b = _dot3(dx, dy, dz, vx, vy, vz)
    c = _dot3(vx, vy, vz, vx, vy, vz)
    d = _dot3(dx, dy, dz, wx, wy, wz)
    e = _dot3(vx, vy, vz, wx, wy, wz)
    det = a * c - b * b
    safe_det = jnp.where(det == 0, jnp.float32(1), det)
    t = (b * e - c * d) / safe_det
    s = (a * e - b * d) / safe_det
    s = jnp.clip(s, 0.0, 1.0)
    p0x, p0y, p0z = ox + dx * t, oy + dy * t, oz + dz * t
    p1x, p1y, p1z = v0x + vx * s, v0y + vy * s, v0z + vz * s
    px, py, pz = p0x - p1x, p0y - p1y, p0z - p1z
    r = r0 * (1 - s) + r1 * s
    d2 = _dot3(px, py, pz, px, py, pz)
    hit = (det != 0) & (t >= tmin) & (t <= tmax) & (d2 <= r * r)
    return hit, jnp.where(hit, t, FLT_MAX)


def _point_planes(ox, oy, oz, dx, dy, dz, tmin, tmax, px, py, pz, r):
    """Point-as-disk in planes (parity: isect.intersect_point =
    scene.cpp:267-281)."""
    wx, wy, wz = px - ox, py - oy, pz - oz
    t = (_dot3(wx, wy, wz, dx, dy, dz)
         / _dot3(dx, dy, dz, dx, dy, dz))
    rpx, rpy, rpz = ox + dx * t, oy + dy * t, oz + dz * t
    qx, qy, qz = px - rpx, py - rpy, pz - rpz
    d2 = _dot3(qx, qy, qz, qx, qy, qz)
    hit = (t >= tmin) & (t <= tmax) & (d2 <= r * r)
    return hit, jnp.where(hit, t, FLT_MAX)


def _dense_test(stream, st, c, inst_id, lo3, ld3, active, tmin_b, lane):
    """Test all 128 prims of cluster ``c``; returns the folded state.

    lo3/ld3: instance-local ray component planes, each (N, 1). Shared by
    the per-instance loop path and the flat pair-worklist path — the
    exact same f32 ops either way (parity invariant).
    """
    lox, loy, loz = lo3
    ldx, ldy, ldz = ld3
    v0x, v0y, v0z = stream.v0x[c], stream.v0y[c], stream.v0z[c]
    v1x, v1y, v1z = stream.v1x[c], stream.v1y[c], stream.v1z[c]
    v2x, v2y, v2z = stream.v2x[c], stream.v2y[c], stream.v2z[c]
    r0 = stream.r0[c]
    r1 = stream.r1[c]
    ty = stream.ptype[c]
    gid = stream.gid[c]

    tbest_b = st["t"][:, None]

    def tri_only(_):
        h, t = _tri_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b, tbest_b,
                           v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z)
        return h & (ty >= 0), t

    def line_only(_):
        h, t = _line_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                            tbest_b, v0x, v0y, v0z, v1x, v1y, v1z,
                            r0, r1)
        return h & (ty >= 0), t

    def point_only(_):
        h, t = _point_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                             tbest_b, v0x, v0y, v0z, r0)
        return h & (ty >= 0), t

    def mixed(_):
        th, tt = _tri_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                             tbest_b, v0x, v0y, v0z, v1x, v1y, v1z,
                             v2x, v2y, v2z)
        lh, lt = _line_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                              tbest_b, v0x, v0y, v0z, v1x, v1y, v1z,
                              r0, r1)
        ph, pt = _point_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                               tbest_b, v0x, v0y, v0z, r0)
        h = jnp.where(ty == PRIM_TRIANGLE, th,
                      jnp.where(ty == PRIM_LINE, lh,
                                jnp.where(ty == PRIM_POINT, ph, False)))
        t = jnp.where(ty == PRIM_TRIANGLE, tt,
                      jnp.where(ty == PRIM_LINE, lt, pt))
        return h, t

    if _FUSED_DENSE:
        # OPT-IN experiment (YRT_DENSE_FOLD=fused; see the module note —
        # measured a frame-level no-op on TPU and kept off). Two
        # value-exact structural changes aimed at single-kernel fusion:
        # 1. no lax.switch: per-type intersectors statically compiled
        #    only for prim types the SCENE contains (s_has_lines/
        #    s_has_points), combined with ty-masked selects — the mixed
        #    branch's exact semantics.
        # 2. the winner fold as ONE variadic lax.reduce over the lane
        #    axis with a lexicographic (min t, then LAST lane, carrying
        #    its gid) combiner — associative and commutative, so any
        #    reduction order gives exactly the legacy (min + eq-mask +
        #    max-lane + sum-select) result.
        th, tt = _tri_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                             tbest_b, v0x, v0y, v0z, v1x, v1y, v1z,
                             v2x, v2y, v2z)
        h = jnp.where(ty == PRIM_TRIANGLE, th, False)
        t = tt
        if stream.s_has_lines:
            lh, lt = _line_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                                  tbest_b, v0x, v0y, v0z, v1x, v1y,
                                  v1z, r0, r1)
            h = jnp.where(ty == PRIM_LINE, lh, h)
            t = jnp.where(ty == PRIM_LINE, lt, t)
        if stream.s_has_points:
            ph, pt = _point_planes(lox, loy, loz, ldx, ldy, ldz, tmin_b,
                                   tbest_b, v0x, v0y, v0z, r0)
            h = jnp.where(ty == PRIM_POINT, ph, h)
            t = jnp.where(ty == PRIM_POINT, pt, t)
        hit = h & active[:, None]
        t = jnp.where(hit, t, FLT_MAX)

        lane_eff = jnp.where(hit, jnp.broadcast_to(lane, t.shape), -1)
        gid_eff = jnp.where(hit, jnp.broadcast_to(gid[None], t.shape), -1)

        def comb(a, b):
            at, al, ag = a
            bt, bl, bg = b
            take_b = (bt < at) | ((bt == at) & (bl > al))
            return (jnp.where(take_b, bt, at),
                    jnp.where(take_b, bl, al),
                    jnp.where(take_b, bg, ag))

        t_min, k, prim_k = jax.lax.reduce(
            (t, lane_eff, gid_eff),
            (FLT_MAX, jnp.int32(-1), jnp.int32(-1)), comb, (1,))
        accept = (k >= 0) & (t_min <= st["t"])
        return dict(
            t=jnp.where(accept, t_min, st["t"]),
            hit_inst=jnp.where(accept, inst_id, st["hit_inst"]),
            hit_prim=jnp.where(accept, prim_k, st["hit_prim"]),
        )

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


def _local_ray_planes(A, o, ox, oy, oz, dx, dy, dz):
    """World ray planes -> instance-local planes + inverse directions
    (component form of isect.transform_ray_inverse; the transform of an
    identity frame normalizes rd again, like the reference)."""
    cx, cy, cz = ox - o[0], oy - o[1], oz - o[2]
    lox = _dot3(A[0, 0], A[0, 1], A[0, 2], cx, cy, cz)
    loy = _dot3(A[1, 0], A[1, 1], A[1, 2], cx, cy, cz)
    loz = _dot3(A[2, 0], A[2, 1], A[2, 2], cx, cy, cz)
    tdx = _dot3(A[0, 0], A[0, 1], A[0, 2], dx, dy, dz)
    tdy = _dot3(A[1, 0], A[1, 1], A[1, 2], dx, dy, dz)
    tdz = _dot3(A[2, 0], A[2, 1], A[2, 2], dx, dy, dz)
    ldx, ldy, ldz = _normalize3(tdx, tdy, tdz)
    inv = (jnp.float32(1) / ldx, jnp.float32(1) / ldy, jnp.float32(1) / ldz)
    return (lox, loy, loz), (ldx, ldy, ldz), inv


@partial(jax.jit, static_argnames=("any_hit", "unroll"))
def _intersect_block_flat(
    stream: StreamScene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    any_hit: bool = False,
    unroll: int | None = None,
):
    """Flat (instance, cluster) pair-worklist scan for small scenes.

    The loop path (_intersect_block) pays ~3 sequencer regions per
    surviving instance (cond + fori wrapper + worklist groups) — on the
    refl bench that region overhead EXCEEDS the dense-test compute
    (PERF.md). Here the instance stage is unrolled in PYTHON (static
    instance count, static per-shape cluster windows from
    StreamScene.s_cl_base/s_n_cl): per instance one transform + one
    (rays x nc) slab mask, concatenated into a single (rays, PAIRS)
    mask over scene-DFS-ordered (instance, cluster) pairs, compacted
    once, and walked by ONE fori. Same dense tests in the same DFS
    order with the same folds — results identical to the loop path
    (module invariant; tests/test_stream.py covers both paths).
    """
    if unroll is None:
        unroll = UNROLL
    n_inst = len(stream.s_n_cl)
    n_pairs = sum(stream.s_n_cl)
    n = ro.shape[0]
    ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
    dx, dy, dz = rd[:, 0], rd[:, 1], rd[:, 2]

    init = dict(
        t=tmax.astype(jnp.float32),
        hit_inst=jnp.full((n,), -1, jnp.int32),
        hit_prim=jnp.full((n,), -1, jnp.int32),
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CLUSTER), 1)
    tmin_b = tmin[:, None]

    # static instance stage: local planes + per-pair masks, no regions
    lox_l, loy_l, loz_l = [], [], []
    ldx_l, ldy_l, ldz_l = [], [], []
    masks = []
    pair_inst_l, pair_cl_l = [], []
    for k in range(n_inst):
        A = stream.inst_axes[k]
        o = stream.inst_o[k]
        lo3, ld3, il3 = _local_ray_planes(A, o, ox, oy, oz, dx, dy, dz)
        lox_l.append(lo3[0]); loy_l.append(lo3[1]); loz_l.append(lo3[2])
        ldx_l.append(ld3[0]); ldy_l.append(ld3[1]); ldz_l.append(ld3[2])
        base = stream.s_cl_base[k]
        nc = stream.s_n_cl[k]
        cbn = stream.cb_min[base:base + nc]          # static slice
        cbx = stream.cb_max[base:base + nc]
        m = _bbox_hit(lo3[0][:, None], lo3[1][:, None], lo3[2][:, None],
                      il3[0][:, None], il3[1][:, None], il3[2][:, None],
                      tmin[:, None], tmax[:, None],
                      (cbn[None, :, 0], cbn[None, :, 1], cbn[None, :, 2]),
                      (cbx[None, :, 0], cbx[None, :, 1], cbx[None, :, 2]))
        masks.append(m)                               # (N, nc)
        pair_inst_l.extend([k] * nc)
        pair_cl_l.extend(range(base, base + nc))

    pair_mask = jnp.concatenate(masks, axis=1)        # (N, PAIRS)
    pair_inst = jnp.asarray(pair_inst_l, jnp.int32)
    pair_cl = jnp.asarray(pair_cl_l, jnp.int32)
    LOX = jnp.stack(lox_l); LOY = jnp.stack(loy_l); LOZ = jnp.stack(loz_l)
    LDX = jnp.stack(ldx_l); LDY = jnp.stack(ldy_l); LDZ = jnp.stack(ldz_l)

    psurv = jnp.any(pair_mask, axis=0)                # (PAIRS,)
    # ascending compaction keeps scene-DFS pair order (parity order)
    work = jnp.nonzero(psurv, size=n_pairs,
                       fill_value=0)[0].astype(jnp.int32)
    n_work = jnp.sum(psurv.astype(jnp.int32))

    def body(w, st):
        for j in range(unroll):
            idx = w * unroll + j
            valid = idx < n_work
            p = work[jnp.minimum(idx, n_pairs - 1)]
            ii = pair_inst[p]
            c = pair_cl[p]
            lox, loy, loz = LOX[ii], LOY[ii], LOZ[ii]
            ldx, ldy, ldz = LDX[ii], LDY[ii], LDZ[ii]
            ilx = jnp.float32(1) / ldx
            ily = jnp.float32(1) / ldy
            ilz = jnp.float32(1) / ldz
            # re-test with the CURRENT per-ray t (tighter than the stale
            # block mask) — same ops as the sequential walk
            active = valid & _bbox_hit(lox, loy, loz, ilx, ily, ilz,
                                       tmin, st["t"], stream.cb_min[c],
                                       stream.cb_max[c])
            if any_hit:
                active = active & (st["hit_prim"] < 0)
            st = _dense_test(stream, st, c, stream.inst_id[ii],
                             (lox[:, None], loy[:, None], loz[:, None]),
                             (ldx[:, None], ldy[:, None], ldz[:, None]),
                             active, tmin_b, lane)
        return st

    n_iter_max = (n_work + unroll - 1) // unroll
    out = jax.lax.fori_loop(0, n_iter_max, body, init)
    return dict(
        hit=out["hit_prim"] >= 0,
        inst=out["hit_inst"],
        prim=out["hit_prim"],
        t=out["t"],
    )


@partial(jax.jit, static_argnames=("any_hit", "unroll"))
def _intersect_block_flat2(
    stream: StreamScene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    any_hit: bool = False,
    unroll: int | None = None,
):
    """Hybrid pair-worklist scan: flat's single fori, loop path's math.

    The r3 flat path (_intersect_block_flat) removed the ~3 sequencer
    regions per surviving instance but paid for it with per-pair dynamic
    ROW-SLICES of (I, N) stacked local-ray planes — measured 25% slower.
    This variant keeps the flat structure (static Python instance stage
    building one (N, PAIRS) mask; ONE fori over compacted survivor
    pairs) but inside the loop body RECOMPUTES the instance-local ray
    from 12 gathered instance scalars (inst_axes/inst_o) instead of
    slicing stacks: ~20 N-wide VPU ops per pair, no (I, N) intermediates
    in HBM, no dynamic row-slices. Same dense tests in the same DFS pair
    order with the same folds (module invariant; parity-tested in
    tests/test_stream.py). A/B vs the loop path: PERF.md r4.
    """
    if unroll is None:
        unroll = UNROLL
    n_inst = len(stream.s_n_cl)
    n_pairs = sum(stream.s_n_cl)
    n = ro.shape[0]
    ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
    dx, dy, dz = rd[:, 0], rd[:, 1], rd[:, 2]

    init = dict(
        t=tmax.astype(jnp.float32),
        hit_inst=jnp.full((n,), -1, jnp.int32),
        hit_prim=jnp.full((n,), -1, jnp.int32),
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CLUSTER), 1)
    tmin_b = tmin[:, None]

    # static instance stage: per-pair masks only (local planes are NOT
    # kept — the body recomputes them), no control-flow regions
    masks = []
    pair_inst_l, pair_cl_l = [], []
    for k in range(n_inst):
        A = stream.inst_axes[k]
        o = stream.inst_o[k]
        lo3, _, il3 = _local_ray_planes(A, o, ox, oy, oz, dx, dy, dz)
        base = stream.s_cl_base[k]
        nc = stream.s_n_cl[k]
        cbn = stream.cb_min[base:base + nc]              # static slice
        cbx = stream.cb_max[base:base + nc]
        m = _bbox_hit(lo3[0][:, None], lo3[1][:, None], lo3[2][:, None],
                      il3[0][:, None], il3[1][:, None], il3[2][:, None],
                      tmin[:, None], tmax[:, None],
                      (cbn[None, :, 0], cbn[None, :, 1], cbn[None, :, 2]),
                      (cbx[None, :, 0], cbx[None, :, 1], cbx[None, :, 2]))
        masks.append(m)                                   # (N, nc)
        pair_inst_l.extend([k] * nc)
        pair_cl_l.extend(range(base, base + nc))

    pair_mask = jnp.concatenate(masks, axis=1)            # (N, PAIRS)
    pair_inst = jnp.asarray(pair_inst_l, jnp.int32)
    pair_cl = jnp.asarray(pair_cl_l, jnp.int32)

    psurv = jnp.any(pair_mask, axis=0)                    # (PAIRS,)
    work = jnp.nonzero(psurv, size=n_pairs,
                       fill_value=0)[0].astype(jnp.int32)
    n_work = jnp.sum(psurv.astype(jnp.int32))

    def body(w, st):
        for j in range(unroll):
            idx = w * unroll + j
            valid = idx < n_work
            p = work[jnp.minimum(idx, n_pairs - 1)]
            ii = pair_inst[p]
            c = pair_cl[p]
            # recompute the local ray from gathered instance params —
            # the loop path's exact transform ops (parity)
            A = stream.inst_axes[ii]
            o = stream.inst_o[ii]
            lo3, ld3, il3 = _local_ray_planes(A, o, ox, oy, oz,
                                              dx, dy, dz)
            lox, loy, loz = lo3
            ldx, ldy, ldz = ld3
            active = valid & _bbox_hit(lox, loy, loz, il3[0], il3[1],
                                       il3[2], tmin, st["t"],
                                       stream.cb_min[c],
                                       stream.cb_max[c])
            if any_hit:
                active = active & (st["hit_prim"] < 0)
            st = _dense_test(stream, st, c, stream.inst_id[ii],
                             (lox[:, None], loy[:, None], loz[:, None]),
                             (ldx[:, None], ldy[:, None], ldz[:, None]),
                             active, tmin_b, lane)
        return st

    n_iter_max = (n_work + unroll - 1) // unroll
    out = jax.lax.fori_loop(0, n_iter_max, body, init)
    return dict(
        hit=out["hit_prim"] >= 0,
        inst=out["hit_inst"],
        prim=out["hit_prim"],
        t=out["t"],
    )


BLOCK_RAYS = 8192   # rays per skip-granularity block (tile-matched; with
#                     tile-ordered pixels a block is a compact screen
#                     tile). r5 re-sweep WITH unroll as a free axis: refl
#                     peaks at 8192:1 = 3.98 Mrays/s vs 32768:1 = 3.34
#                     (2048 -> 3.25, 4096 -> 3.84, 16384 -> 3.45; 8192:2
#                     ties 8192:1). The r4 sweep that chose 32768 only
#                     ever paired small blocks with unroll 4, whose
#                     padding waste masked the small-block win — the same
#                     culling-granularity dial the instance sweep exposed,
#                     here at the CLUSTER level. PERF.md r5.
UNROLL = 1          # clusters tested per worklist-loop iteration
# block * n_inst started life in r4 as a MEMORY cap at 2^27: the flat
# shortlist's (N, I) mask at 32768 x 10,004 was a 328 MB pred buffer
# that crashed the TPU worker. The r5 hierarchical shortlist (GROUP-
# merged bboxes + per-group refinement) cut the mask to (N, ceil(I/64)),
# re-admitting 32768-ray blocks — and the interleaved sweep then showed
# block * n_inst is really a CULLING-GRANULARITY dial: a k-times-larger
# screen tile shortlists ~k times the instances for every ray in it, and
# at 10k instances that extra dense work dwarfs the saved sequencer
# regions. Sweep at 10k (PERF.md r5): 32768 -> 0.330, 16384 -> 0.389,
# 8192 -> 0.509, **4096 -> 0.548** (unroll 2), 2048 -> 0.474 Mrays/s —
# peak at block*I ~ 2^25.3, so the halving targets 2^26 (one halving
# step above the peak product; the refl scene, 5 instances, stays
# uncapped at 32768 where it measured fastest). Memory is a separate,
# looser budget on the hierarchical mask width (2^27, asserted — huge
# instance counts fail loudly instead of overflowing, r4 advisor
# finding).
MAX_BLOCK_ELEMS = 1 << 27    # memory budget on (N, shortlist_width)
GRAN_BLOCK_ELEMS = 1 << 26   # culling-granularity target on N * I
CAPPED_UNROLL = 2            # measured: 4096:2 > 4096:1 > 4096:4 at 10k


def shortlist_width(n_inst: int) -> int:
    """Per-block shortlist mask width W: (rays x W) is the widest buffer
    the instance-cull stage materializes."""
    if n_inst >= HIER_MIN_INST:
        return max(-(-n_inst // GROUP), GROUP)
    return max(n_inst, 1)


def effective_block_unroll(n_inst: int):
    """Scene-adaptive (block_rays, unroll) — see the note above."""
    block = BLOCK_RAYS
    while block > 256 and block * max(n_inst, 1) > GRAN_BLOCK_ELEMS:
        block //= 2
    assert block * shortlist_width(n_inst) <= MAX_BLOCK_ELEMS, (
        f"{n_inst} instances: even a {block}-ray block exceeds the "
        f"shortlist mask budget (MAX_BLOCK_ELEMS)")
    return block, (UNROLL if block == BLOCK_RAYS else CAPPED_UNROLL)
# The flat pair-worklist path (opt-in, YRT_FLAT_SCAN=1) was built to
# eliminate the per-instance sequencer regions, but measured 25% SLOWER
# than the loop path on the refl bench (2.37 vs 3.12 Mrays/s wall): the
# per-pair dynamic row-slices of the stacked local-ray planes and the
# weaker initial-tmax masks cost more than the ~3 regions/instance they
# save. Kept (parity-tested, tests/test_stream.py runs both) as the
# documented experiment — see PERF.md. YRT_FLAT_SCAN=2 selects the r4
# hybrid (_intersect_block_flat2: flat structure, per-pair transform
# recompute) — A/B in PERF.md r4.
import os as _os  # noqa: E402

_FLAT_ENV = _os.environ.get("YRT_FLAT_SCAN", "")
FORCE_LOOP_PATH = _FLAT_ENV not in ("1", "2")


@partial(jax.jit, static_argnames=("any_hit", "flat", "block_unroll"))
def intersect_stream(
    stream: StreamScene,
    ro: jnp.ndarray,     # (N, 3)
    rd: jnp.ndarray,     # (N, 3)
    tmin: jnp.ndarray,   # (N,)
    tmax: jnp.ndarray,   # (N,)
    any_hit: bool = False,
    flat: bool | None = None,   # None -> module default (env opt-in)
    block_unroll: tuple | None = None,  # static (block, unroll) override;
    # None -> scene-adaptive effective_block_unroll. An explicit value is
    # part of the jit cache key, so sweeps/A/Bs can interleave compiled
    # configs without mutating module globals.
):
    """Nearest-hit (or any-hit) by scanning all clusters in DFS order.

    Rays are processed in blocks of BLOCK_RAYS (sequential ``lax.map``):
    the bbox-skip conds then fire per (cluster, block) — a full 262k-ray
    batch almost never skips anything (some ray somewhere intersects every
    cluster), while coherent 2k blocks skip most of the scene.

    Returns the same dict as traverse.intersect_scene and matches it to
    <= 1 ULP in t with identical DFS-order tie semantics (module
    docstring).
    """
    n = ro.shape[0]
    # flat pair-worklist path only for small instance counts (static
    # host-side choice; the per-instance loop path handles 10k-instance
    # scenes where a dense pair space would not fit)
    n_pairs = sum(stream.s_n_cl)
    block, unroll = (block_unroll if block_unroll is not None
                     else effective_block_unroll(
                         stream.inst_wb_min.shape[0]))
    if flat is None:
        flat = not FORCE_LOOP_PATH
    flat = flat and len(stream.s_n_cl) <= 32 and 0 < n_pairs <= 512
    flat_fn = (_intersect_block_flat2 if _FLAT_ENV == "2"
               else _intersect_block_flat)
    block_fn = flat_fn if flat else _intersect_block
    if n > block:
        pad = (-n) % block
        def pad0(x, v=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], v, x.dtype)])
        blocks = jax.lax.map(
            lambda args: block_fn(stream, *args, any_hit=any_hit,
                                  unroll=unroll),
            (pad0(ro).reshape(-1, block, 3),
             pad0(rd).reshape(-1, block, 3),
             pad0(tmin).reshape(-1, block),
             pad0(tmax, -FLT_MAX).reshape(-1, block)))
        return {k: v.reshape(-1)[:n] for k, v in blocks.items()}
    return block_fn(stream, ro, rd, tmin, tmax, any_hit=any_hit,
                    unroll=unroll)


@partial(jax.jit, static_argnames=("any_hit", "unroll"))
def _intersect_block(
    stream: StreamScene,
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    any_hit: bool = False,
    unroll: int | None = None,
):
    if unroll is None:
        unroll = UNROLL
    n = ro.shape[0]
    ox, oy, oz = ro[:, 0], ro[:, 1], ro[:, 2]
    dx, dy, dz = rd[:, 0], rd[:, 1], rd[:, 2]
    # world-space ray with the identity-frame normalization the reference's
    # scene-level traversal applies (transform_direction_inverse normalizes)
    wdx, wdy, wdz = _normalize3(dx, dy, dz)
    iwx, iwy, iwz = (jnp.float32(1) / wdx, jnp.float32(1) / wdy,
                     jnp.float32(1) / wdz)

    init = dict(
        t=tmax.astype(jnp.float32),
        hit_inst=jnp.full((n,), -1, jnp.int32),
        hit_prim=jnp.full((n,), -1, jnp.int32),
    )

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CLUSTER), 1)
    tmin_b = tmin[:, None]

    def dense_test(st, c, inst_id, lo3, ld3, active):
        return _dense_test(stream, st, c, inst_id, lo3, ld3, active,
                           tmin_b, lane)

    def instance_body(st, ii):
        """One instance: transform once, dense-mask its clusters, then a
        single fori over the COMPACTED survivor worklist.

        Control-flow regions (while/cond bodies) cost ~25 us of sequencer
        overhead each on TPU — an order of magnitude more than a dense
        128-prim test (~2.4 us). So instead of a cond-gated loop over
        clusters, slab-test every cluster bbox of the shape in ONE dense
        (rays x clusters) pass, reduce to a per-cluster any-ray mask,
        compact with nonzero, and spend loop iterations only on clusters
        that someone can hit. The mask uses the instance-entry t (stale
        within the walk) — a weaker cull is a superset of clusters, and
        extra clusters cannot change results (module invariant).
        """
        m_inst = _bbox_hit(ox, oy, oz, iwx, iwy, iwz, tmin, st["t"],
                           stream.inst_wb_min[ii], stream.inst_wb_max[ii])
        if any_hit:
            m_inst = m_inst & (st["hit_prim"] < 0)

        def expand():
            # instance-local ray (the transform of an identity frame
            # normalizes rd again, like the reference — keep for parity);
            # component form of isect.transform_ray_inverse
            A = stream.inst_axes[ii]
            o = stream.inst_o[ii]
            cx, cy, cz = ox - o[0], oy - o[1], oz - o[2]
            lox = _dot3(A[0, 0], A[0, 1], A[0, 2], cx, cy, cz)
            loy = _dot3(A[1, 0], A[1, 1], A[1, 2], cx, cy, cz)
            loz = _dot3(A[2, 0], A[2, 1], A[2, 2], cx, cy, cz)
            tdx = _dot3(A[0, 0], A[0, 1], A[0, 2], dx, dy, dz)
            tdy = _dot3(A[1, 0], A[1, 1], A[1, 2], dx, dy, dz)
            tdz = _dot3(A[2, 0], A[2, 1], A[2, 2], dx, dy, dz)
            ldx, ldy, ldz = _normalize3(tdx, tdy, tdz)
            ilx, ily, ilz = (jnp.float32(1) / ldx, jnp.float32(1) / ldy,
                             jnp.float32(1) / ldz)
            lo3 = (lox[:, None], loy[:, None], loz[:, None])
            ld3 = (ldx[:, None], ldy[:, None], ldz[:, None])
            cl_base = stream.inst_cl_base[ii]
            nc = stream.inst_n_cl[ii]
            inst_id = stream.inst_id[ii]

            # dense per-cluster mask: slab-test this instance's local ray
            # batch against EVERY cluster bbox in the scene (C is the
            # per-SHAPE cluster count — shared by all instances of a shape
            # — so this stays tiny even at 10k instances), then window to
            # [cl_base, cl_base + nc)
            n_cl = stream.cb_min.shape[0]
            m_cl = _bbox_hit(lo3[0], lo3[1], lo3[2],
                             ilx[:, None], ily[:, None], ilz[:, None],
                             tmin[:, None], st["t"][:, None],
                             (stream.cb_min[None, :, 0],
                              stream.cb_min[None, :, 1],
                              stream.cb_min[None, :, 2]),
                             (stream.cb_max[None, :, 0],
                              stream.cb_max[None, :, 1],
                              stream.cb_max[None, :, 2]))   # (N, C)
            m_cl = m_cl & m_inst[:, None]
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_cl), 1)
            in_win = (k_iota >= cl_base) & (k_iota < cl_base + nc)
            csurv = jnp.any(m_cl & in_win, axis=0)          # (C,)
            # ascending compaction preserves the shape-DFS cluster order
            work = jnp.nonzero(csurv, size=n_cl,
                               fill_value=0)[0].astype(jnp.int32)
            n_work = jnp.sum(csurv.astype(jnp.int32))

            def cl_body(w, st):
                # UNROLL clusters per iteration: each control-flow region
                # costs ~25 us of TPU sequencer overhead vs ~2.4 us for a
                # dense 128-prim test, so amortize the region over several
                # clusters. The folds stay sequential in worklist order —
                # identical math and fold order to the K=1 loop.
                for j in range(unroll):
                    idx = w * unroll + j
                    valid = idx < n_work
                    c = work[jnp.minimum(idx, n_cl - 1)]
                    cbn = stream.cb_min[c]
                    cbx = stream.cb_max[c]
                    # re-test with the CURRENT per-ray t (tighter than the
                    # stale mask) — same ops as the sequential walk
                    active = (valid & m_inst
                              & _bbox_hit(lox, loy, loz, ilx, ily, ilz,
                                          tmin, st["t"], cbn, cbx))
                    st = dense_test(st, c, inst_id, lo3, ld3, active)
                return st

            n_iter = (n_work + unroll - 1) // unroll
            return jax.lax.fori_loop(0, n_iter, cl_body, st)

        return jax.lax.cond(jnp.any(m_inst), expand, lambda: st)

    # phase 1: per-block instance shortlist — a per-instance any-ray
    # survival vector, compacted with nonzero. The walk loop is bounded by
    # the ACTUAL survivor count — per-iteration control-flow overhead (~us
    # on the TPU sequencer) is paid only for instances the block can
    # possibly hit. nonzero preserves ascending order = scene-DFS order,
    # so the parity test order is unchanged.
    n_inst = stream.inst_wb_min.shape[0]

    def inst_window_mask(wmin, wmax):
        """Dense slab pass of the block vs a window of world bboxes."""
        return _bbox_hit(ox[:, None], oy[:, None], oz[:, None],
                         iwx[:, None], iwy[:, None], iwz[:, None],
                         tmin[:, None], tmax[:, None],
                         (wmin[None, :, 0], wmin[None, :, 1],
                          wmin[None, :, 2]),
                         (wmax[None, :, 0], wmax[None, :, 1],
                          wmax[None, :, 2]))

    if stream.grp_wb_min is not None and n_inst >= HIER_MIN_INST:
        # hierarchical (r5): slab-test the ceil(I/GROUP) merged group
        # bboxes first, then refine ONLY surviving groups with a dense
        # (rays x GROUP) pass over that group's instance window. Because
        # the f32 slab test is monotone under bbox enlargement (sub/mul
        # round monotonically; NaN-drop only widens) a member-instance hit
        # implies its group hits, so the refined survival vector is
        # EXACTLY the flat (N, I) pass's — same candidates, same walk
        # order, bit-identical results — at 1/GROUP the mask memory and
        # slab work (the r4 cap that forced 8192-ray blocks at 10k
        # instances no longer binds; PERF.md r5).
        n_grp = stream.grp_wb_min.shape[0]
        gsurv = jnp.any(inst_window_mask(stream.grp_wb_min,
                                         stream.grp_wb_max), axis=0)
        gwork = jnp.nonzero(gsurv, size=n_grp,
                            fill_value=0)[0].astype(jnp.int32)
        g_count = jnp.sum(gsurv.astype(jnp.int32))

        def g_body(i, sv):
            # window start clamped so the GROUP-wide slice stays in
            # bounds; overlapping windows recompute the same pure
            # per-instance test, so overwrites are idempotent
            s0 = jnp.minimum(gwork[i] * GROUP, n_inst - GROUP)
            wmin = jax.lax.dynamic_slice(stream.inst_wb_min, (s0, 0),
                                         (GROUP, 3))
            wmax = jax.lax.dynamic_slice(stream.inst_wb_max, (s0, 0),
                                         (GROUP, 3))
            s = jnp.any(inst_window_mask(wmin, wmax), axis=0)
            return jax.lax.dynamic_update_slice(sv, s, (s0,))

        surv = jax.lax.fori_loop(0, g_count, g_body,
                                 jnp.zeros((n_inst,), bool))
    else:
        # flat: ONE dense vectorized slab pass over all instances' world
        # bboxes (rays x instances)
        surv = jnp.any(inst_window_mask(stream.inst_wb_min,
                                        stream.inst_wb_max), axis=0)
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
