"""Instrument the stream scan's culling on a bench config.

Counts, per tile-ordered block of primary rays: surviving groups (r5
hierarchical shortlist, when active), surviving instances, and surviving
(instance, cluster) pairs (the dense worklist). From these, derives
tested prim-pairs per ray and a VPU roofline bound for the dense-test
stage — the numbers PERF.md cites — plus the flat-vs-hierarchical
shortlist slab-work comparison.

Pure numpy on the host (no TPU needed); the bbox math mirrors
ops/stream.py's _bbox_hit.

Usage: python scripts/count_work.py [refl|instance10000] [--sample K]
  (--sample K: measure K evenly spaced blocks instead of all — the
   host-side inner loop over ~10^3 surviving instances per block is
   minutes/block on instance10000)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import sys

import numpy as np

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import camera as camera_mod, renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
SLACK = np.float32(1.00000024)


def bbox_hit(ro, inv, tmin, tmax, bmin, bmax):
    """(N, 3) rays vs (C, 3) boxes -> (N, C) bool (stream._bbox_hit)."""
    t0 = (bmin[None] - ro[:, None]) * inv[:, None]
    t1 = (bmax[None] - ro[:, None]) * inv[:, None]
    tl = np.where(inv[:, None] < 0, t1, t0)
    th = np.where(inv[:, None] < 0, t0, t1)
    tl = np.where(np.isnan(tl), -np.inf, tl)
    th = np.where(np.isnan(th), np.inf, th)
    lo = np.maximum(tl.max(axis=-1), tmin[:, None])
    hi = np.minimum(th.min(axis=-1), tmax[:, None]) * SLACK
    return lo <= hi


def main():
    import jax.numpy as jnp

    scene_name = (sys.argv[1] if len(sys.argv) > 1
                  and not sys.argv[1].startswith("-") else "refl")
    sample = 0
    if "--sample" in sys.argv:
        sample = int(sys.argv[sys.argv.index("--sample") + 1])
    scene_path = (SCENE if scene_name == "refl" else
                  f"/root/reference/in/{scene_name}_pointlight/"
                  f"{scene_name}_pointlight.obj")
    res = RES if scene_name == "refl" else 1024
    samples = SAMPLES if scene_name == "refl" else 8

    host = scene_lib.load_scene(scene_path)
    dscene, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dscene, meta)
    dev = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, res)
    height = res
    spp = samples * samples
    npix = width * height
    block, unroll = stream_mod.effective_block_unroll(
        ss.inst_wb_min.shape[0])
    SAMPLES_ = samples

    perm = renderer.tile_permutation(width, height, spp, block)
    n = npix * spp
    g = np.arange(n)
    ids = perm[g // spp] * spp + g % spp
    _, uv = camera_mod.pixel_uv(width, height, SAMPLES_,
                                jnp.asarray(ids, jnp.int32))
    ro, rd = camera_mod.eval_camera(dev, uv)
    ro = np.asarray(ro)
    rd = np.asarray(rd)
    rd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    inv = 1.0 / rd
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 3.4e38, np.float32)

    I = ss.inst_wb_min.shape[0]
    C = ss.cb_min.shape[0]
    G = stream_mod.GROUP
    hier = I >= stream_mod.HIER_MIN_INST
    n_grp = ss.grp_wb_min.shape[0]
    nb = -(-n // block)
    measure = (list(range(nb)) if not sample
               else sorted(set(np.linspace(0, nb - 1, sample)
                               .astype(int).tolist())))
    grp_surv_tot = 0
    inst_surv_tot = 0
    pair_surv_tot = 0
    cl_tested_tot = 0  # includes UNROLL padding waste
    for b in measure:
        s = slice(b * block, min((b + 1) * block, n))
        m_inst = bbox_hit(ro[s], inv[s], tmin[s], tmax[s],
                          ss.inst_wb_min, ss.inst_wb_max)   # (N, I)
        surv_i = np.flatnonzero(m_inst.any(axis=0))
        # group stats are counted for flat scenes too, so the
        # hier-vs-flat shortlist comparison (which informs
        # HIER_MIN_INST) includes the refinement term either way
        m_grp = bbox_hit(ro[s], inv[s], tmin[s], tmax[s],
                         ss.grp_wb_min, ss.grp_wb_max)
        grp_surv_tot += int(m_grp.any(axis=0).sum())
        pairs = 0
        tested = 0
        for ii in surv_i:
            A = ss.inst_axes[ii]
            o = ss.inst_o[ii]
            lo = (ro[s] - o) @ A.T
            ld = rd[s] @ A.T
            ld /= np.linalg.norm(ld, axis=-1, keepdims=True)
            m_cl = bbox_hit(lo, 1.0 / ld, tmin[s], tmax[s],
                            ss.cb_min, ss.cb_max)           # (N, C)
            base = int(ss.inst_cl_base[ii])
            nc = int(ss.inst_n_cl[ii])
            csurv = int(m_cl[:, base:base + nc].any(axis=0).sum())
            pairs += csurv
            tested += -(-csurv // unroll) * unroll
        inst_surv_tot += len(surv_i)
        pair_surv_tot += pairs
        cl_tested_tot += tested

    nm = len(measure)
    # every ray of a block participates in each of the block's dense
    # cluster tests -> prims tested per ray = clusters_tested * 128
    pairs_per_ray = cl_tested_tot / nm * 128
    # dense-test cost model: ~95 f32 VPU ops per (ray, prim) pair
    # (Moller-Trumbore planes + winner fold; mixed clusters cost ~2.2x)
    OPS_PER_PAIR = 95
    VPU_PEAK = 3.7e12  # f32 op/s, TPU v5e VPU (8x128 lanes x 4 ALUs x .9GHz)
    dense_ops = cl_tested_tot / nm * nb * block * 128 * OPS_PER_PAIR
    # cluster-mask pass: one (block x C) slab test (~25 ops/pair) per
    # expanded instance; shortlist slab work: FLAT = one (block x I)
    # pass; HIER = one (block x ceil(I/G)) group pass + one (block x G)
    # window per surviving group
    short_flat = nb * block * I * 25
    short_hier = (nb * block * n_grp * 25
                  + grp_surv_tot / nm * nb * block * G * 25)
    mask_ops = (inst_surv_tot / nm * nb * block * C * 25
                + (short_hier if hier else short_flat))
    # control-flow regions: ~1 per UNROLL-group + ~3 per expanded
    # instance + (hier) 1 per surviving group's refinement window
    regions = (cl_tested_tot / unroll + inst_surv_tot * 3
               + grp_surv_tot) / nm * nb
    out = dict(
        scene=scene_name, blocks=nb, measured_blocks=nm, rays=n,
        instances=I, clusters=C, block_rays=block, unroll=unroll,
        hierarchical=hier,
        grp_survivors_per_block=round(grp_surv_tot / nm, 2),
        inst_survivors_per_block=round(inst_surv_tot / nm, 2),
        cluster_pairs_per_block=round(pair_surv_tot / nm, 2),
        tested_clusters_per_block=round(cl_tested_tot / nm, 2),
        prim_pairs_tested_per_ray=round(pairs_per_ray, 1),
        dense_test_vpu_seconds_bound=round(dense_ops / VPU_PEAK, 4),
        mask_pass_vpu_seconds_bound=round(mask_ops / VPU_PEAK, 4),
        shortlist_flat_vpu_seconds=round(short_flat / VPU_PEAK, 4),
        shortlist_hier_vpu_seconds=round(short_hier / VPU_PEAK, 4),
        region_overhead_seconds_est=round(regions * 25e-6, 4),
        note="primary nearest pass only; the depth-4 frame adds shadow "
             "rays per light per bounce and more bounces of the same "
             "shape",
    )
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
