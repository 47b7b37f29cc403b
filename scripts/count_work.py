"""Instrument the stream scan's culling on the refl bench config.

Counts, per 4096-ray tile-ordered block of primary rays: surviving
instances (phase-1 shortlist) and surviving (instance, cluster) pairs
(the dense worklist). From these, derives tested prim-pairs per ray and a
VPU roofline bound for the dense-test stage — the numbers PERF.md cites.

Pure numpy on the host (no TPU needed); the bbox math mirrors
ops/stream.py's _bbox_hit.
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

    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dscene, meta)
    dev = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    spp = SAMPLES * SAMPLES
    npix = width * height
    block = stream_mod.BLOCK_RAYS

    perm = renderer.tile_permutation(width, height, spp, block)
    n = npix * spp
    g = np.arange(n)
    ids = perm[g // spp] * spp + g % spp
    _, uv = camera_mod.pixel_uv(width, height, SAMPLES,
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
    nb = -(-n // block)
    inst_surv_tot = 0
    pair_surv_tot = 0
    cl_tested_tot = 0  # includes UNROLL padding waste
    per_block = []
    for b in range(nb):
        s = slice(b * block, min((b + 1) * block, n))
        m_inst = bbox_hit(ro[s], inv[s], tmin[s], tmax[s],
                          ss.inst_wb_min, ss.inst_wb_max)   # (N, I)
        surv_i = np.flatnonzero(m_inst.any(axis=0))
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
            tested += -(-csurv // stream_mod.UNROLL) * stream_mod.UNROLL
        inst_surv_tot += len(surv_i)
        pair_surv_tot += pairs
        cl_tested_tot += tested
        per_block.append((len(surv_i), pairs))

    # every ray of a block participates in each of the block's dense
    # cluster tests -> prims tested per ray = clusters_tested * 128
    pairs_per_ray = cl_tested_tot / nb * 128
    # dense-test cost model: ~95 f32 VPU ops per (ray, prim) pair
    # (Moller-Trumbore planes + winner fold; mixed clusters cost ~2.2x)
    OPS_PER_PAIR = 95
    VPU_PEAK = 3.7e12  # f32 op/s, TPU v5e VPU (8x128 lanes x 4 ALUs x .9GHz)
    dense_ops = cl_tested_tot * block * 128 * OPS_PER_PAIR
    # cluster-mask pass: one (block x C) slab test (~25 ops/pair) per
    # expanded instance; instance shortlist: one (block x I) slab pass
    mask_ops = inst_surv_tot * block * C * 25 + nb * block * I * 25
    # control-flow regions: ~1 per UNROLL-group + ~3 per expanded instance
    regions = cl_tested_tot / stream_mod.UNROLL + inst_surv_tot * 3
    out = dict(
        blocks=nb, rays=n, instances=I, clusters=C,
        inst_survivors_per_block=round(inst_surv_tot / nb, 2),
        cluster_pairs_per_block=round(pair_surv_tot / nb, 2),
        tested_clusters_per_block=round(cl_tested_tot / nb, 2),
        prim_pairs_tested_per_ray=round(pairs_per_ray, 1),
        dense_test_vpu_seconds_bound=round(dense_ops / VPU_PEAK, 4),
        mask_pass_vpu_seconds_bound=round(mask_ops / VPU_PEAK, 4),
        region_overhead_seconds_est=round(regions * 25e-6, 4),
        note="primary nearest pass only; the depth-4 frame adds ~2 shadow "
             "rays/bounce (2 lights) and 3 more bounces of the same shape",
    )
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
