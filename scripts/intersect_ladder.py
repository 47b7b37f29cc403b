"""Micro-decomposition of the stream intersect stage (r5).

The shade_bound ladder measured the depth-1 refl intersect stage at
0.558 s/frame, but the r4 per-pass bound model (dense 0.132 + slab
0.015 + regions 0.054) predicts ~0.2 s. This script times the stage's
building blocks STANDALONE on real bench rays to locate the gap:

  block    one full _intersect_block nearest pass per 32768-ray block
  dense    a fori chain of K=6 real _dense_test folds (the measured
           tested-clusters/block) on the same rays
  mcl      the per-instance (N, C) cluster-mask slab pass + nonzero
           compaction + worklist setup
  region   an N-state fori_loop whose body does ~nothing: the
           sequencer cost per control-flow region at this state size
  inst     the per-instance cond + local-ray transform alone

All pieces compile once and run interleaved best-of-5 with 4-byte pull
barriers. Results feed PERF.md's intersect-stage table.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import camera as camera_mod, renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
BLOCK = 32768
FLT_MAX = np.float32(3.4028235e38)


def timeit(name, fn, inner=1, reps=5):
    """Per-ITERATION seconds: ``fn`` must loop its workload ``inner``
    times INSIDE one jit dispatch (sequential data dependency) — a
    single dispatch over the tunnel costs ~30 ms of RPC latency, so
    sub-30ms pieces are invisible without internal repetition."""
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    per = best / inner
    print(f"{name:34s} {best*1e3:9.3f} ms / {inner:4d} = "
          f"{per*1e6:9.1f} us/iter", flush=True)
    return per


def main():
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dscene, meta)
    ss = jax.tree_util.tree_map(jnp.asarray, ss)
    dev = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    spp = SAMPLES * SAMPLES
    npix = width * height
    n = npix * spp
    nb = -(-n // BLOCK)

    # real bench rays in tile order; take a mid-frame block
    perm = renderer.tile_permutation(width, height, spp, BLOCK)
    g = np.arange(BLOCK) + (nb // 2) * BLOCK
    ids = perm[np.minimum(g // spp, npix - 1)] * spp + g % spp
    _, uv = camera_mod.pixel_uv(width, height, SAMPLES,
                                jnp.asarray(ids, jnp.int32))
    ro, rd = camera_mod.eval_camera(dev, uv)
    tmin = jnp.full((BLOCK,), 1e-4, jnp.float32)
    tmax = jnp.full((BLOCK,), FLT_MAX, jnp.float32)
    C = ss.cb_min.shape[0]
    print(f"refl: {nb} blocks of {BLOCK} rays, {C} clusters, "
          f"{ss.inst_wb_min.shape[0]} instances", flush=True)

    # 0. bare dispatch floor (the tunnel RPC round trip)
    tiny = jax.jit(lambda x: x + 1.0)

    def run_tiny():
        assert float(tiny(jnp.float32(0.0))) > 0
    t_disp = timeit("bare dispatch (RPC floor)", run_tiny)

    # 1. full block nearest pass, R sequential passes in ONE dispatch
    # (each pass's tmax depends on the previous pass's t: serialized)
    R_BLK = 16

    @jax.jit
    def blocks_chained(ss_, ro_, rd_, tmin_, tmax_):
        def body(i, t):
            out = stream_mod._intersect_block(
                ss_, ro_, rd_, tmin_, t + jnp.float32(0.0),
                any_hit=False, unroll=1)
            return jnp.maximum(out["t"], tmax_)  # = tmax_, data-dependent
        return jax.lax.fori_loop(0, R_BLK, body, tmax_)

    def run_block():
        out = blocks_chained(ss, ro, rd, tmin, tmax)
        assert float(out[0]) > 0
    t_block = timeit("full _intersect_block", run_block, inner=R_BLK)

    # 2. dense-test chain: K real folds through cluster ids round-robin
    K = 96
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, stream_mod.CLUSTER), 1)

    @jax.jit
    def dense_chain(ss_, ro_, rd_, tmin_, tmax_):
        ox, oy, oz = ro_[:, 0], ro_[:, 1], ro_[:, 2]
        dx, dy, dz = rd_[:, 0], rd_[:, 1], rd_[:, 2]
        lo3 = (ox[:, None], oy[:, None], oz[:, None])
        ld3 = (dx[:, None], dy[:, None], dz[:, None])
        st = dict(t=tmax_.astype(jnp.float32),
                  hit_inst=jnp.full((BLOCK,), -1, jnp.int32),
                  hit_prim=jnp.full((BLOCK,), -1, jnp.int32))
        active = jnp.ones((BLOCK,), bool)

        def body(k, st):
            return stream_mod._dense_test(
                ss_, st, k % C, jnp.int32(0), lo3, ld3, active,
                tmin_[:, None], lane)

        return jax.lax.fori_loop(0, K, body, st)

    def run_dense():
        out = dense_chain(ss, ro, rd, tmin, tmax)
        assert int(out["hit_prim"][0]) >= -1
    t_dense = timeit(f"dense test (128 prims)", run_dense, inner=K)

    # 2b. discriminate WHERE the dense test's time goes: pure
    # Moller-Trumbore planes math (no ctype switch, no winner fold)...
    @jax.jit
    def tri_math_chain(ss_, ro_, rd_, tmin_, tmax_):
        ox, oy, oz = ro_[:, 0], ro_[:, 1], ro_[:, 2]
        dx, dy, dz = rd_[:, 0], rd_[:, 1], rd_[:, 2]
        lo3 = (ox[:, None], oy[:, None], oz[:, None])
        ld3 = (dx[:, None], dy[:, None], dz[:, None])

        def body(k, acc):
            c = k % C
            h, t = stream_mod._tri_planes(
                lo3[0] + acc * jnp.float32(1e-30), lo3[1], lo3[2],
                ld3[0], ld3[1], ld3[2], tmin_[:, None], tmax_[:, None],
                ss_.v0x[c], ss_.v0y[c], ss_.v0z[c],
                ss_.v1x[c], ss_.v1y[c], ss_.v1z[c],
                ss_.v2x[c], ss_.v2y[c], ss_.v2z[c])
            return acc + jnp.min(jnp.where(h, t, jnp.float32(0.0)))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def run_trimath():
        assert np.isfinite(float(tri_math_chain(ss, ro, rd, tmin, tmax)))
    t_trimath = timeit("tri planes math only", run_trimath, inner=K)

    # ...and the winner fold alone on a constant (N, 128) t grid
    @jax.jit
    def fold_chain(ss_, tmin_, tmax_):
        st = dict(t=tmax_.astype(jnp.float32),
                  hit_inst=jnp.full((BLOCK,), -1, jnp.int32),
                  hit_prim=jnp.full((BLOCK,), -1, jnp.int32))
        tgrid = jnp.broadcast_to(tmax_[:, None],
                                 (BLOCK, stream_mod.CLUSTER))
        lane2 = jax.lax.broadcasted_iota(
            jnp.int32, (1, stream_mod.CLUSTER), 1)

        def body(k, st):
            gid = ss_.gid[k % C]
            hit = tgrid + st["t"][:, None] > 0
            t = tgrid
            t_min = jnp.min(t, axis=1)
            is_win = hit & (t == t_min[:, None])
            kk = jnp.max(jnp.where(is_win, lane2, -1), axis=1)
            prim_k = jnp.sum(jnp.where(lane2 == kk[:, None], gid[None], 0),
                             axis=1)
            accept = (kk >= 0) & (t_min <= st["t"])
            return dict(t=jnp.where(accept, t_min, st["t"]),
                        hit_inst=st["hit_inst"],
                        hit_prim=jnp.where(accept, prim_k,
                                           st["hit_prim"]))

        return jax.lax.fori_loop(0, K, body, st)

    def run_fold():
        out = fold_chain(ss, tmin, tmax)
        assert int(out["hit_prim"][0]) >= -1
    t_fold = timeit("winner fold only", run_fold, inner=K)

    # 2c. the dense test WITHOUT lax.switch: the mixed-style masked
    # select as the unconditional body (bit-exact for every ctype)
    @jax.jit
    def dense_noswitch_chain(ss_, ro_, rd_, tmin_, tmax_):
        ox, oy, oz = ro_[:, 0], ro_[:, 1], ro_[:, 2]
        dx, dy, dz = rd_[:, 0], rd_[:, 1], rd_[:, 2]
        lo3 = (ox[:, None], oy[:, None], oz[:, None])
        ld3 = (dx[:, None], dy[:, None], dz[:, None])
        st = dict(t=tmax_.astype(jnp.float32),
                  hit_inst=jnp.full((BLOCK,), -1, jnp.int32),
                  hit_prim=jnp.full((BLOCK,), -1, jnp.int32))
        active = jnp.ones((BLOCK,), bool)
        lane2 = jax.lax.broadcasted_iota(
            jnp.int32, (1, stream_mod.CLUSTER), 1)

        def body(k, st):
            c = k % C
            lox, loy, loz = lo3
            ldx, ldy, ldz = ld3
            v0x, v0y, v0z = ss_.v0x[c], ss_.v0y[c], ss_.v0z[c]
            v1x, v1y, v1z = ss_.v1x[c], ss_.v1y[c], ss_.v1z[c]
            v2x, v2y, v2z = ss_.v2x[c], ss_.v2y[c], ss_.v2z[c]
            r0, r1 = ss_.r0[c], ss_.r1[c]
            ty = ss_.ptype[c]
            gid = ss_.gid[c]
            tb = st["t"][:, None]
            th_, tt = stream_mod._tri_planes(
                lox, loy, loz, ldx, ldy, ldz, tmin_[:, None], tb,
                v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z)
            ph, pt = stream_mod._point_planes(
                lox, loy, loz, ldx, ldy, ldz, tmin_[:, None], tb,
                v0x, v0y, v0z, r0)
            h = jnp.where(ty == 2, th_, jnp.where(ty == 0, ph, False))
            t = jnp.where(ty == 2, tt, pt)
            hit = h & active[:, None]
            t = jnp.where(hit, t, FLT_MAX)
            t_min = jnp.min(t, axis=1)
            is_win = hit & (t == t_min[:, None])
            kk = jnp.max(jnp.where(is_win, lane2, -1), axis=1)
            prim_k = jnp.sum(jnp.where(lane2 == kk[:, None], gid[None], 0),
                             axis=1)
            accept = (kk >= 0) & (t_min <= st["t"])
            return dict(t=jnp.where(accept, t_min, st["t"]),
                        hit_inst=st["hit_inst"],
                        hit_prim=jnp.where(accept, prim_k,
                                           st["hit_prim"]))

        return jax.lax.fori_loop(0, K, body, st)

    def run_noswitch():
        out = dense_noswitch_chain(ss, ro, rd, tmin, tmax)
        assert int(out["hit_prim"][0]) >= -1
    t_noswitch = timeit("dense test, NO switch (tri+point)",
                        run_noswitch, inner=K)

    # 3. per-instance cluster-mask pass + compaction (the expand
    # prelude), R sequential repetitions
    R_MCL = 32

    @jax.jit
    def mcl_pass(ss_, ro_, rd_, tmin_, tmax_):
        ox, oy, oz = ro_[:, 0], ro_[:, 1], ro_[:, 2]
        dx, dy, dz = rd_[:, 0], rd_[:, 1], rd_[:, 2]

        def body(i, acc):
            lo3, ld3, il3 = stream_mod._local_ray_planes(
                ss_.inst_axes[0], ss_.inst_o[0],
                ox + acc * jnp.float32(1e-30), oy, oz, dx, dy, dz)
            m_cl = stream_mod._bbox_hit(
                lo3[0][:, None], lo3[1][:, None], lo3[2][:, None],
                il3[0][:, None], il3[1][:, None], il3[2][:, None],
                tmin_[:, None], tmax_[:, None],
                (ss_.cb_min[None, :, 0], ss_.cb_min[None, :, 1],
                 ss_.cb_min[None, :, 2]),
                (ss_.cb_max[None, :, 0], ss_.cb_max[None, :, 1],
                 ss_.cb_max[None, :, 2]))
            csurv = jnp.any(m_cl, axis=0)
            work = jnp.nonzero(csurv, size=C, fill_value=0)[0]
            return acc + (jnp.sum(work) + jnp.sum(
                csurv.astype(jnp.int32))).astype(jnp.float32)

        return jax.lax.fori_loop(0, R_MCL, body, jnp.float32(0.0))

    def run_mcl():
        assert float(mcl_pass(ss, ro, rd, tmin, tmax)) >= 0
    t_mcl = timeit("m_cl pass + transform + nonzero", run_mcl,
                   inner=R_MCL)

    # 4. bare region cost at this state size: R nearly-empty fori steps
    R = 1024

    @jax.jit
    def region_loop(t0):
        def body(i, st):
            return dict(t=st["t"] + jnp.float32(1e-30),
                        hit_inst=st["hit_inst"],
                        hit_prim=st["hit_prim"])
        st = dict(t=t0, hit_inst=jnp.full((BLOCK,), -1, jnp.int32),
                  hit_prim=jnp.full((BLOCK,), -1, jnp.int32))
        return jax.lax.fori_loop(0, R, body, st)

    def run_region():
        out = region_loop(tmax)
        assert float(out["t"][0]) > 0
    t_region = timeit("near-empty fori region", run_region, inner=R)

    print(f"\nbare dispatch floor: {t_disp*1e3:.1f} ms (subtracted by "
          f"the inner-loop division above)")
    print(f"per-block nearest cost: {t_block*1e3:.3f} ms -> frame "
          f"model {nb} x = {nb*t_block:.3f} s "
          f"(shade_bound measured the whole intersect stage at 0.558 s)")
    print(f"per-dense-test: {t_dense*1e6:.1f} us "
          f"(r2 measured 2.4 us per 2048x128 sub-tile x 16 = 38 us "
          f"expected at {BLOCK} rays)")
    print(f"  of which tri math {t_trimath*1e6:.1f} us, "
          f"winner fold {t_fold*1e6:.1f} us")
    print(f"per-expand prelude (m_cl+nonzero): {t_mcl*1e6:.1f} us")
    print(f"per-region sequencer: {t_region*1e6:.2f} us @ {BLOCK} rays "
          f"of 3-array state")


if __name__ == "__main__":
    main()
