"""Perf experiments for the stream intersector (not part of the package).

Times each suspect in isolation on the real chip so optimization targets
facts, not guesses.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer, camera as camera_mod

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
N = 1 << 18  # 262144 rays, one chunk at the bench setting


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, 512)
    height = 512

    C = stream.v0x.shape[0]
    I = stream.inst_id.shape[0]
    print(f"scene: {C} clusters, {I} instances", flush=True)

    ids = jnp.arange(N, dtype=jnp.int32)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)

    # 1. full chunk trace (bench inner loop)
    dt, _ = timeit(renderer.trace_rays, dscene, ids, amb, width=width,
                   height=height, samples=4, max_depth=4,
                   max_stack=meta.max_stack, stream=stream)
    print(f"trace_rays chunk ({N} rays, depth4): {dt*1e3:.1f} ms "
          f"-> {N/dt/1e6:.2f} Mrays/s end-to-end", flush=True)

    # primary rays for isolation tests
    _, uv = camera_mod.pixel_uv(width, height, 4, ids)
    ro, rd = camera_mod.eval_camera(dscene, uv)
    ro, rd = jax.block_until_ready((ro, rd))
    tmin = jnp.full((N,), 1e-4, jnp.float32)
    tmax = jnp.full((N,), 3.4028235e38, jnp.float32)

    # 2. nearest-hit intersect alone
    dt, hits = timeit(stream_mod.intersect_stream, stream, ro, rd, tmin,
                      tmax, any_hit=False)
    print(f"intersect_stream nearest ({N}): {dt*1e3:.1f} ms "
          f"-> {N/dt/1e6:.2f} Mrays/s", flush=True)

    # 3. any-hit (shadow-like)
    dt, _ = timeit(stream_mod.intersect_stream, stream, ro, rd, tmin,
                   tmax, any_hit=True)
    print(f"intersect_stream any_hit ({N}): {dt*1e3:.1f} ms", flush=True)

    # 4. block-size sweep on nearest
    for bs in (512, 1024, 2048, 4096, 8192):
        stream_mod.BLOCK_RAYS = bs
        stream_mod.intersect_stream._clear_cache()
        stream_mod._intersect_block._clear_cache()
        dt, _ = timeit(stream_mod.intersect_stream, stream, ro, rd, tmin,
                       tmax, any_hit=False)
        print(f"  BLOCK_RAYS={bs}: {dt*1e3:.1f} ms", flush=True)
    stream_mod.BLOCK_RAYS = 2048
    stream_mod.intersect_stream._clear_cache()
    stream_mod._intersect_block._clear_cache()

    # 6. how much does the scan skip? instrument survivor counts on block 0
    ro_b, rd_b = ro[:2048], rd[:2048]
    from yocto_raytracing_tpu.ops import stream as sm
    wdx, wdy, wdz = sm._normalize3(rd_b[:, 0], rd_b[:, 1], rd_b[:, 2])
    m_all = sm._bbox_hit(
        ro_b[:, 0:1], ro_b[:, 1:2], ro_b[:, 2:3],
        1 / wdx[:, None], 1 / wdy[:, None], 1 / wdz[:, None],
        tmin[:2048, None], tmax[:2048, None],
        (stream.inst_wb_min[None, :, 0], stream.inst_wb_min[None, :, 1],
         stream.inst_wb_min[None, :, 2]),
        (stream.inst_wb_max[None, :, 0], stream.inst_wb_max[None, :, 1],
         stream.inst_wb_max[None, :, 2]))
    print(f"block0 instance survivors: {int(jnp.any(m_all, 0).sum())}/{I}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
