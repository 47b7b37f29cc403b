"""Time the fused whole-frame render: device compute vs host wall-clock.

Separates (a) device execution of the one-dispatch frame, (b) d2h of the
result buffer, (c) total bench-equivalent wall time. Run on the real chip.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
CHUNK = 1 << 14


def main():
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    spp = SAMPLES * SAMPLES
    npix = width * height
    n_chunks = -(-npix // CHUNK)
    amb = jnp.asarray([0.1] * 3, jnp.float32)

    kw = dict(chunk_pixels=CHUNK, n_chunks=n_chunks, spp=spp,
              max_depth=4, max_stack=meta.max_stack, stream=stream,
              has_kd_textures=meta.has_kd_textures,
              has_ks_textures=meta.has_ks_textures)

    # warmup/compile
    sums = renderer._render_chunks_fused(dscene, amb, width, height,
                                         SAMPLES, **kw)
    jax.block_until_ready(sums)

    # (a) device execution only
    for _ in range(2):
        t0 = time.perf_counter()
        sums = renderer._render_chunks_fused(dscene, amb, width, height,
                                             SAMPLES, **kw)
        jax.block_until_ready(sums)
        t_dev = time.perf_counter() - t0
        print(f"device exec + sync: {t_dev*1e3:.1f} ms", flush=True)

    # (b) d2h
    t0 = time.perf_counter()
    arr = np.asarray(sums)
    t_d2h = time.perf_counter() - t0
    print(f"d2h {arr.nbytes/1e6:.1f} MB: {t_d2h*1e3:.1f} ms", flush=True)

    # (c) bench-equivalent (render_image path)
    t0 = time.perf_counter()
    img = renderer.render_image(dscene, meta, width, height, SAMPLES,
                                ambient=0.1, max_depth=4,
                                chunk_pixels=CHUNK, stream=stream)
    t_all = time.perf_counter() - t0
    rays = npix * spp
    print(f"render_image: {t_all*1e3:.1f} ms -> {rays/t_all/1e6:.2f} Mrays/s",
          flush=True)
    assert img.shape == (height, width, 4)
    return 0


if __name__ == "__main__":
    sys.exit(main())
