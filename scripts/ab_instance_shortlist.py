"""Interleaved same-process A/B: hierarchical vs flat instance shortlist
on instance10000 (the r4 verdict's top perf lever).

Configs (quarter-frame: 910x512 @ 64 spp at the 1024p camera, device-only
seconds via a 4-byte completion pull):
  flat8k   — r4 production: flat (N, I) shortlist, BLOCK=8192/UNROLL=4
             (the (N, I) mask budget forced this block size)
  hier8k   — r5 hierarchical shortlist at the SAME block config
             (isolates the shortlist's own slab-work saving)
  hier32k  — r5 production: hierarchical + BLOCK=32768/UNROLL=1 (the
             full-size block the smaller mask re-admits)
  hier32k4 — hierarchical + BLOCK=32768/UNROLL=4 (unroll check)

Interleaved rounds (config order cycled per round) so tunnel/thermal
drift hits every config equally — the only trustworthy comparison on
this hour-variant chip (PERF.md).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer

SCENE = ("/root/reference/in/instance10000_pointlight/"
         "instance10000_pointlight.obj")
RES = 512
SAMPLES = 8
CHUNK = 1 << 14


def main():
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dscene, meta)
    ss = jax.tree_util.tree_map(jnp.asarray, ss)
    ss_flat = dataclasses.replace(ss, grp_wb_min=None, grp_wb_max=None)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    spp = SAMPLES * SAMPLES
    npix = width * height
    n_chunks = -(-npix // CHUNK)
    amb = jnp.asarray([0.1] * 3, jnp.float32)
    rays = npix * spp

    cfgs = [
        ("flat8k", ss_flat, 8192, 4),
        ("hier8k", ss, 8192, 4),
        ("hier32k", ss, 32768, 1),
        ("hier32k4", ss, 32768, 4),
    ]
    # argv override: name=hier|flat:BLOCK:UNROLL, e.g. hier:16384:4
    if _sys.argv[1:]:
        cfgs = []
        for a in _sys.argv[1:]:
            kind, blk, unr = a.split(":")
            cfgs.append((a, ss if kind == "hier" else ss_flat,
                         int(blk), int(unr)))

    import bench

    frames = {}
    for name, stream, block, unroll in cfgs:
        frames[name] = bench.make_frame_fn(
            dscene, meta, stream, width, height, SAMPLES,
            max_depth=4, chunk=CHUNK, block_unroll=(block, unroll))

    # compile all (separate executables per (treedef, block) — kept hot;
    # do NOT clear caches between rounds)
    for name, *_ in cfgs:
        t0 = time.perf_counter()
        frames[name]()
        print(f"compile+first {name}: {time.perf_counter() - t0:.1f}s",
              flush=True)

    results = {name: [] for name, *_ in cfgs}
    ROUNDS = 3
    for r in range(ROUNDS):
        order = [cfgs[(i + r) % len(cfgs)][0] for i in range(len(cfgs))]
        for name in order:
            t0 = time.perf_counter()
            frames[name]()
            dt = time.perf_counter() - t0
            results[name].append(dt)
            print(f"round {r} {name}: {dt:.2f}s "
                  f"({rays / dt / 1e6:.3f} Mrays/s)", flush=True)

    print("\n== best-of summary (device-synced wall, quarter-frame) ==")
    for name, *_ in cfgs:
        best = min(results[name])
        print(f"{name:9s} best {best:6.2f}s  {rays / best / 1e6:.3f} "
              f"Mrays/s  all={[round(x, 2) for x in results[name]]}")


if __name__ == "__main__":
    main()
