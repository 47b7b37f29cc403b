"""Sweep stream-scan knobs on the real chip; metric = fused whole-frame
device exec time on the refl bench config (the controllable part of bench
wall-clock; d2h rides the tunnel and is measured separately).

Usage: python scripts/sweep_stream.py [configs...]
  config = BLOCK_RAYS[:UNROLL][:scan], e.g. 2048 2048:1 4096:8
  (UNROLL defaults to 1; the optional ':scan' suffix disables the tile
  permutation so the block covers scanline-order pixels)
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
CHUNK = 1 << 14


def clear_caches():
    for fn in (stream_mod.intersect_stream, stream_mod._intersect_block,
               renderer.trace_rays, renderer._render_chunk,
               renderer._render_chunks_fused):
        fn._clear_cache()


def main():
    cfgs = sys.argv[1:] or ["2048:1", "2048:4", "2048:8", "4096:1", "8192:1"]
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
    rays = npix * spp

    for cfg in cfgs:
        parts = cfg.split(":")
        br = int(parts[0])
        # UNROLL defaults to 1; ':scan' may appear with or without it
        # (e.g. '2048', '2048:4', '2048:scan', '2048:4:scan')
        un = (int(parts[1])
              if len(parts) > 1 and parts[1] != "scan" else 1)
        tiled = "scan" not in parts[1:]
        stream_mod.BLOCK_RAYS = br
        stream_mod.UNROLL = un
        clear_caches()
        perm = (jnp.asarray(renderer.tile_permutation(width, height, spp, br))
                if tiled else None)
        for depth in (4,) if cfg != cfgs[0] else (4, 1):
            kw = dict(chunk_pixels=CHUNK, n_chunks=n_chunks, spp=spp,
                      max_depth=depth, max_stack=meta.max_stack,
                      stream=stream, perm=perm,
                      has_kd_textures=meta.has_kd_textures,
                      has_ks_textures=meta.has_ks_textures)
            sums = renderer._render_chunks_fused(dscene, amb, width, height,
                                                 SAMPLES, **kw)
            # 1-element pull: block_until_ready returns early over the
            # tunnel (observed r4: 0 ms readings); a scalar d2h is the
            # reliable completion barrier (4 bytes, sub-ms)
            assert float(sums[0, 0]) >= 0
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                sums = renderer._render_chunks_fused(
                    dscene, amb, width, height, SAMPLES, **kw)
                assert float(sums[0, 0]) >= 0
                best = min(best, time.perf_counter() - t0)
            print(f"BLOCK={br} UNROLL={un} tiled={tiled} depth={depth}: "
                  f"{best*1e3:.0f} ms -> {rays/best/1e6:.2f} Mrays/s "
                  f"(device)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
