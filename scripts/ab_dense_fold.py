"""Interleaved A/B: fused variadic-reduce dense test vs the legacy
switch + multi-reduction fold (YRT_DENSE_FOLD), refl depth-4 frame and
instance10000 quarter-frame.

The intersect ladder localized ~250 us/cluster-test of non-arithmetic
cost to the legacy fold's four (N, 128) reduction consumers (HBM-bound
intermediates); the fused path collapses winner selection into one
variadic lax.reduce so the intersection math fuses in. The fused kernel
contracts fma chains differently (up to ~64 ULP of t at grazing
incidence — the documented fusion class), so this A/B decides whether
the end-to-end win justifies re-scoping the stream oracle contract.

Compile-time flag, distinct executables via block_unroll spellings +
cache clears; interleaved execution rounds.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer

REFL = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
INST = ("/root/reference/in/instance10000_pointlight/"
        "instance10000_pointlight.obj")
CHUNK = 1 << 14


def clear_inner():
    for fn in (renderer.trace_rays, renderer._render_chunk,
               stream_mod.intersect_stream, stream_mod._intersect_block):
        fn._clear_cache()


def build(path):
    host = scene_lib.load_scene(path)
    dscene, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dscene, meta)
    ss = jax.tree_util.tree_map(jnp.asarray, ss)
    return scene_lib.to_jax(dscene), meta, ss, host


def frame_fn(dscene, meta, ss, width, height, samples, bu_spell):
    import bench

    return bench.make_frame_fn(dscene, meta, ss, width, height, samples,
                               max_depth=4, chunk=CHUNK,
                               block_unroll=bu_spell)


def main():
    r_scene = build(REFL)
    i_scene = build(INST)
    rw = renderer.image_width(r_scene[3].cameras[0].aspect, 512)
    iw = renderer.image_width(i_scene[3].cameras[0].aspect, 512)
    r_rays = rw * 512 * 16
    i_rays = iw * 512 * 64
    bu_r = stream_mod.effective_block_unroll(5)
    bu_i = stream_mod.effective_block_unroll(10004)

    fns = {}
    stream_mod._FUSED_DENSE = True
    fns["refl_fused"] = frame_fn(*r_scene[:3], rw, 512, 4, None)
    fns["inst_fused"] = frame_fn(*i_scene[:3], iw, 512, 8, None)
    for name in ("refl_fused", "inst_fused"):
        t0 = time.perf_counter(); fns[name]()
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    clear_inner()
    stream_mod._FUSED_DENSE = False
    fns["refl_legacy"] = frame_fn(*r_scene[:3], rw, 512, 4, bu_r)
    fns["inst_legacy"] = frame_fn(*i_scene[:3], iw, 512, 8, bu_i)
    for name in ("refl_legacy", "inst_legacy"):
        t0 = time.perf_counter(); fns[name]()
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    stream_mod._FUSED_DENSE = True

    results = {k: [] for k in fns}
    for r in range(3):
        order = list(fns)[r:] + list(fns)[:r]
        for name in order:
            t0 = time.perf_counter()
            fns[name]()
            dt = time.perf_counter() - t0
            results[name].append(dt)
            rays = r_rays if name.startswith("refl") else i_rays
            print(f"round {r} {name}: {dt:.2f}s "
                  f"({rays/dt/1e6:.3f} Mrays/s)", flush=True)

    print("\n== best-of summary ==")
    for name, v in results.items():
        rays = r_rays if name.startswith("refl") else i_rays
        print(f"{name:12s} best {min(v):7.2f}s  "
              f"{rays/min(v)/1e6:.3f} Mrays/s")


if __name__ == "__main__":
    main()
