"""Shade-stage decomposition + bound table (VERDICT r4 #2).

The r4 frame decomposition left the primary pass's ~0.55 s non-intersect
share (camera + eval_hit/shade gathers + spp reduce) unbounded. This
script measures it the way the dense-test stage was bounded:

**Ladder** (refl bench geometry 910x512 @ 16 spp, depth-1, lights
REMOVED from the scene — the variant-scene method of PERF.md r4 — all
compiled once in one process, then executed in interleaved rounds):

  full1       intersect + camera + eval_hit + ambient shade (kd texture)
              + spp reduce + u8 tonemap          [the 786 ms r4 row]
  notex       same, kd/ks texture sampling compiled out
  shadeconst  shade_step replaced by a constant  [intersect + camera +
              spp + tonemap]
  floor       shadeconst AND intersect replaced by a constant miss
              [camera + spp + tonemap + lax.map dispatch only]

  full1-notex        = texture gather+filter cost
  notex-shadeconst   = eval_hit + shade arithmetic + attribute gathers
  shadeconst-floor   = the intersect stage (cross-check vs the PERF.md
                       per-pass VPU bound table)
  floor              = camera + spp-reduce + tonemap + dispatch floor

**Micro bounds** measured in the same process: per-row gather cost at
the shade's table widths, the spp-reduction, and the camera stage — so
each ladder line gets an arithmetic/gather/HBM bound next to it.

**Lever A/B**: the r5 packed prim-row gather (render/shade.py,
YRT_SHADE_GATHER) vs the r4 four-gather path, fwd (full depth-4 prod
frame) and fwd+bwd (train_step, 1M-ray tile-ordered batch).

Monkeypatches select variants at COMPILE time only; distinct jit cache
entries are forced by static-arg spellings (block_unroll None vs the
equal explicit tuple) — execution rounds then interleave fixed
executables, so tunnel/thermal drift hits every config equally.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.parallel import mesh as mesh_mod
from yocto_raytracing_tpu.render import renderer
from yocto_raytracing_tpu.render import shade as shade_mod

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
CHUNK = 1 << 14
FLT_MAX = np.float32(3.4028235e38)


def shade_const(scene, ro, rd, hits, amb, active, occluder,
                has_kd_textures=True, has_ks_textures=True,
                light_pos=None):
    """Constant-shade stand-in: same signature/shapes, ~zero compute."""
    mask = active & hits["hit"]
    color = jnp.where(mask[:, None], jnp.float32(0.25), 0.0) * jnp.ones(
        (1, 3), jnp.float32)
    zeros = jnp.zeros_like(ro)
    return color, zeros, zeros, jnp.ones_like(ro), mask


def miss_isect(stream, ro, rd, tmin, tmax, any_hit=False, **kw):
    """Constant-miss stand-in for intersect_stream."""
    n = ro.shape[0]
    return dict(hit=jnp.zeros((n,), bool),
                inst=jnp.full((n,), -1, jnp.int32),
                prim=jnp.full((n,), -1, jnp.int32),
                t=tmax.astype(jnp.float32))


def main():
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    # lights-removed variant scene (empty light tables change leaf
    # shapes, giving the ladder its own executables)
    nolight = dataclasses.replace(
        dscene,
        light_pos=jnp.zeros((0, 3), jnp.float32),
        light_axes=jnp.zeros((0, 3, 3), jnp.float32),
        light_o=jnp.zeros((0, 3), jnp.float32),
        light_ke=jnp.zeros((0, 3), jnp.float32))
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    spp = SAMPLES * SAMPLES
    npix = width * height
    rays = npix * spp
    n_chunks = -(-npix // CHUNK)
    amb = jnp.asarray([0.1] * 3, jnp.float32)
    bu = stream_mod.effective_block_unroll(stream.inst_wb_min.shape[0])
    _, perm = renderer._tile_perm_cached(width, height, spp, bu[0])

    import bench

    def frame_fn(scene, depth, tex, bu_spell):
        return bench.make_frame_fn(
            scene, meta, stream, width, height, SAMPLES, max_depth=depth,
            chunk=CHUNK, block_unroll=bu_spell, has_kd_textures=tex,
            has_ks_textures=tex)

    def clear_inner():
        # monkeypatched variants must NOT inline a stale cached
        # trace_rays jaxpr into their outer trace; already-compiled
        # outer executables are unaffected (they no longer consult
        # these caches)
        for fn in (renderer.trace_rays, renderer._render_chunk):
            fn._clear_cache()

    # --- compile the ladder (monkeypatch matters only at compile) ---
    real_shade = shade_mod.shade_step
    ladder = {}
    ladder["full1"] = frame_fn(nolight, 1, True, None)
    ladder["notex"] = frame_fn(nolight, 1, False, None)
    ladder["shadeconst"] = frame_fn(nolight, 1, True, bu)
    ladder["floor"] = frame_fn(nolight, 1, False, bu)
    for name in ("full1", "notex"):
        t0 = time.perf_counter()
        ladder[name]()
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    clear_inner()
    renderer.shade_mod.shade_step = shade_const
    t0 = time.perf_counter(); ladder["shadeconst"]()
    print(f"compile shadeconst: {time.perf_counter()-t0:.1f}s", flush=True)
    # the intersector is reached via ops.stream.intersect_stream inside
    # trace_rays -> patch the module attr
    clear_inner()
    smod_real = stream_mod.intersect_stream
    stream_mod.intersect_stream = miss_isect
    t0 = time.perf_counter(); ladder["floor"]()
    print(f"compile floor: {time.perf_counter()-t0:.1f}s", flush=True)
    stream_mod.intersect_stream = smod_real
    renderer.shade_mod.shade_step = real_shade
    clear_inner()

    # --- lever A/B: packed vs legacy gathers, depth-4 prod frame ---
    prod = {}
    prod["prod_packed"] = frame_fn(dscene, 4, True, None)
    shade_mod._PACKED_PRIM_GATHER = True
    t0 = time.perf_counter(); prod["prod_packed"]()
    print(f"compile prod_packed: {time.perf_counter()-t0:.1f}s", flush=True)
    clear_inner()
    shade_mod._PACKED_PRIM_GATHER = False
    prod["prod_legacy"] = frame_fn(dscene, 4, True, bu)
    t0 = time.perf_counter(); prod["prod_legacy"]()
    print(f"compile prod_legacy: {time.perf_counter()-t0:.1f}s", flush=True)
    shade_mod._PACKED_PRIM_GATHER = True
    clear_inner()

    # fwd+bwd lever A/B: fresh jit wrappers over train_step's body
    n_train = 1 << 20
    perm_np, _ = renderer._tile_perm_cached(width, height, spp, bu[0])
    ids = jnp.asarray((perm_np[: n_train // spp].astype(np.int64)[:, None]
                       * spp + np.arange(spp)[None, :])
                      .reshape(-1).astype(np.int32))
    target = jnp.zeros((n_train, 3), jnp.float32)

    def make_train(packed):
        shade_mod._PACKED_PRIM_GATHER = packed
        clear_inner()
        fn = jax.jit(partial(
            mesh_mod.train_step.__wrapped__, width=width, height=height,
            samples=SAMPLES, max_depth=4, max_stack=meta.max_stack,
            stream=stream))

        def step():
            _, loss = fn(dscene, ids, target, amb, jnp.float32(0.0))
            assert np.isfinite(float(loss))
        t0 = time.perf_counter(); step()
        print(f"compile train packed={packed}: "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        return step

    train = {"train_packed": make_train(True),
             "train_legacy": make_train(False)}
    shade_mod._PACKED_PRIM_GATHER = True

    # --- interleaved rounds ---
    all_fns = {**ladder, **prod, **train}
    results = {k: [] for k in all_fns}
    names = list(all_fns)
    for r in range(3):
        order = names[r:] + names[:r]
        for name in order:
            t0 = time.perf_counter()
            all_fns[name]()
            results[name].append(time.perf_counter() - t0)
            print(f"round {r} {name}: {results[name][-1]:.3f}s", flush=True)

    best = {k: min(v) for k, v in results.items()}
    print("\n== ladder (depth-1, no lights; best-of-3 device-synced) ==")
    for k in ("full1", "notex", "shadeconst", "floor"):
        print(f"{k:11s} {best[k]:7.3f}s")
    print(f"texture sampling       : {best['full1']-best['notex']:7.3f}s")
    print(f"eval_hit+shade (no tex): {best['notex']-best['shadeconst']:7.3f}s")
    print(f"intersect stage        : {best['shadeconst']-best['floor']:7.3f}s")
    print(f"camera+spp+tonemap+disp: {best['floor']:7.3f}s")

    print("\n== lever A/B: packed vs legacy prim gathers ==")
    for k in ("prod_packed", "prod_legacy"):
        print(f"{k:12s} {best[k]:7.3f}s  "
              f"{rays / best[k] / 1e6:.3f} Mrays/s (depth-4 frame)")
    for k in ("train_packed", "train_legacy"):
        print(f"{k:12s} {best[k]:7.3f}s  "
              f"{n_train / best[k] / 1e6:.3f} Mrays/s (fwd+bwd step)")

    # --- micro bounds ---
    print("\n== micro bounds (same process) ==")
    nmicro = 1 << 22
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, 14000, nmicro).astype(np.int32))
    for w in (4, 8, 14, 16, 25):
        tab = jnp.ones((14016, w), jnp.float32)
        g = jax.jit(lambda t, i: t[i].sum(axis=1))
        g(tab, idx).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            float(g(tab, idx)[0])
        dt = (time.perf_counter() - t0) / 5
        print(f"row gather (N={nmicro>>20}M, width {w:2d}): {dt*1e3:7.2f} ms "
              f"= {dt/nmicro*1e9:.2f} ns/row")
    x = jnp.ones((nmicro, 3), jnp.float32)
    red = jax.jit(lambda x: x.reshape(-1, spp, 3).sum(axis=1))
    red(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        float(red(x)[0, 0])
    dt = (time.perf_counter() - t0) / 5
    print(f"spp-reduce ({nmicro>>20}M rays x {spp}spp): {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
