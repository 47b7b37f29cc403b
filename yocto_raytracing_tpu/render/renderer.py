"""Wavefront megabatch renderer.

The reference's per-pixel recursive loop (raytrace.cpp:213-254) becomes:

* flat ray ids -> stratified camera rays (samples^2 deterministic grid,
  raytrace.cpp:232-239);
* a static-depth wavefront loop: intersect the whole batch, shade, spawn
  mirror-reflection rays with multiplicative ``kr`` throughput — the
  iterative equivalent of the unbounded shade() recursion
  (raytrace.cpp:187-204), capped at ``max_depth`` (contributions decay as
  ``kr^depth``; depth 8 is below u8 quantization for every scene);
* per-pixel sample sums divided by samples^2, alpha forced to 1
  (raytrace.cpp:244-249).

Rays are processed in fixed-size pixel chunks so arbitrarily large renders
compile once and stream through the device.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import traverse
from . import camera as camera_mod
from . import shade as shade_mod

RAY_EPS = np.float32(1e-4)
FLT_MAX = np.float32(3.4028235e38)


def image_width(aspect: float, resolution: int) -> int:
    """round(aspect * resolution), C++ std::round half-away-from-zero
    (raytrace.cpp:216)."""
    return int(math.floor(aspect * resolution + 0.5))


def tile_permutation(width: int, height: int, spp: int,
                     block_rays: int) -> np.ndarray:
    """Pixel visit order that makes each intersector ray block a compact
    screen tile.

    The stream intersector culls per block of ``block_rays`` consecutive
    rays (ops/stream.py): a block's cluster worklist is the UNION over its
    rays, so a block covering a long scanline strip (the natural pixel
    order) intersects far more clusters than the same pixel count as a
    square-ish tile. This permutation orders pixels so each block =
    ``block_rays // spp`` pixels forms a near-square tile. Per-ray results
    are unchanged by construction (culling never changes results, only
    skips work — ops/stream.py module invariant), so renders stay
    bit-identical to scanline order; only wall-clock drops (measured
    1.9 -> 4.4 Mrays/s device-side on the refl bench, r2).

    Tile aspect (r4 A/B at the 32768-ray block = 2048-px tiles): 32x64
    beats 16x128 by 8% device-side and 64x32/128x16 regress — so the
    width is the power of two nearest sqrt(tile_px), clamped to [16, 64]
    (16 keeps the measured r3 optimum for the small tiles of
    instance-capped blocks; wider than 64 loses).

    Returns perm (npix,) i32: perm[k] = flat pixel id of the k-th pixel in
    tile order.
    """
    tile_px = max(1, block_rays // max(1, spp))
    tw = 1 << int(round(math.log2(max(1, math.isqrt(tile_px)))))
    tw = max(min(64, tw, tile_px), min(16, tile_px))
    th = max(1, tile_px // tw)
    ys, xs = np.mgrid[0:height, 0:width]
    ntx = (width + tw - 1) // tw
    tile_id = (ys // th) * ntx + (xs // tw)
    within = (ys % th) * tw + (xs % tw)
    order = np.lexsort((within.ravel(), tile_id.ravel()))
    return order.astype(np.int32)


@partial(jax.jit, inline=True,
         static_argnames=("spp", "max_depth", "max_stack",
                          "has_kd_textures", "has_ks_textures",
                          "stochastic", "block_unroll"))
def _render_chunk(scene, ids, ambient, width, height, samples, spp,
                  max_depth, max_stack, stream=None,
                  has_kd_textures=True, has_ks_textures=True,
                  stochastic=False, rng_key=None, light_sampler=None,
                  block_unroll=None):
    """trace_rays + on-device per-pixel spp sum.

    Returns (chunk_pixels, 3) pixel sums instead of (chunk_rays, 3) per-ray
    radiance: spp-times less device->host traffic per chunk (a
    tunnel-attached TPU moves d2h at ~25 MB/s, so transfer size — not
    dispatch count — is the host-side render bottleneck).

    ``spp`` is static for the reshape; width/height/samples stay traced
    runtime values (see camera.pixel_uv: divide-by-literal parity).
    """
    rgb = trace_rays(scene, ids, ambient, width=width, height=height,
                     samples=samples, max_depth=max_depth,
                     max_stack=max_stack, stream=stream,
                     has_kd_textures=has_kd_textures,
                     has_ks_textures=has_ks_textures,
                     stochastic=stochastic, rng_key=rng_key,
                     light_sampler=light_sampler,
                     block_unroll=block_unroll)
    return rgb.reshape(-1, spp, 3).sum(axis=1)


@partial(jax.jit, static_argnames=("chunk_pixels", "n_chunks", "spp",
                                   "max_depth", "max_stack",
                                   "has_kd_textures", "has_ks_textures",
                                   "ldr", "stochastic", "block_unroll"))
def _render_chunks_fused(scene, ambient, width, height, samples,
                         chunk_pixels, n_chunks, spp, max_depth, max_stack,
                         stream=None, has_kd_textures=True,
                         has_ks_textures=True, perm=None,
                         chunk_offset=0, ldr=False,
                         stochastic=False, rng_key=None,
                         light_sampler=None, block_unroll=None):
    """Whole-frame render in ONE dispatch: ``lax.map`` over chunk starts,
    ray ids generated on device.

    Over a tunnel-attached TPU each per-chunk dispatch pays an RPC round
    trip plus a 1 MB ray-id h2d upload; at the bench setting that overhead
    was ~2/3 of wall-clock (profile_stream.py, r3). Here the host sends
    only scalars and receives one (n_chunks*chunk_pixels, 3) buffer.
    Tail lanes (ids past the last pixel) render a clamped duplicate pixel
    that the caller slices off.

    ``perm`` (npix,) i32 reorders the pixel VISIT order (tile_permutation)
    so each intersector block culls over a compact screen tile; row k of
    the result is then pixel perm[k] and the caller scatters. Per-pixel
    values are unchanged (the spp sum stays within-pixel in the same
    order; culling cannot change per-ray results).

    Contract vs the chunked path: same f32 ops in the same order, but XLA
    may contract a*b+c into fma() differently across the lax.map fusion
    boundary — measured <= ~1.4e-6 absolute on TPU (ULP-level on spp sums,
    bit-equal on CPU; invisible after u8 tonemap). Checkpointed renders
    therefore always take the chunked path, so truncate-and-resume stays
    BIT-identical within that mode (tests/test_cli.py).
    """
    # lax.iota, NOT jnp.arange: arange materializes a trace-time CONSTANT
    # that lowering hoists into an executable input; jax 0.9 then loses
    # track of such hoisted consts once several entries coexist and later
    # calls die with "Execution supplied 46 buffers but compiled program
    # expected 49". iota is a traced device op — nothing to hoist.
    lane = jax.lax.iota(jnp.int32, chunk_pixels * spp)
    npix_last = jnp.int32(width * height - 1)

    def one_chunk(c):
        g = (chunk_offset + c) * (chunk_pixels * spp) + lane
        k = jnp.minimum(g // spp, npix_last)   # pixel slot in visit order
        pix = k if perm is None else perm[k]
        ids = pix * spp + g % spp
        return _render_chunk(
            scene, ids, ambient, width, height, samples, spp=spp,
            max_depth=max_depth, max_stack=max_stack, stream=stream,
            has_kd_textures=has_kd_textures, has_ks_textures=has_ks_textures,
            stochastic=stochastic, rng_key=rng_key,
            light_sampler=light_sampler, block_unroll=block_unroll)

    sums = jax.lax.map(one_chunk, jax.lax.iota(jnp.int32, n_chunks))
    sums = sums.reshape(-1, 3)
    if not ldr:
        return sums
    # device-side tonemap to PNG-ready u8 (exposure 0, filmic off, sRGB,
    # truncating cast — image.tonemap semantics, src/image.cpp:55-77):
    # 4x less d2h than f32 sums over the tunnel-attached chip
    rgb = sums / jnp.float32(spp)
    srgb = jnp.power(jnp.maximum(rgb, 0.0), jnp.float32(1 / 2.2))
    return (jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("max_depth", "max_stack",
                                   "differentiable", "has_kd_textures",
                                   "has_ks_textures", "stochastic",
                                   "remat", "block_unroll"))
def trace_rays(
    scene,
    ray_ids: jnp.ndarray,   # (N,) flat ray ids (pixel-major, spp-minor)
    ambient: jnp.ndarray,   # (3,)
    width: int,             # traced (see pixel_uv: exact-divide parity)
    height: int,
    samples: int,
    max_depth: int,
    max_stack: int,
    differentiable: bool = False,
    stream=None,            # ops.stream.StreamScene -> cluster-scan path
    has_kd_textures: bool = True,   # static shade specialization
    has_ks_textures: bool = True,   # (SceneMeta.has_*_textures)
    stochastic: bool = False,       # jittered AA + thin-lens DOF
    rng_key=None,                   # u32 seed (required if stochastic)
    light_sampler=None,             # render/lights.py tables -> area lights
    block_unroll=None,              # static (block, unroll) override for
                                    # the stream intersector (sweeps/A/Bs)
    remat: bool = True,             # checkpoint the differentiable depth
                                    # step: with the batch-dead cond-skip
                                    # it is the measured winner (2.04 vs
                                    # 1.69 Mrays/s fwd+bwd on the bench
                                    # config; GRADIENTS.md)
):
    """Radiance for a batch of primary rays. Returns (N, 3) linear RGB.

    Detached-traversal gradients: BVH traversal returns integer hit topology
    under ``stop_gradient``; all differentiable quantities (hit point,
    normal, shading) are recomputed from the gathered vertices in
    shade_step, so ``jax.grad`` flows to camera/geometry/material/light
    leaves while the discrete structure stays fixed. With
    ``differentiable=True`` the depth loop is a ``lax.scan`` (reverse-mode
    AD cannot transpose ``while_loop``); forward-only rendering keeps the
    early-exiting ``while_loop``.
    """
    if stochastic:
        # jittered AA + (aperture > 0) thin-lens DOF — the stochastic
        # render mode (SURVEY §7 design stance: "stateless counter-based
        # RNG where sampling is needed"); variates are keyed by ray id so
        # output is chunking/sharding-invariant (camera.per_ray_uniform)
        from ..ops import sampling as sampling_mod

        seed = jnp.asarray(rng_key, jnp.uint32)
        _, uv = camera_mod.pixel_uv_jittered(width, height, samples,
                                             ray_ids, seed)
        ruv = camera_mod.per_ray_uniform(seed ^ jnp.uint32(0x9E3779B9),
                                         ray_ids, 2)
        lens = sampling_mod.sample_disk(ruv)[:, :2]
        ro, rd = camera_mod.eval_camera_dof(scene, uv, lens)
    else:
        _, uv = camera_mod.pixel_uv(width, height, samples, ray_ids)
        ro, rd = camera_mod.eval_camera(scene, uv)
    n = ro.shape[0]

    def isect_fn(ro_, rd_, tmin_, tmax_, any_hit):
        if stream is not None:
            from ..ops import stream as stream_mod

            return stream_mod.intersect_stream(stream, ro_, rd_, tmin_,
                                               tmax_, any_hit=any_hit,
                                               block_unroll=block_unroll)
        return traverse.intersect_scene(scene, ro_, rd_, tmin_, tmax_,
                                        any_hit=any_hit,
                                        max_stack=max_stack)

    def occluder(p, d, tmin, tmax, mask):
        # stacked (L, N) shadow rays -> one flat any-hit traversal; the
        # boolean visibility result is detached (visibility gradients are
        # out of scope per the detached-traversal design)
        p, d, tmin, tmax = map(jax.lax.stop_gradient, (p, d, tmin, tmax))
        shape = p.shape[:-1]
        res = isect_fn(
            p.reshape(-1, 3), d.reshape(-1, 3), tmin.reshape(-1),
            jnp.where(mask, tmax, -FLT_MAX).reshape(-1), True)
        from jax.ad_checkpoint import checkpoint_name

        # tagged like the nearest-hit topology: under remat the shadow
        # scans must be SAVED, never replayed — untagged, the backward
        # re-ran them and remat lost 43% on instance10000 (GRADIENTS.md)
        vis = checkpoint_name(res["hit"], "hits")
        return vis.reshape(shape)

    tmin = jnp.full((n,), RAY_EPS)

    # optional area-light sampling (soft shadows): ONE shape-space sample
    # point per (light, ray) for the whole path, from the element CDFs the
    # reference builds and never uses (render/lights.py). Ray-id-keyed
    # variates keep it chunking/sharding-invariant; averages over spp.
    light_pos = None
    if light_sampler is not None:
        from . import lights as lights_mod

        lseed = (jnp.asarray(rng_key if rng_key is not None else 0,
                             jnp.uint32) ^ jnp.uint32(0x85EBCA6B))
        lruv = camera_mod.per_ray_uniform(lseed, ray_ids, 3)
        light_pos = lights_mod.sample_light_points(scene, light_sampler,
                                                   lruv)

    # depth loop: one compiled body regardless of max_depth, early exit when
    # every path has died (kr = 0 everywhere after bounce 1 for most
    # scenes) — the iterative form of shade()'s recursion
    # (raytrace.cpp:187-204) capped at max_depth
    def body(st):
        hits = isect_fn(
            jax.lax.stop_gradient(st["ro"]),
            jax.lax.stop_gradient(st["rd"]), tmin,
            jnp.where(st["active"], FLT_MAX, -FLT_MAX), False)
        hits = jax.lax.stop_gradient(hits)
        # named for the remat policy: the hit topology is SAVED across
        # the backward (never recompute the traversal), while shading
        # intermediates are rematerialized from it
        from jax.ad_checkpoint import checkpoint_name

        hits = {k: checkpoint_name(v, "hits") for k, v in hits.items()}
        color, kr, p, refl_dir, mask = shade_mod.shade_step(
            scene, st["ro"], st["rd"], hits, ambient, st["active"], occluder,
            has_kd_textures=has_kd_textures,
            has_ks_textures=has_ks_textures, light_pos=light_pos)
        acc = st["acc"] + st["thr"] * color
        cont = mask & jnp.any(kr > 0, axis=-1)
        thr = jnp.where(cont[:, None], st["thr"] * kr, st["thr"])
        # dead lanes: pin the next ray to a constant — their shading is
        # masked out anyway, and garbage coordinates would otherwise leak
        # infs/NaNs through the differentiable hit recompute
        p = jnp.where(cont[:, None], p, 0.0)
        refl_dir = jnp.where(cont[:, None], refl_dir, 1.0)
        return dict(ro=p, rd=refl_dir, acc=acc, thr=thr, active=cont)

    state = dict(
        ro=ro, rd=rd,
        acc=jnp.zeros((n, 3), jnp.float32),
        thr=jnp.ones((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
    )
    if differentiable:
        # remat the depth step: the scan body's forward saves per-bounce
        # residuals (hit recompute intermediates, texture quads, light
        # geometry — many (N,*) buffers x max_depth) that the backward
        # then re-reads from HBM; recomputing the bounce from its carry
        # costs VPU flops the TPU has to spare and drops the residual
        # traffic to the carry alone. The save_only_these_names policy
        # keeps the traversal outputs ("hits") as saved residuals so the
        # backward NEVER replays the intersect scan — only the shading
        # recompute. Measured on the fwd+bwd bench: see GRADIENTS.md.
        body_d = (jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names("hits"))
            if remat else body)

        # batch-dead early exit inside the scan: once NO lane is active
        # (on the refl bench depths 2-3 are globally dead — all mirror
        # paths terminate by bounce 2) the step is an identity, skipping
        # the intersect + shade entirely. Identical results to the
        # while_loop path by the same argument as its cond; lax.cond is
        # reverse-mode transposable so grads flow unchanged (dead steps
        # contribute identity cotangents). Measured: differentiable fwd
        # 101.5 -> 70.6 ms (= the while_loop fwd), train_step 1.38 ->
        # 2.04 Mrays/s with remat on the bench config (GRADIENTS.md).
        def scan_body(st, _):
            st2 = jax.lax.cond(jnp.any(st["active"]), body_d,
                               lambda s: s, st)
            return st2, None

        out, _ = jax.lax.scan(scan_body, state, None, length=max_depth)
    else:
        def cond(st):
            return (st["depth"] < max_depth) & jnp.any(st["active"])

        def wbody(st):
            st2 = body({k: v for k, v in st.items() if k != "depth"})
            st2["depth"] = st["depth"] + 1
            return st2

        out = jax.lax.while_loop(cond, wbody,
                                 dict(state, depth=jnp.int32(0)))
    return out["acc"]


def render_image(
    scene,
    meta,
    width: int,
    height: int,
    samples: int,
    ambient: float = 0.1,
    max_depth: int = 8,
    chunk_pixels: int = 1 << 15,
    checkpoint: str | None = None,
    stream=None,
    ldr: bool = False,
    stochastic: bool = False,
    seed: int = 0,
    light_sampler=None,
) -> np.ndarray:
    """Full-frame render -> (height, width, 4) f32 linear, alpha 1.

    ``stochastic=True``: jittered AA + thin-lens DOF (when the camera has
    aperture > 0) driven by stateless ``jax.random`` with ``seed`` —
    deterministic per seed, independent of chunking (trace_rays).

    ``ldr=True`` instead tonemaps ON DEVICE (exposure 0, sRGB — the PNG
    branch of save_hdr_or_ldr, src/image.cpp:81-89) and returns
    (height, width, 4) u8: the device->host transfer shrinks 4x, which
    matters on a tunnel-attached chip where d2h — not compute — can
    dominate frame time. Device pow() may differ from numpy pow() by ULPs,
    so a u8 value sitting exactly on a truncation boundary can differ by 1
    step from ``image.tonemap(render_image(...))`` (tests pin <= 1 step);
    golden-parity paths use ldr=False + host tonemap.

    ``checkpoint``: path of an accumulator snapshot written after every
    chunk; if it exists and matches this render's config, completed chunks
    are skipped on resume (the tile-grained elastic-recovery unit — the
    reference has none, a render runs to completion or not at all).
    """
    spp = samples * samples
    npix = width * height
    amb = jnp.asarray([ambient, ambient, ambient], jnp.float32)
    chunk_pixels = min(chunk_pixels, npix)

    # every knob that changes per-chunk pixel values must be in the key, or
    # a resume silently mixes chunks rendered under different sampling
    # modes (ambient is f32; its bit pattern keys exactly)
    cfg_key = np.asarray(
        [width, height, samples, max_depth, chunk_pixels,
         int(stochastic), seed, int(light_sampler is not None),
         int(np.float32(ambient).view(np.int32))], np.int64)

    if not checkpoint:
        # no per-chunk host sync: fused-dispatch path, pixels visited in
        # tile order so every intersector block culls a compact screen
        # tile (see tile_permutation). The frame is issued as a few
        # super-chunk dispatches so the d2h of one super-chunk overlaps
        # the device compute of the next (async dispatch queue).
        from ..ops import stream as stream_mod

        n_chunks = -(-npix // chunk_pixels)
        block = (stream_mod.effective_block_unroll(
                     stream.inst_wb_min.shape[0])[0]
                 if stream is not None else stream_mod.BLOCK_RAYS)
        perm_np, perm_dev = _tile_perm_cached(width, height, spp, block)
        n_super = min(4, n_chunks)
        per = -(-n_chunks // n_super)
        rng_key = (jnp.uint32(seed)
                   if (stochastic or light_sampler is not None) else None)
        # width/height/samples go in as ARRAYS, not Python ints: they must
        # stay runtime values (camera.pixel_uv divide-by-literal parity),
        # and jax 0.9's C++ jit fastpath drops Python-int args on a cache
        # hit when the entry was traced with `max_stack` etc. differing —
        # observed as "Execution supplied 46 buffers but compiled program
        # expected 49" on the second identical-shape render
        w_t = jnp.int32(width)
        h_t = jnp.int32(height)
        s_t = jnp.int32(samples)
        parts = []
        for si in range(0, n_chunks, per):
            parts.append(_render_chunks_fused(
                scene, amb, w_t, h_t, s_t,
                chunk_pixels=chunk_pixels, n_chunks=min(per, n_chunks - si),
                spp=spp, max_depth=max_depth, max_stack=meta.max_stack,
                stream=stream, has_kd_textures=meta.has_kd_textures,
                has_ks_textures=meta.has_ks_textures,
                perm=perm_dev, chunk_offset=jnp.int32(si), ldr=ldr,
                stochastic=stochastic, rng_key=rng_key,
                light_sampler=light_sampler))
        out = np.concatenate([np.asarray(p) for p in parts])[:npix]
        if ldr:
            img = np.full((npix, 4), 255, np.uint8)
            img[perm_np, :3] = out
            return img.reshape(height, width, 4)
        img = np.ones((npix, 4), np.float32)
        img[perm_np, :3] = out / np.float32(spp)
        return img.reshape(height, width, 4)

    out = np.empty((npix, 3), np.float32)
    resume_from = 0
    if checkpoint:
        import os

        if os.path.exists(checkpoint):
            snap = np.load(checkpoint)
            if (snap["key"].shape == cfg_key.shape
                    and (snap["key"] == cfg_key).all()):
                resume_from = int(snap["done"])
                out[:resume_from] = snap["acc"]

    for start in range(resume_from, npix, chunk_pixels):
        ids = (np.arange(start * spp, (start + chunk_pixels) * spp)
               .astype(np.int32))
        # tail chunk: same shape, excess lanes render garbage pixels that we
        # drop (keeps one compiled executable)
        ids = np.minimum(ids, npix * spp - 1)
        rgb = _render_chunk(
            scene, jnp.asarray(ids), amb, width, height, samples,
            spp=spp, max_depth=max_depth, max_stack=meta.max_stack,
            stream=stream, has_kd_textures=meta.has_kd_textures,
            has_ks_textures=meta.has_ks_textures, stochastic=stochastic,
            rng_key=(jnp.uint32(seed)
                     if (stochastic or light_sampler is not None)
                     else None),
            light_sampler=light_sampler)
        stop = min(start + chunk_pixels, npix)
        out[start:stop] = np.asarray(rgb)[: stop - start]
        if checkpoint:
            _atomic_savez(checkpoint, key=cfg_key, done=stop,
                          acc=out[:stop])

    img = np.ones((npix, 4), np.float32)
    img[:, :3] = out / np.float32(spp)
    img = img.reshape(height, width, 4)
    if ldr:  # checkpointed renders tonemap on host (bit-stable resume)
        from .. import image as image_mod

        return image_mod.tonemap(img)
    return img


_perm_cache: dict = {}


def _tile_perm_cached(width: int, height: int, spp: int, block_rays: int):
    """(host perm, device perm) for a render config, cached so repeated
    renders skip both the lexsort and the h2d upload (1.8 MB at 1024p
    rides a slow tunnel)."""
    key = (width, height, spp, block_rays)
    hit = _perm_cache.get(key)
    if hit is None:
        perm_np = tile_permutation(width, height, spp, block_rays)
        hit = (perm_np, jnp.asarray(perm_np))
        _perm_cache[key] = hit
    return hit


def _atomic_savez(path: str, **arrays) -> None:
    """Write-then-rename so a killed render never leaves a torn snapshot."""
    import os

    tmp = path + ".tmp.npz"  # .npz suffix stops np.savez renaming it
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def render_scene_file(
    path: str,
    resolution: int = 720,
    samples: int = 1,
    ambient: float = 0.1,
    camera: int = 0,
    max_depth: int = 8,
    chunk_pixels: int = 1 << 15,
    intersector: str = "stream",
    stochastic: bool = False,
    seed: int = 0,
    area_lights: bool = False,
):
    """Load + render, mirroring the reference main() (raytrace.cpp:256-287).

    ``intersector``: "stream" (cluster-scan fast path, the production
    default — the reference's one binary IS its fast path,
    raytrace.cpp:256-287) or "bvh" (threaded stackless traversal, kept as
    the bit-equal oracle; see ops/stream.py).
    Returns (hdr image (h, w, 4) f32, host scene, device scene, meta).
    """
    from .. import scene as scene_lib

    host = scene_lib.load_scene(path)
    dscene, meta = scene_lib.build_device_scene(host, camera=camera)
    light_sampler = None
    if area_lights:
        from . import lights as lights_mod

        light_sampler = lights_mod.build_light_sampler(host, dscene, meta)
    stream = None
    if intersector == "stream":
        from ..ops import stream as stream_mod

        stream = stream_mod.build_stream_scene(host, dscene, meta)
        stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[camera]
    width = image_width(cam.aspect, resolution)
    img = render_image(dscene, meta, width, resolution, samples,
                       ambient=ambient, max_depth=max_depth,
                       chunk_pixels=chunk_pixels, stream=stream,
                       stochastic=stochastic, seed=seed,
                       light_sampler=light_sampler)
    return img, host, dscene, meta
