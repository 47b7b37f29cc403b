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

RAY_EPS = jnp.float32(1e-4)
FLT_MAX = jnp.float32(3.4028235e38)


def image_width(aspect: float, resolution: int) -> int:
    """round(aspect * resolution), C++ std::round half-away-from-zero
    (raytrace.cpp:216)."""
    return int(math.floor(aspect * resolution + 0.5))


@partial(jax.jit, static_argnames=("width", "height", "samples", "max_depth",
                                   "max_stack"))
def trace_rays(
    scene,
    ray_ids: jnp.ndarray,   # (N,) flat ray ids (pixel-major, spp-minor)
    ambient: jnp.ndarray,   # (3,)
    width: int,
    height: int,
    samples: int,
    max_depth: int,
    max_stack: int,
):
    """Radiance for a batch of primary rays. Returns (N, 3) linear RGB."""
    _, uv = camera_mod.pixel_uv(width, height, samples, ray_ids)
    ro, rd = camera_mod.eval_camera(scene, uv)
    n = ro.shape[0]

    def occluder(p, d, tmin, tmax, mask):
        # stacked (L, N) shadow rays -> one flat any-hit traversal
        shape = p.shape[:-1]
        res = traverse.intersect_scene(
            scene, p.reshape(-1, 3), d.reshape(-1, 3), tmin.reshape(-1),
            jnp.where(mask, tmax, -FLT_MAX).reshape(-1),
            any_hit=True, max_stack=max_stack)
        return res["hit"].reshape(shape)

    tmin = jnp.full((n,), RAY_EPS)

    # depth loop as a while_loop: one compiled body regardless of max_depth,
    # early exit when every path has died (kr = 0 everywhere after bounce 1
    # for most scenes) — the iterative form of shade()'s recursion
    # (raytrace.cpp:187-204) capped at max_depth
    def cond(st):
        return (st["depth"] < max_depth) & jnp.any(st["active"])

    def body(st):
        hits = traverse.intersect_scene(
            scene, st["ro"], st["rd"], tmin,
            jnp.where(st["active"], FLT_MAX, -FLT_MAX),
            any_hit=False, max_stack=max_stack)
        color, kr, p, refl_dir, mask = shade_mod.shade_step(
            scene, st["ro"], st["rd"], hits, ambient, st["active"], occluder)
        acc = st["acc"] + st["thr"] * color
        cont = mask & jnp.any(kr > 0, axis=-1)
        thr = jnp.where(cont[:, None], st["thr"] * kr, st["thr"])
        return dict(ro=p, rd=refl_dir, acc=acc, thr=thr, active=cont,
                    depth=st["depth"] + 1)

    state = dict(
        ro=ro, rd=rd,
        acc=jnp.zeros((n, 3), jnp.float32),
        thr=jnp.ones((n, 3), jnp.float32),
        active=jnp.ones((n,), bool),
        depth=jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, state)
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
) -> np.ndarray:
    """Full-frame render -> (height, width, 4) f32 linear, alpha 1."""
    spp = samples * samples
    npix = width * height
    amb = jnp.asarray([ambient, ambient, ambient], jnp.float32)
    chunk_pixels = min(chunk_pixels, npix)

    out = np.empty((npix, 3), np.float32)
    for start in range(0, npix, chunk_pixels):
        ids = (np.arange(start * spp, (start + chunk_pixels) * spp)
               .astype(np.int32))
        # tail chunk: same shape, excess lanes render garbage pixels that we
        # drop (keeps one compiled executable)
        ids = np.minimum(ids, npix * spp - 1)
        rgb = trace_rays(
            scene, jnp.asarray(ids), amb,
            width=width, height=height, samples=samples,
            max_depth=max_depth, max_stack=meta.max_stack)
        rgb = np.asarray(rgb).reshape(chunk_pixels, spp, 3).sum(axis=1)
        stop = min(start + chunk_pixels, npix)
        out[start:stop] = rgb[: stop - start]

    img = np.ones((npix, 4), np.float32)
    img[:, :3] = out / np.float32(spp)
    return img.reshape(height, width, 4)


def render_scene_file(
    path: str,
    resolution: int = 720,
    samples: int = 1,
    ambient: float = 0.1,
    camera: int = 0,
    max_depth: int = 8,
    chunk_pixels: int = 1 << 15,
):
    """Load + render, mirroring the reference main() (raytrace.cpp:256-287).

    Returns (hdr image (h, w, 4) f32, host scene, device scene, meta).
    """
    from .. import scene as scene_lib

    host = scene_lib.load_scene(path)
    dscene, meta = scene_lib.build_device_scene(host, camera=camera)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[camera]
    width = image_width(cam.aspect, resolution)
    img = render_image(dscene, meta, width, resolution, samples,
                       ambient=ambient, max_depth=max_depth,
                       chunk_pixels=chunk_pixels)
    return img, host, dscene, meta
