"""Camera ray generation.

Parity: eval_camera (src/raytrace.cpp:6-37) — pinhole with the image plane at
``focus`` distance, plane height ``2*focus*tan(fovy/2)``, width ``h*aspect``,
y axis negated, uv in [0,1]^2 with v growing downward (the render loop feeds
``(j + ...)/height`` directly, raytrace.cpp:236-239). The ``aperture``
parameter is parsed but the reference implements no depth of field; the
deterministic path matches that. The stochastic path (``eval_camera_dof``,
``pixel_uv_jittered``) is the TPU-native extension SURVEY §7 planned:
thin-lens DOF + jittered AA driven by stateless ``jax.random`` — the simple
scene ships a ``cam_dof`` camera (in/simple_pointlight obj line 3) that the
reference parses and then ignores.

Rays carry the ray3f defaults tmin=1e-4, tmax=FLT_MAX (src/vmath.h:264-271).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

RAY_EPS = np.float32(1e-4)
FLT_MAX = np.float32(3.4028235e38)


def eval_camera(scene, uv: jnp.ndarray):
    """uv (N, 2) -> (ro (N, 3), rd (N, 3)). Differentiable in camera params."""
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    x = scene.cam_axes[0]
    y = -scene.cam_axes[1]
    z = scene.cam_axes[2]
    o = scene.cam_o
    h = 2.0 * scene.cam_focus * jnp.tan(scene.cam_fovy / 2.0)
    w = h * scene.cam_aspect
    q = (o + (u - 0.5) * w * x + (v - 0.5) * h * y - scene.cam_focus * z)
    d = q - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(o, d.shape)
    return ro, d


def _pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """PCG output permutation (Jarzynski & Olano, "Hash Functions for GPU
    Rendering", JCGT 2020) — a full-avalanche u32 hash in 6 VPU ops."""
    x = x * jnp.uint32(747796405) + jnp.uint32(2891336453)
    w = ((x >> ((x >> jnp.uint32(28)) + jnp.uint32(4))) ^ x)
    w = w * jnp.uint32(277803737)
    return (w >> jnp.uint32(22)) ^ w


def per_ray_uniform(seed, ray_ids: jnp.ndarray, n: int) -> jnp.ndarray:
    """(N, n) u01 variates keyed by RAY ID, not lane position, so the same
    ray gets the same variates no matter how the batch is chunked, tiled
    or sharded — renders are reproducible across every execution layout.

    Stateless counter-based hashing (PCG) rather than jax.random's
    threefry: 6 integer VPU ops per variate vs ~2 threefry rounds, and no
    key plumbing in the hot loop. ``seed`` is a u32 scalar.
    """
    seed = jnp.asarray(seed, jnp.uint32)
    base = ray_ids.astype(jnp.uint32)
    cols = []
    for k in range(n):
        h = _pcg_hash(base ^ _pcg_hash(seed + jnp.uint32(k)))
        # top 24 bits -> [0, 1) with exact f32 representation
        cols.append((h >> jnp.uint32(8)).astype(jnp.float32)
                    * jnp.float32(1.0 / (1 << 24)))
    return jnp.stack(cols, axis=-1)


def eval_camera_dof(scene, uv: jnp.ndarray, lens_uv: jnp.ndarray):
    """Thin-lens camera: uv (N, 2) + unit-disk lens samples (N, 2) ->
    (ro, rd).

    The pinhole image plane already sits at ``focus`` distance
    (raytrace.cpp:14-16), so the pinhole target q IS on the focus plane:
    jitter the ray origin across the aperture disk (radius aperture/2 in
    the camera's x/y plane) and aim at q — points on the focus plane stay
    sharp, points off it blur with circle-of-confusion proportional to
    aperture and defocus. aperture == 0 degenerates to eval_camera exactly.
    """
    u = uv[:, 0:1]
    v = uv[:, 1:2]
    x = scene.cam_axes[0]
    y = -scene.cam_axes[1]
    z = scene.cam_axes[2]
    o = scene.cam_o
    h = 2.0 * scene.cam_focus * jnp.tan(scene.cam_fovy / 2.0)
    w = h * scene.cam_aspect
    q = (o + (u - 0.5) * w * x + (v - 0.5) * h * y - scene.cam_focus * z)
    lens = scene.cam_aperture / 2.0
    ro = o + lens * (lens_uv[:, 0:1] * x + lens_uv[:, 1:2] * y)
    d = q - ro
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.broadcast_to(ro, d.shape), d


def pixel_uv_jittered(width, height, samples, ray_ids: jnp.ndarray, seed):
    """Stratified-JITTERED sub-pixel uv: offsets ``(k + u01)/s`` instead of
    the deterministic ``(k + 0.5)/s`` (raytrace.cpp:236-239) — same
    stratification cells, uniform within each. Stateless: per-ray variates
    come from hashing the ray id with ``seed`` (per_ray_uniform), so
    results are independent of chunking/sharding."""
    width_t = jnp.asarray(width, jnp.int32)
    samples_t = jnp.asarray(samples, jnp.int32)
    spp = samples_t * samples_t
    pix = ray_ids // spp
    sub = ray_ids % spp
    jj = sub // samples_t
    ii = sub % samples_t
    i = (pix % width_t).astype(jnp.float32)
    j = (pix // width_t).astype(jnp.float32)
    s = samples_t.astype(jnp.float32)
    r = per_ray_uniform(seed, ray_ids, 2)
    u = (i + (ii.astype(jnp.float32) + r[:, 0]) / s) / width_t.astype(
        jnp.float32)
    v = (j + (jj.astype(jnp.float32) + r[:, 1]) / s) / jnp.asarray(
        height, jnp.float32)
    return pix, jnp.stack([u, v], axis=-1)


def pixel_uv(width, height, samples, ray_ids: jnp.ndarray):
    """Flat ray id -> (pixel id, stratified uv).

    Ray order matches the reference accumulation loops (raytrace.cpp:228-239):
    for each pixel, samples^2 sub-rays with offsets ((ii+0.5)/s, (jj+0.5)/s),
    jj-major. Pixel ids are i-major there (column loops outermost) but we use
    row-major pixel ids and keep the per-pixel sample order; per-pixel sums
    are order-identical.

    width/height/samples should be TRACED values, not Python constants:
    XLA's algebraic simplifier turns division by a literal into multiply-by-
    reciprocal (1/171 in f32 is off by 2^-28), which shifted u by ulps and
    broke pixel parity on symmetric scenes. Runtime divisors keep the exact
    IEEE divide the reference's C++ performs.
    """
    width = jnp.asarray(width, jnp.int32)
    samples = jnp.asarray(samples, jnp.int32)
    spp = samples * samples
    pix = ray_ids // spp
    sub = ray_ids % spp
    jj = sub // samples
    ii = sub % samples
    i = (pix % width).astype(jnp.float32)
    j = (pix // width).astype(jnp.float32)
    s = samples.astype(jnp.float32)
    u = (i + (ii.astype(jnp.float32) + 0.5) / s) / width.astype(jnp.float32)
    v = (j + (jj.astype(jnp.float32) + 0.5) / s) / jnp.asarray(
        height, jnp.float32)
    return pix, jnp.stack([u, v], axis=-1)
