"""Camera ray generation.

Parity: eval_camera (src/raytrace.cpp:6-37) — pinhole with the image plane at
``focus`` distance, plane height ``2*focus*tan(fovy/2)``, width ``h*aspect``,
y axis negated, uv in [0,1]^2 with v growing downward (the render loop feeds
``(j + ...)/height`` directly, raytrace.cpp:236-239). The ``aperture``
parameter is parsed but the reference implements no depth of field; we match.

Rays carry the ray3f defaults tmin=1e-4, tmax=FLT_MAX (src/vmath.h:264-271).
"""

from __future__ import annotations

import jax.numpy as jnp

RAY_EPS = jnp.float32(1e-4)
FLT_MAX = jnp.float32(3.4028235e38)


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
