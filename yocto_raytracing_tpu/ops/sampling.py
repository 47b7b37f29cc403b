"""Monte-Carlo sampling toolkit (batched JAX).

Capability parity with the reference's ym:: sampling section
(src/ext/yocto_math.h:3229-3418) plus the element-CDF builders used by
yscn::update_lights (src/ext/yocto_scn.cpp:1748-1779, ym::sample_*_cdf).
The reference render path is deterministic and never calls these; they are
the sampling layer for stochastic modes (area lights, DOF, jittered AA).

TPU-native conventions: every sampler takes a batch of uniform variates
``ruv`` with shape (..., 2) (or (...,) for scalars) and returns batched
results — drive them with ``jax.random`` (stateless counter-based threefry,
the TPU-native replacement for the reference's PCG32/minstd state machines).
All math is f32 jnp and differentiable where meaningful.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

PIF = np.float32(3.14159265358979323846)


def _polar(ruv, z):
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * PIF * ruv[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_hemisphere(ruv):
    """Uniform hemisphere (z up). yocto_math.h:3234-3240."""
    return _polar(ruv, ruv[..., 1])


def sample_hemisphere_pdf(w):
    return jnp.where(w[..., 2] <= 0, 0.0, 1.0 / (2.0 * PIF))


def sample_sphere(ruv):
    """Uniform sphere. yocto_math.h:3248-3253."""
    return _polar(ruv, 2.0 * ruv[..., 1] - 1.0)


def sample_sphere_pdf(w):
    return jnp.full(w.shape[:-1], 1.0 / (4.0 * PIF))


def sample_hemisphere_cosine(ruv):
    """Cosine-weighted hemisphere. yocto_math.h:3259-3264."""
    return _polar(ruv, jnp.sqrt(ruv[..., 1]))


def sample_hemisphere_cosine_pdf(w):
    return jnp.where(w[..., 2] <= 0, 0.0, w[..., 2] / PIF)


def sample_hemisphere_cospower(ruv, n):
    """Phong-lobe (cos^n) hemisphere. yocto_math.h:3272-3277."""
    return _polar(ruv, jnp.power(ruv[..., 1], 1.0 / (n + 1.0)))


def sample_hemisphere_cospower_pdf(w, n):
    z = w[..., 2]
    return jnp.where(z <= 0, 0.0,
                     jnp.power(jnp.maximum(z, 0.0), n) * (n + 1.0)
                     / (2.0 * PIF))


def sample_disk(ruv):
    """Uniform unit disk (z = 0). yocto_math.h:3285-3289."""
    r = jnp.sqrt(ruv[..., 1])
    phi = 2.0 * PIF * ruv[..., 0]
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r,
                      jnp.zeros_like(r)], axis=-1)


def sample_disk_pdf():
    return 1.0 / float(np.pi)


def sample_cylinder(ruv):
    """Uniform unit cylinder side. yocto_math.h:3295-3298."""
    phi = 2.0 * PIF * ruv[..., 0]
    return jnp.stack([jnp.sin(phi), jnp.cos(phi),
                      ruv[..., 1] * 2.0 - 1.0], axis=-1)


def sample_cylinder_pdf():
    return 1.0 / float(np.pi)


def sample_triangle(ruv, v0=None, v1=None, v2=None):
    """Uniform triangle barycentrics (w1, w2); with vertices, the point.

    yocto_math.h:3304-3315 — uv = (1 - sqrt(r0), r1 * sqrt(r0)), point =
    v0*(1-u-v) + v1*u + v2*v.
    """
    sq = jnp.sqrt(ruv[..., 0])
    uv = jnp.stack([1.0 - sq, ruv[..., 1] * sq], axis=-1)
    if v0 is None:
        return uv
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return v0 * (1.0 - u - v) + v1 * u + v2 * v


def sample_triangle_pdf(v0, v1, v2):
    """1 / area (yocto_math.h:3318-3321)."""
    c = jnp.cross(v1 - v0, v2 - v0)
    return 2.0 / jnp.sqrt(jnp.sum(c * c, axis=-1))


def sample_index(r, size):
    """Uniform index in [0, size). yocto_math.h:3324-3326."""
    return jnp.clip((r * size).astype(jnp.int32), 0, size - 1)


def sample_index_pdf(size):
    return 1.0 / float(size)


# ---------------------------------------------------------------------------
# element CDFs for area sampling (ym::sample_points/lines/triangles_cdf,
# consumed by yscn::update_lights, yocto_scn.cpp:1759-1766)
# ---------------------------------------------------------------------------

def sample_points_cdf(n: int) -> np.ndarray:
    """Running count CDF: every point weighted 1."""
    return np.arange(1, n + 1, dtype=np.float32)


def sample_lines_cdf(lines: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Cumulative segment lengths."""
    d = pos[lines[:, 1]] - pos[lines[:, 0]]
    return np.cumsum(np.linalg.norm(d, axis=-1)).astype(np.float32)


def sample_triangles_cdf(tris: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Cumulative triangle areas."""
    c = np.cross(pos[tris[:, 1]] - pos[tris[:, 0]],
                 pos[tris[:, 2]] - pos[tris[:, 0]])
    return np.cumsum(0.5 * np.linalg.norm(c, axis=-1)).astype(np.float32)


def sample_discrete(cdf, r):
    """Element index by inverse-CDF lookup (batched).

    ``cdf`` is an unnormalized running sum (the ym convention above);
    returns indices with P(i) proportional to cdf[i] - cdf[i-1].
    """
    cdf = jnp.asarray(cdf)
    x = r * cdf[-1]
    idx = jnp.searchsorted(cdf, x, side="right")
    return jnp.clip(idx, 0, cdf.shape[0] - 1)
