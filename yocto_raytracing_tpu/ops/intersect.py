"""Ray-primitive intersection tests, batched and differentiable.

Parity notes (all against src/scene.cpp):

* triangle: Möller-Trumbore with barycentrics ``ew = (1-w1-w2, w1, w2, 0)``
  and *inclusive* bounds (w in [0,1], t in [tmin, tmax]) — scene.cpp:229-263.
* point: sphere treated as disk at closest approach — scene.cpp:267-281.
* line: capsule via ray/segment closest points, radius lerped by s,
  ``ew = (1-s, s, 0, 0)`` — scene.cpp:285-307.

All functions take SoA ray batches of shape (..., 3) and return (hit, t, ew)
with non-hits carrying t = +inf. They are plain jnp, so jax.grad flows
through t/ew for the differentiable hit-attribute recompute (diff layer).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

FLT_MAX = np.float32(3.4028235e38)


def dot(a, b):
    """3-vector dot as explicit left-associative adds.

    ``jnp.sum`` over a size-3 axis lowers with shape-dependent reduction
    order, so the same math in differently-broadcast call sites drifts by
    ULPs; explicit ``(x + y) + z`` pins the order (and matches the C++
    reference's ``x*x + y*y + z*z``).
    """
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def cross(a, b):
    return jnp.cross(a, b)


def safe_sqrt(x):
    """sqrt with a finite gradient at 0 (forward identical: sqrt(0) = 0).

    Plain sqrt has derivative inf at 0; on masked/garbage wavefront lanes
    that inf turns into 0 * inf = NaN during reverse-mode accumulation and
    poisons whole gradient leaves.
    """
    gt = x > 0
    return jnp.where(gt, jnp.sqrt(jnp.where(gt, x, 1.0)), 0.0)


def safe_normalize(v, axis=-1):
    """normalize with the reference's 0 -> 0 convention (src/vmath.h:118-122)
    and a well-defined (zero) gradient at v = 0."""
    del axis  # 3-vectors on the last axis only (explicit-order dot)
    n2 = dot(v, v)[..., None]
    gt = n2 > 0
    inv = 1.0 / jnp.sqrt(jnp.where(gt, n2, 1.0))
    return jnp.where(gt, v * inv, v)


def safe_pow(base, exp):
    """base**exp for base >= 0 without the log(0) NaN in the exp-cotangent.

    jnp.power's backward contains ``log(base) * base**exp * d(exp)``; at
    base = 0 (every lane where the Blinn-Phong half-vector is below the
    horizon) that is -inf * 0 = NaN flowing into the roughness gradient.
    Forward is identical: 0**exp = 0 for exp > 0.
    """
    gt = base > 0
    return jnp.where(gt, jnp.power(jnp.where(gt, base, 1.0), exp), 0.0)


def intersect_triangle(ro, rd, tmin, tmax, v0, v1, v2):
    """Batched Möller-Trumbore (parity: src/scene.cpp:229-263).

    Returns (hit, t, w1, w2); non-hit t = +inf.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    r = cross(rd, e2)
    den = dot(r, e1)
    safe_den = jnp.where(den == 0, jnp.float32(1), den)
    inv_den = jnp.float32(1) / safe_den
    c = ro - v0
    w1 = dot(r, c) * inv_den
    s = cross(c, e1)
    w2 = dot(s, rd) * inv_den
    t = dot(s, e2) * inv_den
    hit = (
        (den != 0)
        & (w1 >= 0) & (w1 <= 1)
        & (w2 >= 0) & (w1 + w2 <= 1)
        & (t >= tmin) & (t <= tmax)
    )
    return hit, jnp.where(hit, t, FLT_MAX), w1, w2


def intersect_point(ro, rd, tmin, tmax, p, r):
    """Batched point-as-disk (parity: src/scene.cpp:267-281).

    Returns (hit, t); ew is the constant (1,0,0,0).
    """
    w = p - ro
    t = dot(w, rd) / dot(rd, rd)
    rp = ro + rd * t[..., None]
    prp = p - rp
    hit = (t >= tmin) & (t <= tmax) & (dot(prp, prp) <= r * r)
    return hit, jnp.where(hit, t, FLT_MAX)


def intersect_line(ro, rd, tmin, tmax, v0, v1, r0, r1):
    """Batched capsule segment (parity: src/scene.cpp:285-307).

    Returns (hit, t, s) with s the segment parameter for ew = (1-s, s, 0, 0).
    """
    u = rd
    v = v1 - v0
    w = ro - v0
    a = dot(u, u)
    b = dot(u, v)
    c = dot(v, v)
    d = dot(u, w)
    e = dot(v, w)
    det = a * c - b * b
    safe_det = jnp.where(det == 0, jnp.float32(1), det)
    t = (b * e - c * d) / safe_det
    s = (a * e - b * d) / safe_det
    s = jnp.clip(s, 0.0, 1.0)
    p0 = ro + rd * t[..., None]
    p1 = v0 + v * s[..., None]
    p01 = p0 - p1
    r = r0 * (1 - s) + r1 * s
    hit = (det != 0) & (t >= tmin) & (t <= tmax) & (dot(p01, p01) <= r * r)
    return hit, jnp.where(hit, t, FLT_MAX), s


def intersect_quad(ro, rd, tmin, tmax, v0, v1, v2, v3):
    """Batched two-triangle quad (parity: ym::intersect_quad,
    src/ext/yocto_math.h:5682-5697).

    Triangle 1 = (v0, v1, v3), triangle 2 = (v2, v3, v1) with the second
    test capped at the first's t (sequential tmax shrink). Returns
    (hit, t, euv) with euv (…, 4) in the reference's quad convention:
    tri-1 hits -> (ew0, ew1, 0, ew2); tri-2 hits remapped to
    (0, 1-u, u+v-1, 1-v). The app render path never draws quads (its
    loaders triangulate, src/ext/yocto_scn.cpp:398-411) — this exists for
    ym capability parity and is oracle-tested against the two triangle
    tests it is defined by.
    """
    h1, t1, a1, b1 = intersect_triangle(ro, rd, tmin, tmax, v0, v1, v3)
    cap = jnp.where(h1, t1, tmax)
    h2, t2, a2, b2 = intersect_triangle(ro, rd, tmin, cap, v2, v3, v1)
    hit = h1 | h2
    t = jnp.where(h2, t2, t1)
    # ym euv for a triangle is (1-u-v, u, v)
    e1 = jnp.stack([1.0 - a1 - b1, a1, jnp.zeros_like(a1), b1], axis=-1)
    u2 = a2
    v2_ = b2
    e2 = jnp.stack([jnp.zeros_like(u2), 1.0 - u2, u2 + v2_ - 1.0, 1.0 - v2_],
                   axis=-1)
    euv = jnp.where(h2[..., None], e2, e1)
    return hit, jnp.where(hit, t, FLT_MAX), euv


def intersect_tetrahedron(ro, rd, tmin, tmax, v0, v1, v2, v3):
    """Batched tetrahedron surface test (parity: ym::intersect_tetrahedron,
    src/ext/yocto_math.h:5718-5743).

    Four face triangle tests in the reference's order — (v0,v1,v2),
    (v0,v1,v3), (v0,v2,v3), (v1,v2,v3) — each capping tmax at the running
    nearest, so the returned t is the closest face hit. The reference
    leaves ``euv`` unset for tetrahedra (its own "TODO: uv"); we return
    (hit, t) only. Interior intersections are not reported (surface only,
    per the ym doc comment).
    """
    hit = jnp.zeros(jnp.broadcast_shapes(tmin.shape, tmax.shape), bool)
    t_best = jnp.broadcast_to(tmax, hit.shape).astype(jnp.float32)
    for (a, b, c) in ((v0, v1, v2), (v0, v1, v3), (v0, v2, v3),
                      (v1, v2, v3)):
        h, t, _, _ = intersect_triangle(ro, rd, tmin, t_best, a, b, c)
        hit = hit | h
        t_best = jnp.where(h, t, t_best)
    return hit, jnp.where(hit, t_best, FLT_MAX)


def intersect_bbox(ro, rd, tmin, tmax, bmin, bmax):
    """Batched slab test with the reference's robustness factor.

    Parity: intersect_check_bbox (src/scene.cpp:370-382): swap by inv-dir
    sign, ``tmax *= 1.00000024`` slack after the min-reduce. The reduce uses
    ``(x > y) ? x : y`` comparisons, NOT IEEE max: an axis-parallel ray whose
    origin lies exactly on a slab plane yields ``0 * inf = NaN`` and the
    false comparison drops that axis's constraint. jnp.maximum would
    propagate the NaN (and a plain ``where(x > y, x, y)`` is rewritten into
    max by XLA's algebraic simplifier inside larger fused programs), so the
    drop is expressed with an explicit isnan filter the compiler must keep.
    """
    invd = jnp.float32(1) / rd
    t0 = (bmin - ro) * invd
    t1 = (bmax - ro) * invd
    tl = jnp.where(invd < 0, t1, t0)
    th = jnp.where(invd < 0, t0, t1)
    tl = jnp.where(jnp.isnan(tl), -jnp.inf, tl)
    th = jnp.where(jnp.isnan(th), jnp.inf, th)
    lo = jnp.maximum(jnp.max(tl, axis=-1), tmin)
    hi = jnp.minimum(jnp.min(th, axis=-1), tmax) * jnp.float32(1.00000024)
    return lo <= hi


def transform_vector(axes, v):
    """``v @ axes`` via explicit VPU multiply-adds.

    Frame transforms are 3x3; they must NOT lower to MXU matmuls, which run
    at bf16 input precision by default on TPU and break f32 parity (and are
    slower for this shape anyway). axes rows are the frame's x/y/z axes:
    result = v.x*x + v.y*y + v.z*z (src/vmath.h:161-163).
    Explicit adds: shape-dependent jnp.sum reduction order drifts by ULPs.
    """
    return (v[..., 0:1] * axes[..., 0, :] + v[..., 1:2] * axes[..., 1, :]
            + v[..., 2:3] * axes[..., 2, :])


def transform_vector_inverse(axes, v):
    """``v @ axes.T`` = (dot(x,v), dot(y,v), dot(z,v)) (src/vmath.h:165-167)."""
    return jnp.stack([dot(axes[..., 0, :], v), dot(axes[..., 1, :], v),
                      dot(axes[..., 2, :], v)], axis=-1)


def transform_point(axes, o, p):
    """transform_point (src/vmath.h:152-154)."""
    return transform_vector(axes, p) + o


def transform_ray_inverse(axes, o, ro, rd):
    """World ray -> instance-local ray (parity: src/vmath.h:275-278).

    ``axes`` rows are the frame's x/y/z axes; inverse transform is
    ``(p - o) @ axes.T`` for points and normalized ``d @ axes.T`` for
    directions (transform_direction_inverse normalizes, src/vmath.h:173-175).
    """
    lo = transform_vector_inverse(axes, ro - o)
    ld = safe_normalize(transform_vector_inverse(axes, rd))
    return lo, ld
