"""Ray-primitive intersectors vs independent numpy oracles.

The oracles re-derive the geometry from first principles (solve the 3x3
barycentric system with np.linalg, closest-approach for spheres, closest
point between lines for capsules) rather than re-implementing the
reference's arithmetic, so they catch transcription errors in ops/intersect.
"""

import numpy as np
import jax.numpy as jnp

from yocto_raytracing_tpu.ops import intersect as isect

RNG = np.random.default_rng(42)


def random_rays(n):
    ro = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    rd = RNG.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd


def test_triangle_matches_linear_solve():
    n = 512
    ro, rd = random_rays(n)
    v0 = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    v1 = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    v2 = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 1e9, np.float32)

    hit, t, w1, w2 = map(np.asarray, isect.intersect_triangle(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmin),
        jnp.asarray(tmax), jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2)))

    # oracle: solve ro + t*rd = v0 + w1*(v1-v0) + w2*(v2-v0) in f64
    A = np.stack([-rd, v1 - v0, v2 - v0], axis=-1).astype(np.float64)
    b = (ro - v0).astype(np.float64)
    ok = np.abs(np.linalg.det(A)) > 1e-9
    sol = np.full((n, 3), np.nan)
    sol[ok] = np.linalg.solve(A[ok], b[ok][..., None])[..., 0]
    t_o, w1_o, w2_o = sol[:, 0], sol[:, 1], sol[:, 2]
    hit_o = (ok & (w1_o >= -1e-5) & (w1_o <= 1 + 1e-5) & (w2_o >= -1e-5)
             & (w1_o + w2_o <= 1 + 1e-5) & (t_o >= tmin) & (t_o <= tmax))

    # ignore lanes within tolerance of a boundary (f32 vs f64 disagreement)
    margin = (np.minimum.reduce([np.abs(w1_o), np.abs(1 - w1_o),
                                 np.abs(w2_o), np.abs(1 - w1_o - w2_o)])
              if True else None)
    decided = ok & (np.nan_to_num(margin, nan=1.0) > 1e-4)
    assert (hit[decided] == hit_o[decided]).all()
    both = hit & hit_o
    np.testing.assert_allclose(t[both], t_o[both], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(w1[both], w1_o[both], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(w2[both], w2_o[both], rtol=1e-3, atol=2e-4)


def test_point_closest_approach():
    n = 512
    ro, rd = random_rays(n)
    p = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    r = RNG.uniform(0.01, 0.5, size=n).astype(np.float32)
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 1e9, np.float32)

    hit, t = map(np.asarray, isect.intersect_point(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmin),
        jnp.asarray(tmax), jnp.asarray(p), jnp.asarray(r)))

    # oracle: t* = argmin_t |ro + t rd - p|; hit iff distance <= r, t in range
    t_o = np.einsum("ij,ij->i", p - ro, rd) / np.einsum("ij,ij->i", rd, rd)
    dist = np.linalg.norm(ro + rd * t_o[:, None] - p, axis=-1)
    margin = np.abs(dist - r)
    decided = margin > 1e-4
    hit_o = (t_o >= tmin) & (t_o <= tmax) & (dist <= r)
    assert (hit[decided] == hit_o[decided]).all()
    np.testing.assert_allclose(t[hit & hit_o], t_o[hit & hit_o], rtol=1e-5)


def test_line_capsule_distance():
    n = 512
    ro, rd = random_rays(n)
    v0 = RNG.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    v1 = v0 + RNG.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    r0 = RNG.uniform(0.02, 0.2, size=n).astype(np.float32)
    r1 = RNG.uniform(0.02, 0.2, size=n).astype(np.float32)
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 1e9, np.float32)

    hit, t, s = map(np.asarray, isect.intersect_line(
        jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(tmin),
        jnp.asarray(tmax), jnp.asarray(v0), jnp.asarray(v1),
        jnp.asarray(r0), jnp.asarray(r1)))

    # oracle: closest points between the infinite ray line and the segment,
    # computed in f64; hit iff |P_ray - P_seg| <= lerp(r0, r1, s)
    u = rd.astype(np.float64)
    v = (v1 - v0).astype(np.float64)
    w = (ro - v0).astype(np.float64)
    a = np.einsum("ij,ij->i", u, u)
    b = np.einsum("ij,ij->i", u, v)
    c = np.einsum("ij,ij->i", v, v)
    d = np.einsum("ij,ij->i", u, w)
    e = np.einsum("ij,ij->i", v, w)
    det = a * c - b * b
    ok = np.abs(det) > 1e-12
    t_o = np.where(ok, (b * e - c * d) / np.where(ok, det, 1), np.nan)
    s_o = np.clip(np.where(ok, (a * e - b * d) / np.where(ok, det, 1),
                           np.nan), 0, 1)
    pr = ro + rd * t_o[:, None]
    ps = v0 + (v1 - v0) * s_o[:, None]
    dist = np.linalg.norm(pr - ps, axis=-1)
    rr = r0 * (1 - s_o) + r1 * s_o
    hit_o = ok & (t_o >= tmin) & (t_o <= tmax) & (dist <= rr)
    decided = ok & (np.abs(dist - rr) > 1e-4)
    assert (hit[decided] == hit_o[decided]).all()
    both = hit & hit_o
    np.testing.assert_allclose(t[both], t_o[both], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(s[both], s_o[both], rtol=1e-3, atol=1e-3)


def test_bbox_slab_contains_and_misses():
    # ray from origin along +x: hits box straddling +x axis, misses box at -x
    ro = jnp.zeros((2, 3))
    rd = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]])
    tmin = jnp.full((2,), 1e-4)
    tmax = jnp.full((2,), 1e9)
    bmin = jnp.asarray([[1, -1, -1], [-3, -1, -1]], jnp.float32)
    bmax = jnp.asarray([[2, 1, 1], [-2, 1, 1]], jnp.float32)
    hit = np.asarray(isect.intersect_bbox(ro, rd, tmin, tmax, bmin, bmax))
    assert hit.tolist() == [True, False]


def test_bbox_axis_parallel_inside_slab():
    # axis-parallel ray inside the box: inv-dir infinities must not break it
    ro = jnp.asarray([[0.0, 0.5, 0.5]])
    rd = jnp.asarray([[1.0, 0.0, 0.0]])
    hit = np.asarray(isect.intersect_bbox(
        ro, rd, jnp.full((1,), 1e-4), jnp.full((1,), 1e9),
        jnp.asarray([[-1.0, 0, 0]]), jnp.asarray([[1.0, 1, 1]])))
    assert hit[0]


def test_transform_roundtrip():
    rng = np.random.default_rng(3)
    ang = rng.uniform(0, 2 * np.pi)
    ax = rng.normal(size=3)
    ax /= np.linalg.norm(ax)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    rot = (np.eye(3) + np.sin(ang) * K
           + (1 - np.cos(ang)) * K @ K).astype(np.float32)
    o = rng.uniform(-2, 2, size=3).astype(np.float32)
    p = rng.uniform(-2, 2, size=(16, 3)).astype(np.float32)

    axes = jnp.asarray(rot)
    fwd = np.asarray(isect.transform_point(axes, jnp.asarray(o),
                                           jnp.asarray(p)))
    back = np.asarray(isect.transform_vector_inverse(
        axes, jnp.asarray(fwd - o)))
    np.testing.assert_allclose(back, p, rtol=1e-5, atol=1e-5)
    # matches plain matrix math
    np.testing.assert_allclose(fwd, p @ rot + o, rtol=1e-6, atol=1e-6)
