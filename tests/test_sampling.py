"""Monte-Carlo sampler distribution tests (ops/sampling.py).

Parity target: the ym:: sampling section (src/ext/yocto_math.h:3229-3418)
and the element-CDF builders behind yscn::update_lights
(src/ext/yocto_scn.cpp:1748-1779). Each sampler is validated against the
closed-form moments of its target distribution, and each pdf against the
sampler (pdf * uniform-measure integral ~= 1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yocto_raytracing_tpu.ops import sampling

N = 1 << 15


@pytest.fixture(scope="module")
def ruv():
    key = jax.random.PRNGKey(0)
    return jax.random.uniform(key, (N, 2), jnp.float32)


def test_sample_sphere_uniform(ruv):
    w = np.asarray(sampling.sample_sphere(ruv))
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
    # uniform on S2: component means 0, E[z^2] = 1/3
    assert np.abs(w.mean(axis=0)).max() < 0.02
    np.testing.assert_allclose((w[:, 2] ** 2).mean(), 1 / 3, atol=0.01)
    np.testing.assert_allclose(
        np.asarray(sampling.sample_sphere_pdf(jnp.asarray(w))),
        1 / (4 * np.pi))


def test_sample_hemisphere(ruv):
    w = np.asarray(sampling.sample_hemisphere(ruv))
    assert (w[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(w, axis=-1), 1.0, atol=1e-5)
    # uniform hemisphere: E[z] = 1/2
    np.testing.assert_allclose(w[:, 2].mean(), 0.5, atol=0.01)
    pdf = np.asarray(sampling.sample_hemisphere_pdf(jnp.asarray(w)))
    np.testing.assert_allclose(pdf, 1 / (2 * np.pi))
    assert float(sampling.sample_hemisphere_pdf(
        jnp.asarray([0.0, 0.0, -1.0]))) == 0.0


def test_sample_hemisphere_cosine(ruv):
    w = np.asarray(sampling.sample_hemisphere_cosine(ruv))
    # cosine-weighted: E[z] = 2/3
    np.testing.assert_allclose(w[:, 2].mean(), 2 / 3, atol=0.01)
    pdf = np.asarray(sampling.sample_hemisphere_cosine_pdf(jnp.asarray(w)))
    np.testing.assert_allclose(pdf, w[:, 2] / np.pi, atol=1e-5)


@pytest.mark.parametrize("n", [2.0, 8.0, 64.0])
def test_sample_hemisphere_cospower(ruv, n):
    w = np.asarray(sampling.sample_hemisphere_cospower(ruv, n))
    # E[z] under (n+1)/2pi cos^n: (n+1)/(n+2)
    np.testing.assert_allclose(w[:, 2].mean(), (n + 1) / (n + 2),
                               atol=0.01)
    pdf = np.asarray(sampling.sample_hemisphere_cospower_pdf(
        jnp.asarray(w), n))
    want = np.maximum(w[:, 2], 0) ** n * (n + 1) / (2 * np.pi)
    np.testing.assert_allclose(pdf, want, rtol=1e-4, atol=1e-5)


def test_sample_disk(ruv):
    p = np.asarray(sampling.sample_disk(ruv))
    r2 = p[:, 0] ** 2 + p[:, 1] ** 2
    assert (r2 <= 1.0 + 1e-6).all() and (p[:, 2] == 0).all()
    # uniform disk: E[r^2] = 1/2
    np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


def test_sample_cylinder(ruv):
    p = np.asarray(sampling.sample_cylinder(ruv))
    np.testing.assert_allclose(p[:, 0] ** 2 + p[:, 1] ** 2, 1.0, atol=1e-5)
    assert (np.abs(p[:, 2]) <= 1.0).all()
    np.testing.assert_allclose(p[:, 2].mean(), 0.0, atol=0.02)


def test_sample_triangle(ruv):
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([2.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 2.0, 0.0])
    p = np.asarray(sampling.sample_triangle(ruv, v0, v1, v2))
    # uniform over the triangle: mean = centroid
    np.testing.assert_allclose(p.mean(axis=0), [2 / 3, 2 / 3, 0], atol=0.02)
    # all inside
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 2 + 1e-5).all()
    # pdf = 1/area = 1/2
    np.testing.assert_allclose(
        float(sampling.sample_triangle_pdf(v0, v1, v2)), 0.5, rtol=1e-6)


def test_sample_index(ruv):
    idx = np.asarray(sampling.sample_index(ruv[:, 0], 7))
    assert idx.min() >= 0 and idx.max() <= 6
    counts = np.bincount(idx, minlength=7) / len(idx)
    np.testing.assert_allclose(counts, 1 / 7, atol=0.01)
    assert sampling.sample_index_pdf(7) == pytest.approx(1 / 7)


def test_cdf_builders_and_discrete(ruv):
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    lines = np.asarray([[0, 1], [1, 2]], np.int32)
    cdf_l = sampling.sample_lines_cdf(lines, pos)
    np.testing.assert_allclose(cdf_l, [1.0, 2.0])
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    cdf_t = sampling.sample_triangles_cdf(tris, pos)
    np.testing.assert_allclose(cdf_t, [0.5, 1.0])
    np.testing.assert_allclose(sampling.sample_points_cdf(3), [1, 2, 3])

    # sample_discrete frequencies proportional to weights 1:3
    cdf = np.asarray([1.0, 4.0], np.float32)
    idx = np.asarray(sampling.sample_discrete(cdf, ruv[:, 0]))
    frac1 = (idx == 1).mean()
    np.testing.assert_allclose(frac1, 0.75, atol=0.01)
