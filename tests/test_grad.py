"""Gradient parity: reverse-mode pixel gradients vs finite differences.

The detached-traversal design (ops/traverse.py docstring) fixes the discrete
hit topology and differentiates the hit-attribute recompute + shading, so
away from visibility boundaries the renderer is smooth in camera, geometry,
material and light parameters. make_grad_scene keeps sample rays clear of
boundaries; finite differences use central stencils in f32.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu import testscenes
from yocto_raytracing_tpu.parallel import mesh as mesh_mod
from yocto_raytracing_tpu.render import renderer as renderer_mod

W = H = 8
SAMPLES = 1
MAX_DEPTH = 3
AMB = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)


@pytest.fixture(scope="module")
def setup():
    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    ids = jnp.arange(W * H * SAMPLES * SAMPLES, dtype=jnp.int32)
    return dev, meta, ids


def _objective(scene, ids, meta):
    rgb = renderer_mod.trace_rays(
        scene, ids, AMB, width=W, height=H, samples=SAMPLES,
        max_depth=MAX_DEPTH, max_stack=meta.max_stack, differentiable=True)
    # weighted sum (not mean) keeps per-pixel gradients O(1)
    w = jnp.sin(jnp.arange(rgb.size, dtype=jnp.float32)).reshape(rgb.shape)
    return jnp.sum(rgb * w)


def _scene_grad(scene, ids, meta):
    """Gradient wrt every float leaf, ints/u8 held static."""
    diff, static, treedef = mesh_mod.partition_scene(scene)

    def f(d):
        return _objective(mesh_mod.combine_scene(d, static, treedef),
                          ids, meta)

    gdiff = jax.grad(f)(diff)
    zeros = [None if d is None else jnp.zeros_like(d) for d in gdiff]
    return mesh_mod.combine_scene(
        [g if g is not None else z for g, z in zip(gdiff, zeros)],
        static, treedef)


def _fd_check(scene, ids, meta, leaf_name, idx, eps, rtol, atol):
    """Central finite difference on scene.<leaf_name>[idx] vs autodiff."""
    g = getattr(_scene_grad(scene, ids, meta), leaf_name)[idx]

    def perturbed(delta):
        arr = np.asarray(getattr(scene, leaf_name)).copy()
        arr[idx] += delta
        kwargs = {leaf_name: jnp.asarray(arr)}
        import dataclasses
        s2 = dataclasses.replace(scene, **kwargs)
        return float(_objective(s2, ids, meta))

    fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=rtol, atol=atol)


@pytest.mark.parametrize("leaf,idx,eps", [
    ("mat_kd", (0, 1), 1e-3),        # diffuse albedo
    ("mat_ks", (0, 0), 1e-3),        # specular
    ("mat_kr", (1, 2), 1e-3),        # mirror reflectance (depth > 1 path)
    ("light_ke", (0, 0), 1e-2),      # light intensity
    ("cam_o", (2,), 1e-3),           # camera position
    ("light_o", (0, 0), 1e-4),       # light instance translation
])
def test_grad_matches_fd(setup, leaf, idx, eps):
    # rtol floor set by f32 central-difference noise: the objective sums
    # O(1) pixel terms at ~1e-7 relative precision, so FD at eps=1e-3 has
    # a few-percent noise floor
    scene, meta, ids = setup
    _fd_check(scene, ids, meta, leaf, idx, eps, rtol=5e-2, atol=1e-3)


def test_grad_vertex_positions(setup):
    scene, meta, ids = setup
    # vertex 2 is the apex of the big triangle: moving it changes shading
    # normals/hit points smoothly for interior hits
    _fd_check(scene, ids, meta, "pos", (2, 0), 1e-4, rtol=5e-2, atol=5e-3)


def test_grad_nonzero_for_all_param_families(setup):
    scene, meta, ids = setup
    grads = _scene_grad(scene, ids, meta)
    for name in ("mat_kd", "mat_ke", "light_ke", "cam_o", "pos", "norm",
                 "inst_o"):
        g = np.asarray(getattr(grads, name))
        assert np.isfinite(g).all(), name
    assert np.abs(np.asarray(grads.mat_kd)).sum() > 0
    assert np.abs(np.asarray(grads.cam_o)).sum() > 0
    assert np.abs(np.asarray(grads.pos)).sum() > 0
