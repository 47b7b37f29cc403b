"""Gradient hardening on REAL loaded scenes + visibility-boundary law.

Round-3 additions over test_grad.py (which uses an analytic scene):

* finite-difference checks on the loaded simple_pointlight scene at low
  resolution, through the production stream intersector;
* the visibility-boundary characterization the detached-traversal design
  implies: reverse-mode gradients contain NO boundary term — moving a
  silhouette edge changes which pixels hit (finite differences see a
  large jump) while autodiff, which holds hit topology fixed, reports ~0
  for purely-coverage changes. GRADIENTS.md documents the law; this test
  pins it.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.parallel import mesh as mesh_mod
from yocto_raytracing_tpu.render import renderer as renderer_mod

AMB = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)


def _objective(scene, ids, meta, w, h, stream=None, max_depth=2):
    rgb = renderer_mod.trace_rays(
        scene, ids, AMB, width=w, height=h, samples=1,
        max_depth=max_depth, max_stack=meta.max_stack,
        differentiable=True, stream=stream)
    wgt = jnp.cos(jnp.arange(rgb.size, dtype=jnp.float32) * 0.7)
    return jnp.sum(rgb * wgt.reshape(rgb.shape))


def _autodiff_leaf(scene, ids, meta, w, h, leaf, idx, stream=None,
                   max_depth=2):
    diff, static, treedef = mesh_mod.partition_scene(scene)

    def f(d):
        return _objective(mesh_mod.combine_scene(d, static, treedef), ids,
                          meta, w, h, stream=stream, max_depth=max_depth)

    g = jax.grad(f)(diff)
    names = [fld.name for fld in dataclasses.fields(scene)]
    return float(g[names.index(leaf)][idx])


def _fd_leaf(scene, ids, meta, w, h, leaf, idx, eps, stream=None,
             max_depth=2):
    def at(delta):
        arr = np.asarray(getattr(scene, leaf)).copy()
        arr[idx] += delta
        s2 = dataclasses.replace(scene, **{leaf: jnp.asarray(arr)})
        return float(_objective(s2, ids, meta, w, h, stream=stream,
                                max_depth=max_depth))

    return (at(eps) - at(-eps)) / (2 * eps)


@needs_reference
@pytest.mark.parametrize("leaf,idx,eps,rtol", [
    ("mat_kd", (0, 0), 1e-3, 6e-2),   # floor albedo
    ("light_ke", (0, 1), 1e-1, 6e-2),  # light intensity (ke ~ 100)
    ("cam_o", (1,), 1e-4, 8e-2),       # camera height
])
def test_fd_on_loaded_simple_scene(leaf, idx, eps, rtol):
    """FD vs autodiff on the REAL simple_pointlight scene (VERDICT r2 #4).

    16x9 @ 1 spp through the production stream intersector. Note: the
    stream tables hold COPIES of the geometry, so FD perturbations of pos
    would desync them — only non-geometry leaves are FD-checked here
    (geometry FD runs on the analytic scene in test_grad.py where the
    traversal path is used).
    """
    host = scene_lib.load_scene(reference_scene("simple"))
    dev, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dev, meta)
    ss = jax.tree_util.tree_map(jnp.asarray, ss)
    dev = scene_lib.to_jax(dev)
    w, h = 16, 9
    ids = jnp.arange(w * h, dtype=jnp.int32)
    g = _autodiff_leaf(dev, ids, meta, w, h, leaf, idx, stream=ss)
    fd = _fd_leaf(dev, ids, meta, w, h, leaf, idx, eps, stream=ss)
    np.testing.assert_allclose(g, fd, rtol=rtol, atol=2e-3)


def _edge_scene():
    """A constant-color triangle whose silhouette splits the image: under
    pure ambient shading its interior radiance is INDEPENDENT of vertex
    positions, so the exact pixel gradient wrt a vertex is purely the
    boundary (coverage) term — which detached traversal by design drops.
    """
    host = testscenes.make_random_scene(seed=5, n_instances=1, n_shapes=1,
                                        n_tris=1, n_lines=0, n_points=0)
    shp = host.shapes[0]
    shp.pos = np.asarray([[-0.5, -2.0, 0.0], [0.5, 2.0, 0.0],
                          [2.5, 0.0, 0.0]], np.float32)
    # winding chosen so the smooth normal faces +z (toward camera/light)
    shp.triangles = np.asarray([[0, 2, 1]], np.int32)
    shp.norm = np.zeros((0, 3), np.float32)
    shp.texcoord = np.zeros((3, 2), np.float32)
    shp.radius = np.zeros(3, np.float32)
    shp.points = np.zeros(0, np.int32)
    shp.lines = np.zeros((0, 2), np.int32)
    host.instances[0].axes = np.eye(3, dtype=np.float32)
    host.instances[0].o = np.zeros(3, np.float32)
    host.materials[0].kd = np.asarray([0.8, 0.8, 0.8], np.float32)
    host.materials[0].ks = np.zeros(3, np.float32)
    host.materials[0].kr = np.zeros(3, np.float32)
    c = testscenes.lookat_camera("cam", eye=(0, 0, 4), target=(0, 0, 0))
    host.cameras = [c]
    scene_lib.finalize_scene(host)
    return host


def test_visibility_boundary_gradient_is_dropped():
    """Detached traversal drops silhouette terms: FD sees the coverage
    jump, autodiff reports ~0 (GRADIENTS.md; SURVEY §7 hard-part 2)."""
    host = _edge_scene()
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    w = h = 12
    ids = jnp.arange(w * h, dtype=jnp.int32)

    # move vertex 0 in x: with no lights and flat kd the interior color is
    # constant; only coverage changes
    leaf, idx = "pos", (0, 0)
    g = _autodiff_leaf(dev, ids, meta, w, h, leaf, idx, max_depth=1)
    fd = _fd_leaf(dev, ids, meta, w, h, leaf, idx, 2e-2, max_depth=1)
    # FD sees pixels flipping hit<->miss across the edge; autodiff ~ 0
    assert abs(fd) > 0.2, f"edge FD should be large, got {fd}"
    assert abs(g) < 1e-4, f"detached-traversal grad should be ~0, got {g}"


def test_interior_gradients_survive_detachment():
    """The same scene WITH a light: interior shading now depends on the
    hit-point recompute, and that gradient must flow (non-zero) even
    though the traversal is detached."""
    host = _edge_scene()
    # light above the triangle
    lightshape = testscenes._shape(
        "lamp", pos=[[0.0, 0.0, 3.0]], points=[0])
    host.shapes.append(lightshape)
    mat = scene_lib.HostMaterial(name="lamp",
                                 ke=np.asarray([50.0, 50.0, 50.0],
                                               np.float32))
    host.materials.append(mat)
    host.instances.append(scene_lib.HostInstance(
        name="lamp", axes=np.eye(3, dtype=np.float32),
        o=np.zeros(3, np.float32), shape=1, material=1))
    scene_lib.finalize_scene(host)
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    w = h = 12
    ids = jnp.arange(w * h, dtype=jnp.int32)
    g = _autodiff_leaf(dev, ids, meta, w, h, "pos", (0, 2), max_depth=1)
    fd = _fd_leaf(dev, ids, meta, w, h, "pos", (0, 2), 1e-3, max_depth=1)
    assert abs(g) > 1e-4, "interior shading gradient must flow"
    np.testing.assert_allclose(g, fd, rtol=0.15, atol=5e-3)
