"""Hair/line rendering on the synthesized lines scene.

The upstream lines_pointlight.obj is missing (SURVEY.md §4), so the capsule
intersector + hair BRDF path is validated structurally: strands are hit,
shading uses the line BRDF (nonzero where n·l would zero Blinn-Phong), and
the BVH agrees with brute force on the line-heavy scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.ops import brute, traverse
from yocto_raytracing_tpu.render import renderer as renderer_mod


@pytest.fixture(scope="module")
def setup():
    host = testscenes.make_hair_scene(n_strands=64)
    dev, meta = scene_lib.build_device_scene(host)
    return scene_lib.to_jax(dev), meta, host


def test_hair_scene_has_lines(setup):
    scene, meta, host = setup
    assert (np.asarray(scene.prim_type) == scene_lib.PRIM_LINE).sum() > 100
    assert np.asarray(scene.inst_is_lines).sum() == 1
    assert meta.num_lights == 2


def test_bvh_matches_brute_on_hair(setup):
    scene, meta, _ = setup
    rng = np.random.default_rng(1)
    # aim rays at the hair ball from random origins on a sphere
    origins = rng.normal(size=(128, 3)).astype(np.float32)
    origins = (origins / np.linalg.norm(origins, axis=-1, keepdims=True)
               * 3.0 + np.asarray([0, 1, 0], np.float32))
    targets = rng.normal(scale=0.4, size=(128, 3)).astype(np.float32)
    targets += np.asarray([0, 1, 0], np.float32)
    rd = targets - origins
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(origins), jnp.asarray(rd)
    tmin = jnp.full((128,), 1e-4)
    tmax = jnp.full((128,), 3.4e38)

    got = traverse.intersect_scene(scene, ro, rd, tmin, tmax,
                                   max_stack=meta.max_stack)
    want = brute.intersect_scene_brute(scene, meta, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(got["hit"]),
                                  np.asarray(want["hit"]))
    both = np.asarray(got["hit"])
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(want["t"])[both],
                               rtol=1e-5, atol=1e-6)
    assert both.sum() > 32, "rays aimed at the hair ball must hit"


def test_hair_render_smoke(setup):
    scene, meta, _ = setup
    img = renderer_mod.render_image(scene, meta, 32, 18, 1, max_depth=2)
    assert np.isfinite(img).all()
    assert img[..., :3].max() > 0.01, "render must not be black"
    assert (img[..., 3] == 1).all()


def test_hair_brdf_differs_from_blinn_phong(setup):
    """Grazing light: sin-based hair diffuse is bright where n·l ~ 0."""
    scene, meta, host = setup
    import dataclasses

    # flip the lines flag off and compare a strand-covered pixel region
    scene_no_hairbrdf = dataclasses.replace(
        scene, inst_is_lines=jnp.zeros_like(scene.inst_is_lines))
    a = renderer_mod.render_image(scene, meta, 32, 18, 1, max_depth=1)
    b = renderer_mod.render_image(scene_no_hairbrdf, meta, 32, 18, 1,
                                  max_depth=1)
    assert np.abs(a - b).max() > 1e-4, "hair BRDF must change the image"
