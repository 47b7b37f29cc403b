"""Camera ray generation and stratified sampling layout."""

import numpy as np
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu import testscenes
from yocto_raytracing_tpu.render import camera as camera_mod
from yocto_raytracing_tpu.render import renderer as renderer_mod


def _scene():
    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    return scene_lib.to_jax(dev), host


def test_pixel_uv_stratified_grid():
    # samples=2: 4 sub-rays per pixel at offsets 0.25/0.75 (raytrace.cpp:236)
    ids = jnp.arange(8, dtype=jnp.int32)
    pix, uv = camera_mod.pixel_uv(4, 4, 2, ids)
    uv = np.asarray(uv)
    assert np.asarray(pix)[:4].tolist() == [0, 0, 0, 0]
    # pixel 0 spans [0, 0.25] in u: sub-offsets (0.5/2, 1.5/2) of the pixel
    np.testing.assert_allclose(
        sorted(uv[:4, 0].tolist()), [0.25 / 4, 0.25 / 4, 0.75 / 4, 0.75 / 4])
    np.testing.assert_allclose(
        sorted(uv[:4, 1].tolist()), [0.25 / 4, 0.25 / 4, 0.75 / 4, 0.75 / 4])


def test_camera_rays_normalized_and_through_plane():
    scene, host = _scene()
    uv = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, size=(32, 2)).astype(np.float32))
    ro, rd = camera_mod.eval_camera(scene, uv)
    ro, rd = np.asarray(ro), np.asarray(rd)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(
        ro, np.broadcast_to(host.cameras[0].o, ro.shape), rtol=1e-6)
    # center ray points along -z of the camera frame
    _, rd_c = camera_mod.eval_camera(scene, jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(
        np.asarray(rd_c)[0], -host.cameras[0].axes[2], atol=1e-6)


def test_image_width_rounding():
    # round(aspect * res) half away from zero (raytrace.cpp:216)
    assert renderer_mod.image_width(16 / 9, 720) == 1280
    assert renderer_mod.image_width(1.0, 255) == 255
    assert renderer_mod.image_width(2.5, 1) == 3  # 2.5 rounds away from zero
