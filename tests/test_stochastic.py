"""Stochastic render mode: jittered AA + thin-lens DOF.

The TPU-native extension SURVEY §7 planned: the reference parses camera
aperture and ignores it (src/raytrace.cpp:6-37 has no lens sampling; the
simple scene ships a ``cam_dof`` camera, in/simple_pointlight obj). Here
the sampling layer (ops/sampling.py + jax.random) drives sub-pixel jitter
and aperture-disk origins; variates are keyed by ray id so renders are
deterministic per seed and invariant to chunking.
"""

import numpy as np
import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.render import camera as camera_mod, renderer


def _build(host, camera=0):
    dev, meta = scene_lib.build_device_scene(host, camera=camera)
    return scene_lib.to_jax(dev), meta


def test_dof_rays_converge_on_focus_plane():
    host = testscenes.make_random_scene(seed=0)
    cam = host.cameras[0]
    cam.aperture = 0.5
    dev, meta = _build(host)
    uv = jnp.asarray([[0.3, 0.6]] * 8, jnp.float32)
    lens = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (8, 2)),
                       jnp.float32)
    lens = lens / jnp.maximum(jnp.linalg.norm(lens, axis=-1,
                                              keepdims=True), 1.0)
    ro, rd = camera_mod.eval_camera_dof(dev, uv, lens)
    # all rays through one uv pass through the same focus-plane point:
    # solve for t where the ray crosses the plane at distance `focus`
    # along -z_cam and check the crossing points coincide
    z = np.asarray(dev.cam_axes[2])
    o = np.asarray(dev.cam_o)
    focus = float(dev.cam_focus)
    ro_n = np.asarray(ro)
    rd_n = np.asarray(rd)
    denom = rd_n @ (-z)
    t = (focus - (ro_n - o) @ (-z)) / denom
    pts = ro_n + rd_n * t[:, None]
    assert np.abs(pts - pts[0]).max() < 1e-4
    # origins actually spread across the aperture
    assert np.abs(ro_n - ro_n[0]).max() > 1e-3


def test_dof_zero_aperture_matches_pinhole():
    host = testscenes.make_random_scene(seed=1)
    dev, meta = _build(host)   # aperture 0
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (16, 2)),
                     jnp.float32)
    lens = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (16, 2)),
                       jnp.float32)
    ro0, rd0 = camera_mod.eval_camera(dev, uv)
    ro1, rd1 = camera_mod.eval_camera_dof(dev, uv, lens)
    np.testing.assert_array_equal(np.asarray(ro0), np.asarray(ro1))
    np.testing.assert_array_equal(np.asarray(rd0), np.asarray(rd1))


def test_jittered_uv_stays_in_stratum():
    ids = jnp.arange(64, dtype=jnp.int32)
    _, uv_d = camera_mod.pixel_uv(8, 8, 1, ids)
    _, uv_j = camera_mod.pixel_uv_jittered(8, 8, 1, ids, 7)
    # jitter stays within each pixel's cell: |jittered - center| <= half
    assert np.abs(np.asarray(uv_j) - np.asarray(uv_d)).max() <= 0.5 / 8
    # and actually moves
    assert np.abs(np.asarray(uv_j) - np.asarray(uv_d)).max() > 1e-4


def test_per_ray_uniform_chunk_invariant():
    ids = jnp.arange(100, dtype=jnp.int32)
    full = np.asarray(camera_mod.per_ray_uniform(3, ids, 2))
    part = np.asarray(camera_mod.per_ray_uniform(3, ids[40:70], 2))
    np.testing.assert_array_equal(full[40:70], part)
    # u01 range and basic de-correlation between columns
    assert full.min() >= 0.0 and full.max() < 1.0
    assert abs(np.corrcoef(full[:, 0], full[:, 1])[0, 1]) < 0.35


def test_stochastic_render_deterministic_and_converges():
    host = testscenes.make_random_scene(seed=2)
    dev, meta = _build(host)
    kw = dict(samples=2, ambient=0.1, max_depth=2, chunk_pixels=1 << 10)
    det = renderer.render_image(dev, meta, 48, 32, **kw)
    s0 = renderer.render_image(dev, meta, 48, 32, stochastic=True, seed=0,
                               **kw)
    s0b = renderer.render_image(dev, meta, 48, 32, stochastic=True, seed=0,
                                **kw)
    s1 = renderer.render_image(dev, meta, 48, 32, stochastic=True, seed=1,
                               **kw)
    np.testing.assert_array_equal(s0, s0b)      # same seed -> identical
    assert np.abs(s0 - s1).max() > 0            # seed changes the estimate
    # unbiasedness smoke: stochastic mean brightness close to stratified
    assert abs(float(s0[..., :3].mean()) - float(det[..., :3].mean())) \
        < 0.05 * max(float(det[..., :3].mean()), 1e-3) + 2e-3


def test_dof_blurs_offplane_only():
    """A point on the focus plane stays sharp; off-plane blurs."""
    # camera at origin looking down -z (lookat target), focus = 4
    host = testscenes.make_random_scene(seed=3, n_instances=1, n_shapes=1)
    cam = host.cameras[0]
    # build a fresh single-triangle scene at controllable depth
    from yocto_raytracing_tpu.testscenes import lookat_camera

    def scene_with_tri(depth):
        tri_host = testscenes.make_random_scene(seed=3, n_instances=1,
                                                n_shapes=1, n_tris=1,
                                                n_lines=0, n_points=0)
        shp = tri_host.shapes[0]
        shp.pos = np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1.5, 0]],
                             np.float32) * 0.8
        shp.triangles = np.asarray([[0, 1, 2]], np.int32)
        shp.norm = np.zeros((0, 3), np.float32)
        shp.texcoord = np.zeros((3, 2), np.float32)
        shp.radius = np.zeros(3, np.float32)
        shp.points = np.zeros(0, np.int32)
        shp.lines = np.zeros((0, 2), np.int32)
        tri_host.instances[0].axes = np.eye(3, dtype=np.float32)
        tri_host.instances[0].o = np.asarray([0, 0, -depth], np.float32)
        c = lookat_camera("cam", eye=(0, 0, 4), target=(0, 0, 0))
        c.aperture = 0.6
        c.focus = 8.0  # focus plane at z = -4
        tri_host.cameras = [c]
        scene_lib.finalize_scene(tri_host)
        return tri_host

    def dof_deviation(depth):
        """Mean |thin-lens render - pinhole render| of the same geometry:
        ~0 for an object ON the focus plane, large off it."""
        h = scene_with_tri(depth)
        dev, meta = _build(h)
        kw = dict(samples=4, ambient=0.5, max_depth=1)
        dof = renderer.render_image(dev, meta, 64, 64, stochastic=True,
                                    seed=0, **kw)
        h2 = scene_with_tri(depth)
        h2.cameras[0].aperture = 0.0
        dev2, meta2 = _build(h2)
        pin = renderer.render_image(dev2, meta2, 64, 64, stochastic=True,
                                    seed=0, **kw)
        return float(np.abs(dof[..., :3] - pin[..., :3]).mean())

    sharp = dof_deviation(4.0)    # on the focus plane
    blurred = dof_deviation(1.0)  # well off the plane (closer to lens)
    assert blurred > sharp * 3, (sharp, blurred)
