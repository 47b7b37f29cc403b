"""Area-light sampling mode (render/lights.py).

Wires the element CDFs the reference builds and never uses
(yscn::update_lights, src/ext/yocto_scn.cpp:1748-1779) into a stochastic
soft-shadow estimator. The key parity property: a light whose shape is a
single POINT degenerates bit-exactly to the deterministic point-light
path (the CDF pick and the sample position both collapse to pos[0]).
"""

import numpy as np
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.render import lights as lights_mod, renderer


def _occluded_scene(light_tri=False):
    """Floor + small occluder + emissive shape above (point or triangle)."""
    host = testscenes.make_grad_scene()
    if light_tri:
        # replace the point-light shape with an area triangle at the same
        # centroid, spanning enough to soften shadows
        li = None
        for k, ist in enumerate(host.instances):
            mat = host.materials[ist.material]
            if (mat.ke > 0).all():
                li = ist
                break
        assert li is not None
        shp = host.shapes[li.shape]
        c = shp.pos[0].copy()
        shp.pos = np.asarray([c + [-0.6, 0, -0.6], c + [0.6, 0, -0.6],
                              c + [0.0, 0, 0.9]], np.float32)
        shp.triangles = np.asarray([[0, 1, 2]], np.int32)
        shp.points = np.zeros(0, np.int32)
        shp.norm = np.zeros((0, 3), np.float32)
        shp.texcoord = np.zeros((3, 2), np.float32)
        shp.radius = np.zeros(3, np.float32)
        scene_lib.finalize_scene(host)
    return host


def _render(host, light_sampler=None, **kw):
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    if light_sampler == "build":
        light_sampler = lights_mod.build_light_sampler(host, dev, meta)
    return renderer.render_image(dev, meta, 24, 24, samples=2, ambient=0.1,
                                 max_depth=2, light_sampler=light_sampler,
                                 **kw)


def test_point_light_degenerates_exactly():
    """Single-point emissive shape: area mode == deterministic mode,
    bit for bit."""
    host = _occluded_scene(light_tri=False)
    det = _render(host)
    area = _render(host, light_sampler="build")
    np.testing.assert_array_equal(det, area)


def test_build_light_sampler_tables():
    host = _occluded_scene(light_tri=True)
    dev, meta = scene_lib.build_device_scene(host)
    ls = lights_mod.build_light_sampler(host, dev, meta)
    assert ls is not None
    assert ls["cdf"].shape[0] == 1      # one emissive instance
    assert int(ls["n"][0]) == 1         # one triangle element
    # CDF total = triangle area
    shp = host.shapes[[i.shape for i in host.instances
                       if (host.materials[i.material].ke > 0).all()][0]]
    e1 = shp.pos[1] - shp.pos[0]
    e2 = shp.pos[2] - shp.pos[0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2))
    np.testing.assert_allclose(float(ls["cdf"][0, -1]), area, rtol=1e-5)


def test_sample_light_points_on_triangle():
    host = _occluded_scene(light_tri=True)
    dev, meta = scene_lib.build_device_scene(host)
    ls = lights_mod.build_light_sampler(host, dev, meta)
    devj = scene_lib.to_jax(dev)
    rng = np.random.default_rng(0)
    ruv = jnp.asarray(rng.uniform(0, 1, (256, 3)), jnp.float32)
    pts = np.asarray(lights_mod.sample_light_points(devj, ls, ruv))[0]
    # all samples on the light triangle's plane and inside its bbox
    shp = host.shapes[[i.shape for i in host.instances
                       if (host.materials[i.material].ke > 0).all()][0]]
    np.testing.assert_allclose(pts[:, 1], shp.pos[0][1], atol=1e-5)
    assert (pts[:, 0] >= shp.pos[:, 0].min() - 1e-5).all()
    assert (pts[:, 0] <= shp.pos[:, 0].max() + 1e-5).all()
    # spread across the area (not degenerate)
    assert pts[:, 0].std() > 0.1


def test_area_light_softens_shadows():
    """With an area light, shadow-edge pixels take INTERMEDIATE values
    (penumbra) that the point light cannot produce; the lit-region mean
    stays comparable (same total ke model)."""
    host = _occluded_scene(light_tri=True)
    det = np.asarray(_render(host))[..., :3]
    area = np.asarray(_render(host, light_sampler="build"))[..., :3]
    # images must differ (shadows moved/softened)
    assert np.abs(det - area).max() > 1e-3
    # overall brightness comparable (same ke/r^2 model, sampled vs fixed)
    assert abs(det.mean() - area.mean()) < 0.25 * max(det.mean(), 1e-3)


def test_area_mode_deterministic_per_seed():
    host = _occluded_scene(light_tri=True)
    a = _render(host, light_sampler="build", seed=3)
    b = _render(host, light_sampler="build", seed=3)
    np.testing.assert_array_equal(a, b)
