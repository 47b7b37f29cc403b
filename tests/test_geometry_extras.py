"""Tetrahedra, quad intersection, keyframe animation, overlap queries.

The reference's dead-but-present geometry capabilities (VERDICT round-2
close-out list): OBJ 't' parsing (src/ext/yocto_obj.cpp:436-441),
ym::intersect_quad/tetrahedron (src/ext/yocto_math.h:5682-5743), keyframe
playback (src/scene.cpp:35-49), and the point-overlap/closest-point API
(src/ext/yocto_math.h:5836-6017, yocto_scn.cpp:1920-1985).
"""

import numpy as np
import jax.numpy as jnp

from yocto_raytracing_tpu import animation as anim_mod
from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.io import objparser
from yocto_raytracing_tpu.ops import intersect as isect, overlap


# --------------------------------------------------------------------------
# OBJ tetra parsing
# --------------------------------------------------------------------------


def test_obj_parses_tetrahedra(tmp_path):
    obj = tmp_path / "tet.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "t 1 2 3 4\n"
        "f 1 2 3\n")
    scn = objparser.load_obj(str(obj))
    assert len(scn.shapes) == 1
    shp = scn.shapes[0]
    np.testing.assert_array_equal(shp.tetrahedra, [[0, 1, 2, 3]])
    np.testing.assert_array_equal(shp.triangles, [[0, 1, 2]])
    # flows through load_scene into the HostShape field (src/scene.h:44)
    host = scene_lib.load_scene(str(obj))
    assert host.shapes[0].tetrahedra.shape == (1, 4)


# --------------------------------------------------------------------------
# quad / tetra intersectors vs their defining triangle decompositions
# --------------------------------------------------------------------------


def _ray_grid(n=64, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    ro[:, 2] = 3.0
    rd = np.tile(np.asarray([[0, 0, -1.0]], np.float32), (n, 1))
    jitter = rng.normal(scale=0.2, size=(n, 3)).astype(np.float32)
    rd = (rd + jitter) / np.linalg.norm(rd + jitter, axis=-1, keepdims=True)
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, 3.4e38, np.float32)
    return map(jnp.asarray, (ro, rd, tmin, tmax))


def test_intersect_quad_matches_two_triangles():
    v0 = jnp.asarray([-1.0, -1.0, 0.0])
    v1 = jnp.asarray([1.0, -1.0, 0.0])
    v2 = jnp.asarray([1.0, 1.0, 0.0])
    v3 = jnp.asarray([-1.0, 1.0, 0.0])
    ro, rd, tmin, tmax = _ray_grid()
    hit, t, euv = isect.intersect_quad(ro, rd, tmin, tmax, v0, v1, v2, v3)
    h1, t1, *_ = isect.intersect_triangle(ro, rd, tmin, tmax, v0, v1, v3)
    h2, t2, *_ = isect.intersect_triangle(ro, rd, tmin, tmax, v2, v3, v1)
    np.testing.assert_array_equal(np.asarray(hit), np.asarray(h1 | h2))
    # planar quad: each ray hits exactly one of the two triangles
    both = np.asarray(h1 & h2)
    want_t = np.where(np.asarray(h2), np.asarray(t2), np.asarray(t1))
    np.testing.assert_allclose(np.asarray(t)[~both], want_t[~both], rtol=0)
    # barycentrics sum to 1 on hits
    s = np.asarray(jnp.sum(euv, axis=-1))[np.asarray(hit)]
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_intersect_tetrahedron_nearest_face():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    v3 = jnp.asarray([0.0, 0.0, 1.0])
    ro, rd, tmin, tmax = _ray_grid(seed=3)
    hit, t = isect.intersect_tetrahedron(ro, rd, tmin, tmax, v0, v1, v2, v3)
    # oracle: min over the reference's four face tests
    faces = [(v0, v1, v2), (v0, v1, v3), (v0, v2, v3), (v1, v2, v3)]
    ts = []
    hs = []
    for a, b, c in faces:
        h, tf, *_ = isect.intersect_triangle(ro, rd, tmin, tmax, a, b, c)
        hs.append(np.asarray(h))
        ts.append(np.asarray(tf))
    any_h = np.any(hs, axis=0)
    t_min = np.min(ts, axis=0)
    np.testing.assert_array_equal(np.asarray(hit), any_h)
    np.testing.assert_allclose(np.asarray(t)[any_h], t_min[any_h], rtol=0)
    assert any_h.any()


# --------------------------------------------------------------------------
# keyframe animation (src/scene.cpp:35-49)
# --------------------------------------------------------------------------


def test_update_animation_stepwise_index():
    # int(time/dt) % n with C truncation
    assert anim_mod.keyframe_index(0.0, 1 / 60, 4) == 0
    assert anim_mod.keyframe_index(1 / 60 * 1.5, 1 / 60, 4) == 1
    assert anim_mod.keyframe_index(1 / 60 * 9, 1 / 60, 4) == 1
    idx = anim_mod.keyframe_index(np.asarray([0.0, 0.02, 0.1]), 1 / 60, 4)
    np.testing.assert_array_equal(idx, [0, 1, 2])


def test_animation_roundtrip_and_playback():
    host = testscenes.make_random_scene(seed=0)
    anim = anim_mod.Animation(delta_t=0.5)
    ist = host.instances[0]
    base_o = ist.o.copy()
    base_pos = host.shapes[ist.shape].pos.copy()
    # keyframe 0 = current state; keyframe 1 = shifted
    anim_mod.add_keyframe(host, 0, anim)
    ist.o = base_o + np.float32(1.0)
    host.shapes[ist.shape].pos = base_pos + np.float32(2.0)
    anim_mod.add_keyframe(host, 0, anim)
    assert anim.num_keyframes == 2

    anim_mod.update_animation(host, 0, anim, time=0.0)
    np.testing.assert_array_equal(host.instances[0].o, base_o)
    np.testing.assert_array_equal(host.shapes[ist.shape].pos, base_pos)
    anim_mod.update_animation(host, 0, anim, time=0.6)
    np.testing.assert_array_equal(host.instances[0].o, base_o + 1.0)
    # modulo wrap: time past the last keyframe loops (src/scene.cpp:38)
    anim_mod.update_animation(host, 0, anim, time=1.1)
    np.testing.assert_array_equal(host.instances[0].o, base_o)

    axes, o, pos, norm = anim_mod.stack_tracks(anim)
    assert axes.shape == (2, 3, 3) and o.shape == (2, 3)
    assert pos.shape[0] == 2 and norm.shape[0] == 2


# --------------------------------------------------------------------------
# overlap / closest point
# --------------------------------------------------------------------------


def test_closestuv_triangle_cases():
    v0 = jnp.asarray([0.0, 0.0, 0.0])
    v1 = jnp.asarray([1.0, 0.0, 0.0])
    v2 = jnp.asarray([0.0, 1.0, 0.0])
    # interior point -> face case barycentrics
    uv = np.asarray(overlap.closestuv_triangle(
        jnp.asarray([0.25, 0.25, 1.0]), v0, v1, v2))
    np.testing.assert_allclose(uv, [0.5, 0.25, 0.25], atol=1e-6)
    # beyond each corner -> corner case
    for p, want in [([-1, -1, 0], [1, 0, 0]), ([2, 0, 0], [0, 1, 0]),
                    ([0, 2, 0], [0, 0, 1])]:
        uv = np.asarray(overlap.closestuv_triangle(
            jnp.asarray(p, jnp.float32), v0, v1, v2))
        np.testing.assert_allclose(uv, want, atol=1e-6)
    # edge projections
    uv = np.asarray(overlap.closestuv_triangle(
        jnp.asarray([0.5, -1.0, 0.0]), v0, v1, v2))
    np.testing.assert_allclose(uv, [0.5, 0.5, 0.0], atol=1e-6)


def _brute_closest(host, q, dist_max):
    """Brute-force oracle: min local-space distance over all elements,
    acceptance ``d <= dist_max + element_radius`` like the overlap_* tests."""
    best = (False, np.float32(np.inf), -1, -1)

    def consider(ok, d, ii, ei, best):
        if ok and d <= best[1]:
            return (True, np.float32(d), ii, ei)
        return best

    for ii, ist in enumerate(host.instances):
        shp = host.shapes[ist.shape]
        lp = jnp.asarray((q - ist.o) @ ist.axes.T, jnp.float32)
        ei = 0
        for pt in shp.points:
            ok, d = overlap.overlap_point(lp, dist_max,
                                          jnp.asarray(shp.pos[pt]),
                                          float(shp.radius[pt]))
            best = consider(bool(ok), float(d), ii, ei, best)
            ei += 1
        for ln in shp.lines:
            ok, d, _ = overlap.overlap_line(
                lp, dist_max, jnp.asarray(shp.pos[ln[0]]),
                jnp.asarray(shp.pos[ln[1]]), float(shp.radius[ln[0]]),
                float(shp.radius[ln[1]]))
            best = consider(bool(ok), float(d), ii, ei, best)
            ei += 1
        for tri in shp.triangles:
            a, b, c = (jnp.asarray(shp.pos[k]) for k in tri)
            r0, r1, r2 = (float(shp.radius[k]) for k in tri)
            ok, d, _ = overlap.overlap_triangle(lp, dist_max, a, b, c,
                                                r0, r1, r2)
            best = consider(bool(ok), float(d), ii, ei, best)
            ei += 1
    return best


def test_overlap_scene_matches_brute():
    host = testscenes.make_random_scene(seed=2)
    dev, meta = scene_lib.build_device_scene(host)
    dev_j = scene_lib.to_jax(dev)
    rng = np.random.default_rng(0)
    qs = rng.uniform(-3, 3, (16, 3)).astype(np.float32)
    out = overlap.overlap_scene(dev_j, meta, jnp.asarray(qs), 10.0)
    found = np.asarray(out["found"])
    dist = np.asarray(out["dist"])
    for k, q in enumerate(qs):
        bf, bd, bi, bt = _brute_closest(host, q, 10.0)
        assert found[k] == bf, k
        if bf:
            np.testing.assert_allclose(dist[k], bd, rtol=1e-5, atol=1e-6)


def test_overlap_scene_respects_dist_max():
    host = testscenes.make_random_scene(seed=2)
    dev, meta = scene_lib.build_device_scene(host)
    dev_j = scene_lib.to_jax(dev)
    q = jnp.asarray([[100.0, 100.0, 100.0]], jnp.float32)
    out = overlap.overlap_scene(dev_j, meta, q, 1.0)
    assert not bool(out["found"][0])
    assert int(out["inst"][0]) == -1


def test_overlap_primitive_helpers():
    # point vs point
    ok, d = overlap.overlap_point(jnp.asarray([0.0, 0.0, 3.0]), 5.0,
                                  jnp.asarray([0.0, 0.0, 0.0]), 0.5)
    assert bool(ok) and abs(float(d) - 3.0) < 1e-6
    # line: closest to the middle of a segment
    ok, d, uv = overlap.overlap_line(
        jnp.asarray([0.5, 1.0, 0.0]), 5.0,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        0.0, 0.0)
    assert bool(ok) and abs(float(d) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(uv), [0.5, 0.5], atol=1e-6)
    # quad: either triangle half accepts
    ok, d, euv = overlap.overlap_quad(
        jnp.asarray([0.25, 0.25, 2.0]), 5.0,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([1.0, 1.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0]),
        0.0, 0.0, 0.0, 0.0)
    assert bool(ok) and abs(float(d) - 2.0) < 1e-6
    # tetra: interior -> dist 0
    ok, d = overlap.overlap_tetrahedron(
        jnp.asarray([0.1, 0.1, 0.1]), 5.0,
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0]),
        0.0, 0.0, 0.0, 0.0)
    assert bool(ok) and float(d) == 0.0
    # bbox distance + overlap
    assert bool(overlap.distance_check_bbox(
        jnp.asarray([2.0, 0.0, 0.0]), 1.5,
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])))
    assert not bool(overlap.distance_check_bbox(
        jnp.asarray([3.0, 0.0, 0.0]), 1.5,
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0])))
    assert bool(overlap.overlap_bbox(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([2.0, 2.0, 2.0]),
        jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray([3.0, 3.0, 3.0])))
