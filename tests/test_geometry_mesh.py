"""Mesh utilities (geometry.py): edge maps, tesselation, Catmull-Clark,
parametric generation, merging — ym yocto_math.h:3793-4480 parity."""

import numpy as np

from yocto_raytracing_tpu import geometry as geo


def test_element_geometry_helpers():
    """vmath.h:225-245 parity: normals/areas/tangents/lengths/volume."""
    v0 = np.asarray([0, 0, 0], np.float32)
    v1 = np.asarray([1, 0, 0], np.float32)
    v2 = np.asarray([0, 1, 0], np.float32)
    v3 = np.asarray([0, 0, 1], np.float32)
    np.testing.assert_allclose(geo.triangle_normal(v0, v1, v2), [0, 0, 1])
    np.testing.assert_allclose(geo.triangle_area(v0, v1, v2), 0.5)
    np.testing.assert_allclose(geo.line_tangent(v0, v1), [1, 0, 0])
    np.testing.assert_allclose(geo.line_length(v0, 2 * v1), 2.0)
    np.testing.assert_allclose(geo.tetrahedron_volume(v0, v1, v2, v3),
                               1 / 6, rtol=1e-6)
    # signed: swapping two verts flips the sign
    np.testing.assert_allclose(geo.tetrahedron_volume(v0, v2, v1, v3),
                               -1 / 6, rtol=1e-6)
    # batched
    a = geo.triangle_area(np.stack([v0, v0]), np.stack([v1, 2 * v1]),
                          np.stack([v2, 2 * v2]))
    np.testing.assert_allclose(a, [0.5, 2.0])


def test_quads_to_triangles():
    q = np.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], np.int32)
    t = geo.quads_to_triangles(q)
    np.testing.assert_array_equal(
        t, [[0, 1, 3], [2, 3, 1], [4, 5, 7], [6, 7, 5]])


def test_edge_map_first_seen_order():
    tris = np.asarray([[0, 1, 2], [2, 1, 3]], np.int32)
    edges, ids = geo.edge_map(tris)
    # 5 unique edges; shared edge (1,2) counted once
    assert len(edges) == 5
    np.testing.assert_array_equal(edges[0], [0, 1])   # first seen
    np.testing.assert_array_equal(edges[1], [1, 2])
    assert ids[(1, 2)] == 1
    assert ids[(1, 3)] in range(5)


def test_tesselate_lines():
    lines = np.asarray([[0, 1]], np.int32)
    verts = dict(pos=np.asarray([[0, 0, 0], [2, 0, 0]], np.float32),
                 radius=np.asarray([1.0, 3.0], np.float32))
    nl, nv = geo.tesselate_lines(lines, verts)
    assert nl.shape == (2, 2)
    np.testing.assert_allclose(nv["pos"][2], [1, 0, 0])
    np.testing.assert_allclose(nv["radius"][2], 2.0)
    np.testing.assert_array_equal(nl, [[0, 2], [2, 1]])


def test_tesselate_triangles_counts_and_midpoints():
    tris = np.asarray([[0, 1, 2]], np.int32)
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nt, nv = geo.tesselate_triangles(tris, dict(pos=pos))
    assert nt.shape == (4, 3)
    assert len(nv["pos"]) == 6
    mids = nv["pos"][3:]
    want = {(0.5, 0.0, 0.0), (0.5, 0.5, 0.0), (0.0, 0.5, 0.0)}
    got = {tuple(np.round(m, 6)) for m in mids}
    assert got == want
    # subdivided triangles tile the original: total area preserved
    def area(t):
        a, b, c = nv["pos"][t]
        return 0.5 * np.linalg.norm(np.cross(b - a, c - a))
    np.testing.assert_allclose(sum(area(t) for t in nt), 0.5, rtol=1e-6)


def test_tesselate_quads_degenerate():
    # one true quad + one degenerate (triangle-as-quad)
    q = np.asarray([[0, 1, 2, 3], [0, 1, 4, 4]], np.int32)
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [2, 0, 0]], np.float32)
    nq, nv = geo.tesselate_quads(q, dict(pos=pos))
    assert nq.shape == (7, 4)      # 4 + 3
    # quad face point = centroid of 4; degenerate = centroid of 3
    fpts = nv["pos"][-2:]
    np.testing.assert_allclose(fpts[0], [0.5, 0.5, 0.0])
    np.testing.assert_allclose(fpts[1], [1.0, 0.0, 0.0])


def test_catmullclark_smooths_cube_toward_center():
    # unit cube: after one CC step vertex positions pull inward
    pos = np.asarray([[x, y, z] for z in (0, 1) for y in (0, 1)
                      for x in (0, 1)], np.float32)
    quads = np.asarray([
        [0, 1, 3, 2], [4, 6, 7, 5], [0, 4, 5, 1],
        [2, 3, 7, 6], [0, 2, 6, 4], [1, 5, 7, 3]], np.int32)
    nq, nv = geo.tesselate_catmullclark(quads, dict(pos=pos))
    assert nq.shape == (24, 4)
    center = np.asarray([0.5, 0.5, 0.5])
    r_orig = np.linalg.norm(pos - center, axis=1).max()
    r_new = np.linalg.norm(nv["pos"] - center, axis=1).max()
    assert r_new < r_orig  # smoothing pulls the cube toward the sphere
    # and the mesh stays centered
    np.testing.assert_allclose(nv["pos"].mean(axis=0), center, atol=1e-6)


def test_make_faces_triangles_and_quads():
    def pos_fn(uv):
        return np.concatenate([uv, np.zeros_like(uv[:, :1])], axis=1)

    tris, pos, norm, tc = geo.make_faces(2, 3, pos_fn, as_triangles=True)
    assert pos.shape == (3 * 4, 3)
    assert tris.shape == (2 * 3 * 2, 3)
    np.testing.assert_allclose(tc, pos[:, :2])
    # alternating diagonal rule: cell (0,0) even, cell (1,0) odd
    np.testing.assert_array_equal(tris[0], [0, 1, 3])
    np.testing.assert_array_equal(tris[2], [1, 2, 5])
    quads, *_ = geo.make_faces(2, 2, pos_fn, as_triangles=False)
    assert quads.shape == (4, 4)
    np.testing.assert_array_equal(quads[0], [0, 1, 4, 3])


def test_make_lines_and_points():
    lines, pos, tang, tc, rad = geo.make_lines(
        3, 4, lambda j, u: np.stack([u, j.astype(np.float32),
                                     np.zeros_like(u)], axis=-1))
    assert lines.shape == (12, 2)
    assert pos.shape == (15, 3)
    # each polyline is connected
    np.testing.assert_array_equal(lines[0], [0, 1])
    np.testing.assert_array_equal(lines[4], [5, 6])

    pts, pos, norm, tc, rad = geo.make_points(
        5, lambda i: np.stack([i.astype(np.float32), np.zeros(5),
                               np.zeros(5)], axis=-1))
    np.testing.assert_array_equal(pts, np.arange(5))
    assert pos.shape == (5, 3) and rad.shape == (5,)


def test_merge_meshes():
    ta = np.asarray([[0, 1, 2]], np.int32)
    va = dict(pos=np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32))
    tb = np.asarray([[0, 1, 2]], np.int32)
    vb = dict(pos=np.asarray([[5, 0, 0], [6, 0, 0], [5, 1, 0]], np.float32))
    elems, verts = geo.merge_meshes(ta, va, tb, vb)
    assert elems.shape == (2, 3)
    np.testing.assert_array_equal(elems[1], [3, 4, 5])
    assert len(verts["pos"]) == 6


def test_tesselated_mesh_renders():
    """End-to-end: a tesselated shape goes through the full render path."""
    import jax.numpy as jnp

    from yocto_raytracing_tpu import scene as scene_lib, testscenes
    from yocto_raytracing_tpu.render import renderer

    host = testscenes.make_random_scene(seed=4, n_instances=1, n_shapes=1,
                                        n_lines=0, n_points=0, n_tris=4)
    shp = host.shapes[0]
    nt, nv = geo.tesselate_triangles(
        shp.triangles, dict(pos=shp.pos,
                            texcoord=shp.texcoord,
                            radius=shp.radius))
    shp.triangles = nt
    shp.pos = nv["pos"].astype(np.float32)
    shp.texcoord = nv["texcoord"].astype(np.float32)
    shp.radius = nv["radius"].astype(np.float32)
    shp.norm = np.zeros((0, 3), np.float32)
    scene_lib.finalize_scene(host)
    dev, meta = scene_lib.build_device_scene(host)
    img = renderer.render_image(scene_lib.to_jax(dev), meta, 16, 16,
                                samples=1, ambient=0.3, max_depth=1)
    assert np.isfinite(img).all()
