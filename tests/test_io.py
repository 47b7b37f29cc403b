"""Scene save paths (OBJ + glTF writers), glTF import, tangent space,
and graceful load errors.

Covers the reference capabilities: yobj::save_obj
(src/ext/yocto_obj.h:423-491), yscn::save_scene dispatch
(src/ext/yocto_scn.h:447-455), the glTF load path
(src/ext/yocto_scn.cpp:1497-1504 dispatch + gltf_to_scene 697-1099),
compute_tangent_space (src/scene.cpp:80-104, 217-222), and error behavior
on unknown extensions (yocto_scn.cpp:1502 throw).
"""

import json
import os
import struct

import numpy as np
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.io import gltf as gltf_mod


def _assert_scene_equal(a: scene_lib.HostScene, b: scene_lib.HostScene,
                        instance_aligned=False):
    """Compare two scenes instance-by-instance (shape ids may be permuted)."""
    assert len(a.instances) == len(b.instances)
    assert len(a.cameras) == len(b.cameras)
    for ia, ib in zip(a.instances, b.instances):
        sa, sb = a.shapes[ia.shape], b.shapes[ib.shape]
        np.testing.assert_allclose(sa.pos, sb.pos, rtol=0, atol=0)
        np.testing.assert_allclose(sa.norm, sb.norm, rtol=0, atol=1e-6)
        np.testing.assert_allclose(sa.texcoord, sb.texcoord, rtol=0, atol=0)
        np.testing.assert_array_equal(sa.triangles, sb.triangles)
        np.testing.assert_array_equal(sa.lines, sb.lines)
        np.testing.assert_array_equal(sa.points, sb.points)
        np.testing.assert_allclose(sa.radius, sb.radius, rtol=0, atol=0)
        np.testing.assert_allclose(ia.axes, ib.axes, rtol=0, atol=1e-6)
        np.testing.assert_allclose(ia.o, ib.o, rtol=0, atol=1e-5)
        ma, mb = a.materials[ia.material], b.materials[ib.material]
        np.testing.assert_allclose(ma.kd, mb.kd, rtol=0, atol=0)
        np.testing.assert_allclose(ma.ks, mb.ks, rtol=0, atol=0)
        np.testing.assert_allclose(ma.ke, mb.ke, rtol=0, atol=0)
        assert abs(ma.rs - mb.rs) < 1e-7
        assert (ma.kd_txt >= 0) == (mb.kd_txt >= 0)
        if ma.kd_txt >= 0:
            ta, tb = a.textures[ma.kd_txt], b.textures[mb.kd_txt]
            np.testing.assert_array_equal(ta.ldr, tb.ldr)
    for ca, cb in zip(a.cameras, b.cameras):
        np.testing.assert_allclose(ca.axes, cb.axes, rtol=0, atol=1e-6)
        np.testing.assert_allclose(ca.o, cb.o, rtol=0, atol=1e-5)
        assert abs(ca.yfov - cb.yfov) < 1e-6
        assert abs(ca.aspect - cb.aspect) < 1e-6


def _render_small(host, resolution=48, samples=1):
    from yocto_raytracing_tpu.render import renderer

    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, resolution)
    dscene, meta = scene_lib.build_device_scene(host)
    dscene = scene_lib.to_jax(dscene)
    return np.asarray(renderer.render_image(
        dscene, meta, width, resolution, samples=samples, ambient=0.1,
        max_depth=4))


# --------------------------------------------------------------------------
# OBJ writer round trip
# --------------------------------------------------------------------------


@needs_reference
def test_obj_roundtrip_simple(tmp_path):
    host = scene_lib.load_scene(reference_scene("simple"))
    scene_lib.save_scene(host, str(tmp_path / "rt.obj"))
    again = scene_lib.load_scene(str(tmp_path / "rt.obj"))
    _assert_scene_equal(host, again)
    # Kr must survive the MTL round trip too (refl scene)
    refl = scene_lib.load_scene(reference_scene("refl"))
    scene_lib.save_scene(refl, str(tmp_path / "refl.obj"))
    refl2 = scene_lib.load_scene(str(tmp_path / "refl.obj"))
    for ia, ib in zip(refl.instances, refl2.instances):
        np.testing.assert_allclose(refl.materials[ia.material].kr,
                                   refl2.materials[ib.material].kr)


def test_obj_roundtrip_hair_render(tmp_path):
    """Lines/points with per-vertex radius survive save->load->render."""
    from yocto_raytracing_tpu import testscenes

    host = testscenes.make_hair_scene(n_strands=32)
    img0 = _render_small(host)
    scene_lib.save_scene(host, str(tmp_path / "hair.obj"))
    again = scene_lib.load_scene(str(tmp_path / "hair.obj"))
    img1 = _render_small(again)
    np.testing.assert_allclose(img0, img1, rtol=0, atol=0)


# --------------------------------------------------------------------------
# glTF export/import
# --------------------------------------------------------------------------


@needs_reference
def test_gltf_roundtrip_simple(tmp_path):
    host = scene_lib.load_scene(reference_scene("simple"))
    scene_lib.save_scene(host, str(tmp_path / "rt.gltf"))
    again = scene_lib.load_scene(str(tmp_path / "rt.gltf"))
    _assert_scene_equal(host, again)


@needs_reference
def test_glb_roundtrip_simple(tmp_path):
    """r5: binary .glb container export (save_binary_gltf,
    src/ext/yocto_gltf.h:651) — save dispatch accepts .glb, the file is a
    valid GLB (magic/version/embedded BIN chunk), and it round-trips
    through the importer like the .gltf path."""
    host = scene_lib.load_scene(reference_scene("simple"))
    path = tmp_path / "rt.glb"
    scene_lib.save_scene(host, str(path))
    data = path.read_bytes()
    import struct

    magic, version, length = struct.unpack_from("<III", data, 0)
    assert magic == 0x46546C67 and version == 2 and length == len(data)
    assert not (tmp_path / "rt.bin").exists()  # BIN embedded, no sidecar
    again = scene_lib.load_scene(str(path))
    _assert_scene_equal(host, again)


def test_glb_roundtrip_hair_render(tmp_path):
    """.glb round-trip renders pixel-equal (lines + RADIUS through the
    binary container)."""
    from yocto_raytracing_tpu import testscenes

    host = testscenes.make_hair_scene(n_strands=16)
    scene_lib.save_scene(host, str(tmp_path / "hair.glb"))
    again = scene_lib.load_scene(str(tmp_path / "hair.glb"))
    np.testing.assert_allclose(_render_small(host), _render_small(again),
                               rtol=0, atol=0)


@needs_reference
def test_gltf_render_matches_obj_twin(tmp_path):
    """The glTF twin of the simple scene renders pixel-equal to the OBJ."""
    host = scene_lib.load_scene(reference_scene("simple"))
    img0 = _render_small(host)
    scene_lib.save_scene(host, str(tmp_path / "twin.gltf"))
    again = scene_lib.load_scene(str(tmp_path / "twin.gltf"))
    img1 = _render_small(again)
    np.testing.assert_allclose(img0, img1, rtol=0, atol=0)


def test_gltf_roundtrip_hair(tmp_path):
    """Lines + RADIUS attribute through the glTF path."""
    from yocto_raytracing_tpu import testscenes

    host = testscenes.make_hair_scene(n_strands=16)
    scene_lib.save_scene(host, str(tmp_path / "hair.gltf"))
    again = scene_lib.load_scene(str(tmp_path / "hair.gltf"))
    img0 = _render_small(host)
    img1 = _render_small(again)
    np.testing.assert_allclose(img0, img1, rtol=0, atol=0)


def test_gltf_primitive_mode_expansion():
    """Strip/fan/loop index expansion (yocto_scn.cpp:925-1030)."""
    idx = np.arange(5)
    _, _, fan = gltf_mod._expand_indices(gltf_mod.MODE_TRIANGLE_FAN, idx, 5)
    np.testing.assert_array_equal(
        fan, [[0, 1, 2], [0, 2, 3], [0, 3, 4]])
    _, _, strip = gltf_mod._expand_indices(
        gltf_mod.MODE_TRIANGLE_STRIP, idx, 5)
    np.testing.assert_array_equal(
        strip, [[0, 1, 2], [1, 2, 3], [2, 3, 4]])
    # the reference REWRITES the strip's last segment to wrap
    # (yocto_scn.cpp:955-961: lines.back() = {last, first})
    _, loop, _ = gltf_mod._expand_indices(gltf_mod.MODE_LINE_LOOP, idx, 5)
    np.testing.assert_array_equal(
        loop, [[0, 1], [1, 2], [2, 3], [4, 0]])
    _, lstrip, _ = gltf_mod._expand_indices(gltf_mod.MODE_LINE_STRIP, idx, 5)
    np.testing.assert_array_equal(lstrip, [[0, 1], [1, 2], [2, 3], [3, 4]])
    pts, _, _ = gltf_mod._expand_indices(gltf_mod.MODE_POINTS, None, 3)
    np.testing.assert_array_equal(pts, [0, 1, 2])


def test_gltf_node_hierarchy_and_trs(tmp_path):
    """Nested nodes compose T*R*S (yocto_gltf.cpp:2586-2590)."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    blob = pos.tobytes()
    g = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64,"
                     + __import__("base64").b64encode(blob).decode(),
                     "byteLength": len(blob)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(blob)}],
        "accessors": [{"bufferView": 0, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [
            {"children": [1], "translation": [1, 2, 3]},
            {"mesh": 0, "scale": [2, 2, 2],
             "rotation": [0, 0, 0.7071068, 0.7071068]},  # 90deg about z
        ],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    path = tmp_path / "trs.gltf"
    path.write_text(json.dumps(g))
    host = scene_lib.load_scene(str(path))
    assert len(host.instances) == 1
    ist = host.instances[0]
    # world = T(1,2,3) . Rz(90) . S(2): point (1,0,0) -> (0,2,0)*1 + t
    p = pos[1] @ ist.axes + ist.o
    np.testing.assert_allclose(p, [1, 4, 3], atol=1e-5)


def test_glb_container(tmp_path):
    """GLB: JSON chunk + BIN chunk (KHR_binary equivalent)."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    blob = pos.tobytes()
    g = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(blob)}],
        "accessors": [{"bufferView": 0, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    js = json.dumps(g).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk = blob + b"\0" * (-len(blob) % 4)
    payload = (struct.pack("<II", len(js), 0x4E4F534A) + js
               + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + len(payload)) + payload
    path = tmp_path / "tri.glb"
    path.write_bytes(glb)
    host = scene_lib.load_scene(str(path))
    assert len(host.shapes) == 1
    np.testing.assert_array_equal(host.shapes[0].pos, pos)
    np.testing.assert_array_equal(host.shapes[0].triangles, [[0, 1, 2]])


def test_gltf_interleaved_and_normalized(tmp_path):
    """byteStride-interleaved accessors and normalized u8 attributes."""
    # interleave pos (vec3 f32) + pad (f32) per vertex: stride 16
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    inter = np.concatenate([pos, np.zeros((3, 1), np.float32)], 1).tobytes()
    g = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64,"
                     + __import__("base64").b64encode(inter).decode(),
                     "byteLength": len(inter)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(inter), "byteStride": 16}],
        "accessors": [{"bufferView": 0, "componentType": 5126,
                       "count": 3, "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    path = tmp_path / "inter.gltf"
    path.write_text(json.dumps(g))
    host = scene_lib.load_scene(str(path))
    np.testing.assert_array_equal(host.shapes[0].pos, pos)


# --------------------------------------------------------------------------
# tangent space (src/scene.cpp:80-104, 217-222)
# --------------------------------------------------------------------------


def test_tangent_space_axis_aligned_quad():
    """A quad with identity uv mapping gets tangent=+x, sign=+1."""
    shp = scene_lib.HostShape(
        name="quad",
        pos=np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32),
        norm=np.tile(np.array([0, 0, 1], np.float32), (4, 1)),
        texcoord=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        radius=np.zeros(4, np.float32),
        points=np.zeros(0, np.int32),
        lines=np.zeros((0, 2), np.int32),
        triangles=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    tangsp = scene_lib.compute_tangent_space(shp)
    assert tangsp.shape == (4, 4)
    np.testing.assert_allclose(tangsp[:, :3],
                               np.tile([1, 0, 0], (4, 1)), atol=1e-6)
    np.testing.assert_allclose(tangsp[:, 3], 1.0)
    # orthonormal to the normal
    assert np.abs((tangsp[:, :3] * shp.norm).sum(-1)).max() < 1e-6


def test_tangent_space_degenerate_uv_fallback():
    """div <= 0 falls back to the canonical frame (src/scene.cpp:75-77)."""
    shp = scene_lib.HostShape(
        name="degen",
        pos=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        norm=np.tile(np.array([0, 0, 1], np.float32), (3, 1)),
        texcoord=np.zeros((3, 2), np.float32),  # uv determinant = 0
        radius=np.zeros(3, np.float32),
        points=np.zeros(0, np.int32),
        lines=np.zeros((0, 2), np.int32),
        triangles=np.array([[0, 1, 2]], np.int32),
    )
    tangsp = scene_lib.compute_tangent_space(shp)
    np.testing.assert_allclose(tangsp[:, :3],
                               np.tile([1, 0, 0], (3, 1)), atol=1e-6)


@needs_reference
def test_tangent_space_computed_only_for_normal_mapped():
    """finalize_scene computes tangsp iff the material has a normal map
    (src/scene.cpp:217-222); reference scenes have none."""
    host = scene_lib.load_scene(reference_scene("simple"))
    assert all(len(s.tangsp) == 0 for s in host.shapes)
    # force a normal map onto the floor's material -> tangsp appears
    host.materials[host.instances[0].material].norm_txt = 0
    scene_lib.finalize_scene(host)
    shp = host.shapes[host.instances[0].shape]
    assert len(shp.tangsp) == len(shp.pos)
    dots = (shp.tangsp[:, :3] * shp.norm).sum(-1)
    assert np.abs(dots).max() < 1e-5


# --------------------------------------------------------------------------
# graceful load errors
# --------------------------------------------------------------------------


def test_load_unknown_extension(tmp_path):
    p = tmp_path / "scene.ply"
    p.write_text("ply")
    with pytest.raises(scene_lib.SceneLoadError, match="unsupported"):
        scene_lib.load_scene(str(p))


def test_load_missing_file():
    with pytest.raises(scene_lib.SceneLoadError, match="not found"):
        scene_lib.load_scene("/nonexistent/scene.obj")


def test_save_unknown_extension(tmp_path):
    from yocto_raytracing_tpu import testscenes

    host = testscenes.make_hair_scene(n_strands=4)
    with pytest.raises(scene_lib.SceneLoadError, match="unsupported"):
        scene_lib.save_scene(host, str(tmp_path / "scene.usd"))


def test_load_malformed_gltf(tmp_path):
    p = tmp_path / "bad.gltf"
    p.write_text("{not json")
    with pytest.raises(ValueError, match="malformed"):
        scene_lib.load_scene(str(p))


def test_load_missing_texture(tmp_path):
    obj = tmp_path / "scene.obj"
    mtl = tmp_path / "scene.mtl"
    mtl.write_text("newmtl m\nKd 0.5 0.5 0.5\nmap_Kd missing.png\n")
    obj.write_text("mtllib scene.mtl\nusemtl m\n"
                   "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    with pytest.raises(scene_lib.SceneLoadError, match="texture"):
        scene_lib.load_scene(str(obj))
