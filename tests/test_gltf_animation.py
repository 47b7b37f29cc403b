"""glTF animation / skinning / morph-target import and playback.

Parity target: the ygltf animation layer (src/ext/yocto_gltf.h:528-636;
eval at src/ext/yocto_gltf.cpp:3988-4160) — keyframe channels over node
TRS and morph weights, step/linear interpolation with end clamping, skin
joint matrices. The reference's spline arms are empty (its "TODO: spline
animation", yocto_gltf.cpp:63); our CUBICSPLINE follows the glTF spec.
"""

import base64
import json

import numpy as np

from yocto_raytracing_tpu.io import gltf as gltf_mod


def _b64(arr: np.ndarray) -> str:
    raw = np.ascontiguousarray(arr).tobytes()
    return ("data:application/octet-stream;base64,"
            + base64.b64encode(raw).decode())


def _write_animated_gltf(path, interp="LINEAR"):
    """One triangle, node animated: translation keys (0,0,0)->(2,0,0) over
    t in [0, 1]; a second rotation channel with STEP; one morph target."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    times = np.asarray([0.0, 1.0], np.float32)
    trans = np.asarray([[0, 0, 0], [2, 0, 0]], np.float32)
    rots = np.asarray([[0, 0, 0, 1],
                       [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]],
                      np.float32)
    morph = np.asarray([[0, 0, 1], [0, 0, 1], [0, 0, 1]], np.float32)
    weights_anim = np.asarray([0.0, 1.0], np.float32)

    def buf(arr):
        return dict(uri=_b64(arr), byteLength=arr.nbytes)

    buffers = [buf(pos), buf(idx), buf(times), buf(trans), buf(rots),
               buf(morph), buf(weights_anim)]
    views = [dict(buffer=i, byteOffset=0, byteLength=buffers[i]["byteLength"])
             for i in range(len(buffers))]
    accessors = [
        dict(bufferView=0, componentType=5126, count=3, type="VEC3",
             min=pos.min(0).tolist(), max=pos.max(0).tolist()),
        dict(bufferView=1, componentType=5123, count=3, type="SCALAR"),
        dict(bufferView=2, componentType=5126, count=2, type="SCALAR"),
        dict(bufferView=3, componentType=5126, count=2, type="VEC3"),
        dict(bufferView=4, componentType=5126, count=2, type="VEC4"),
        dict(bufferView=5, componentType=5126, count=3, type="VEC3"),
        dict(bufferView=6, componentType=5126, count=2, type="SCALAR"),
    ]
    g = dict(
        asset=dict(version="2.0"),
        scene=0,
        scenes=[dict(nodes=[0])],
        nodes=[dict(mesh=0, name="tri")],
        meshes=[dict(primitives=[dict(
            attributes=dict(POSITION=0), indices=1,
            targets=[dict(POSITION=5)])],
            weights=[0.25])],
        buffers=buffers,
        bufferViews=views,
        accessors=accessors,
        animations=[dict(
            name="move",
            samplers=[
                dict(input=2, output=3, interpolation=interp),
                dict(input=2, output=4, interpolation="STEP"),
                dict(input=2, output=6, interpolation="LINEAR"),
            ],
            channels=[
                dict(sampler=0, target=dict(node=0, path="translation")),
                dict(sampler=1, target=dict(node=0, path="rotation")),
                dict(sampler=2, target=dict(node=0, path="weights")),
            ])],
    )
    with open(path, "w") as f:
        json.dump(g, f)


def test_animation_channels_parsed(tmp_path):
    p = tmp_path / "anim.gltf"
    _write_animated_gltf(str(p))
    host, graph = gltf_mod.load_gltf(str(p), return_graph=True)
    assert len(host.instances) == 1
    assert len(graph.channels) == 3
    paths = sorted(ch["path"] for ch in graph.channels)
    assert paths == ["rotation", "translation", "weights"]
    lo, hi = gltf_mod.animation_bounds(graph)
    assert lo == 0.0 and hi == 1.0
    # morph target recorded with its rest weight
    assert 0 in graph.shape_morphs
    assert graph.shape_morphs[0][0]["weight"] == 0.25


def test_translation_linear_and_clamp(tmp_path):
    p = tmp_path / "anim.gltf"
    _write_animated_gltf(str(p))
    host, graph = gltf_mod.load_gltf(str(p), return_graph=True)
    ch = next(c for c in graph.channels if c["path"] == "translation")
    # clamp before first / after last (yocto_gltf.cpp:3996-4002)
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, -1.0), [0, 0, 0])
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, 9.0), [2, 0, 0])
    # linear midpoint
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, 0.5), [1, 0, 0],
                               atol=1e-6)

    # playback moves the instance frame
    gltf_mod.update_animated_transforms(graph, 0.5)
    gltf_mod.apply_graph_transforms(graph, host)
    np.testing.assert_allclose(host.instances[0].o, [1, 0, 0], atol=1e-6)
    # rotation channel is STEP: at 0.5 the left key (identity) holds
    np.testing.assert_allclose(host.instances[0].axes, np.eye(3), atol=1e-6)
    gltf_mod.update_animated_transforms(graph, 1.0)
    gltf_mod.apply_graph_transforms(graph, host)
    # 90-degree z rotation: frame x axis becomes +y (column-vector M,
    # axes rows are the transformed basis)
    np.testing.assert_allclose(host.instances[0].axes[0], [0, 1, 0],
                               atol=1e-6)


def test_rotation_slerp_midpoint():
    qa = np.asarray([0, 0, 0, 1], np.float32)
    qb = np.asarray([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)
    mid = gltf_mod._slerp(qa, qb, 0.5)
    want = np.asarray([0, 0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
    np.testing.assert_allclose(mid, want, atol=1e-6)


def test_morph_weights_playback(tmp_path):
    p = tmp_path / "anim.gltf"
    _write_animated_gltf(str(p))
    host, graph = gltf_mod.load_gltf(str(p), return_graph=True)
    gltf_mod.update_animated_transforms(graph, 0.5)
    weights = graph.nodes[0]["weights"]
    np.testing.assert_allclose(weights, [0.5], atol=1e-6)
    pos, norm, tangsp = gltf_mod.morph_vertices(
        host.shapes[0], graph.shape_morphs[0], weights)
    np.testing.assert_allclose(pos[:, 2], 0.5, atol=1e-6)
    # zero weight -> rest positions
    pos0, *_ = gltf_mod.morph_vertices(host.shapes[0],
                                       graph.shape_morphs[0], [0.0])
    np.testing.assert_allclose(pos0, host.shapes[0].pos)


def test_cubicspline_matches_endpoints(tmp_path):
    p = tmp_path / "anim.gltf"
    # CUBICSPLINE output needs (in, value, out) triplets per key
    _write_animated_gltf(str(p))
    host, graph = gltf_mod.load_gltf(str(p), return_graph=True)
    ch = dict(next(c for c in graph.channels if c["path"] == "translation"))
    k = np.zeros((2, 3, 3), np.float32)
    k[0, 1] = [0, 0, 0]
    k[1, 1] = [2, 0, 0]
    ch["interp"] = "CUBICSPLINE"
    ch["values"] = k
    # zero tangents: hermite hits both endpoints and eases between
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, 0.0), [0, 0, 0])
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, 1.0), [2, 0, 0])
    np.testing.assert_allclose(gltf_mod.sample_channel(ch, 0.5), [1, 0, 0],
                               atol=1e-6)


def test_skinning_identity_and_translation():
    # 2 joints: joint 0 identity, joint 1 translates +1 in x
    xf = np.stack([np.eye(4, dtype=np.float32),
                   np.eye(4, dtype=np.float32)])
    xf[1, 0, 3] = 1.0
    pos = np.asarray([[0, 0, 0], [1, 1, 1]], np.float32)
    joints = np.asarray([[0, 0, 0, 0], [1, 0, 0, 0]], np.int32)
    weights = np.asarray([[1, 0, 0, 0], [1, 0, 0, 0]], np.float32)
    out = np.asarray(gltf_mod.skin_vertices(pos, joints, weights, xf))
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [2, 1, 1], atol=1e-6)
    # 50/50 blend
    weights = np.asarray([[0.5, 0.5, 0, 0]], np.float32)
    joints = np.asarray([[0, 1, 0, 0]], np.int32)
    out = np.asarray(gltf_mod.skin_vertices(pos[:1], joints, weights, xf))
    np.testing.assert_allclose(out[0], [0.5, 0, 0], atol=1e-6)


def test_get_skin_transforms_inverse_bind(tmp_path):
    # graph with a single joint node at x=+3; inverse bind translates -3
    graph = gltf_mod.GltfGraph(
        nodes=[dict(name="joint", translation=[3, 0, 0])], roots=[0],
        instance_nodes=[], camera_nodes=[], channels=[],
        skins=[dict(name="s", joints=[0],
                    inverse_bind=np.asarray(
                        [np.eye(4)], np.float32).copy(),
                    skeleton=0)],
        shape_morphs={}, shape_skin_attrs={})
    graph.skins[0]["inverse_bind"][0, 0, 3] = -3.0
    xf = gltf_mod.get_skin_transforms(graph, 0, np.eye(4, dtype=np.float32))
    # world(+3) @ bind(-3) = identity
    np.testing.assert_allclose(xf[0], np.eye(4), atol=1e-6)
