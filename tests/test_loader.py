"""OBJ/MTL loader semantics against the reference scene assets."""

import numpy as np
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import scene as scene_lib

pytestmark = needs_reference


@pytest.fixture(scope="module")
def simple():
    return scene_lib.load_scene(reference_scene("simple"))


def test_simple_counts(simple):
    # measured in SURVEY.md §4: v=14,346 f=13,824 p=2 c=2; every face is a
    # quad, fan-triangulated into 2 triangles at parse (yocto_obj.cpp:430)
    assert sum(len(s.pos) for s in simple.shapes) == 14346
    assert sum(len(s.triangles) for s in simple.shapes) == 27648
    assert sum(len(s.points) for s in simple.shapes) == 2
    assert len(simple.cameras) == 2
    assert simple.cameras[0].name == "cam"
    assert simple.cameras[1].name == "cam_dof"


def test_point_radius_default(simple):
    # missing vr => radius 0.001 on point/line shapes (src/scene.cpp:128)
    for s in simple.shapes:
        if len(s.points):
            np.testing.assert_allclose(s.radius, 0.001)


def test_material_semantics(simple):
    mats = {m.name: m for m in simple.materials}
    # Ns -> rs -> ns round-trip (yocto_scn.cpp:256 then raytrace.cpp:144)
    for m in simple.materials:
        if m.rs > 0:
            ns = 2.0 / np.float32(m.rs) ** 4 - 2.0
            assert 0 < ns < 1e6
    light = [m for m in mats.values() if (m.ke > 0).all()]
    assert light, "simple scene has emissive point lights"
    # floor uses a kd texture
    assert any(m.kd_txt >= 0 for m in simple.materials)


def test_normals_derived(simple):
    for s in simple.shapes:
        if len(s.triangles):
            assert len(s.norm) == len(s.pos)
            lens = np.linalg.norm(s.norm, axis=-1)
            np.testing.assert_allclose(lens[lens > 0], 1.0, rtol=1e-3)


def test_texcoord_v_flip(simple):
    # OBJ vt V is flipped at parse (yocto_obj.cpp:409-411): texcoords exist
    # and lie in a sane range for the floor grid
    any_tc = any(np.abs(s.texcoord).sum() > 0 for s in simple.shapes)
    assert any_tc


def test_instances_synthesized_when_absent(simple):
    # simple scene has no `i` lines: one identity instance per shape
    assert len(simple.instances) == len(simple.shapes)
    for ist in simple.instances:
        np.testing.assert_array_equal(ist.axes, np.eye(3, dtype=np.float32))


def test_instance_scene_parses():
    host = scene_lib.load_scene(reference_scene("instance10000"))
    assert len(host.instances) == 10004
    assert len(host.cameras) == 5
    # `i` lines carry real frames: at least some rotated/translated
    nontrivial = sum(
        1 for i in host.instances
        if not np.allclose(i.axes, np.eye(3)) or np.abs(i.o).sum() > 0)
    assert nontrivial > 9000


def test_device_scene_shapes_roundtrip(simple):
    dev, meta = scene_lib.build_device_scene(simple)
    assert meta.num_prims == sum(s.num_prims for s in simple.shapes)
    assert meta.num_instances == len(simple.instances)
    assert meta.num_lights == 2
    # vertex pool concatenation preserves shape order
    off = meta.shape_vert_offset
    for i, s in enumerate(simple.shapes):
        np.testing.assert_array_equal(
            np.asarray(dev.pos)[off[i]: off[i] + len(s.pos)], s.pos)
