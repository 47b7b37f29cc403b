"""Native C++ host runtime == pure-Python fallbacks, bit for bit."""

import numpy as np
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import native
from yocto_raytracing_tpu import bvh as bvh_mod
from yocto_raytracing_tpu.io import objparser

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")


def test_bvh_native_matches_python():
    rng = np.random.default_rng(0)
    for n in (1, 3, 5, 64, 1000):
        lo = rng.uniform(-5, 5, size=(n, 3)).astype(np.float32)
        hi = lo + rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        a = bvh_mod._build_tree_python(lo, hi)
        nat = native.build_tree_native(lo, hi)
        assert nat is not None
        nb_min, nb_max, start, count, isleaf, leaf_prims, height = nat
        np.testing.assert_array_equal(a.start, start)
        np.testing.assert_array_equal(a.count, count)
        np.testing.assert_array_equal(a.isleaf, isleaf)
        np.testing.assert_array_equal(a.leaf_prims, leaf_prims)
        np.testing.assert_array_equal(a.bbox_min, nb_min)
        np.testing.assert_array_equal(a.bbox_max, nb_max)
        assert a.height == height


def test_bvh_native_degenerate_centroids():
    # all-equal centroids -> leaf regardless of count
    lo = np.zeros((10, 3), np.float32)
    hi = np.ones((10, 3), np.float32)
    a = bvh_mod._build_tree_python(lo, hi)
    nb_min, nb_max, start, count, isleaf, leaf_prims, height = \
        native.build_tree_native(lo, hi)
    assert isleaf[0] == 1 and a.isleaf[0] == 1
    np.testing.assert_array_equal(a.leaf_prims, leaf_prims)


@needs_reference
@pytest.mark.parametrize("scene", ["simple", "basic", "refl",
                                   "instance10000"])
def test_obj_native_matches_python(scene):
    path = reference_scene(scene)
    a = objparser._load_obj_python(path)
    nat = native.parse_obj_native(path)
    assert nat is not None
    b = objparser._assemble_from_native(path, *nat)

    assert len(a.shapes) == len(b.shapes)
    for sa, sb in zip(a.shapes, b.shapes):
        assert sa.name == sb.name
        assert sa.matname == sb.matname
        for f in ("pos", "norm", "texcoord", "radius"):
            va, vb = getattr(sa, f), getattr(sb, f)
            assert (va is None) == (vb is None), (sa.name, f)
            if va is not None:
                np.testing.assert_array_equal(va, vb, err_msg=f"{sa.name}.{f}")
        for f in ("points", "lines", "triangles"):
            np.testing.assert_array_equal(getattr(sa, f), getattr(sb, f))
    assert a.object_shapes == b.object_shapes
    assert [m.name for m in a.materials] == [m.name for m in b.materials]
    assert a.textures == b.textures
    assert len(a.cameras) == len(b.cameras)
    assert len(a.instances) == len(b.instances)
    for ia, ib in zip(a.instances, b.instances):
        assert ia.name == ib.name and ia.objname == ib.objname
        np.testing.assert_array_equal(ia.frame, ib.frame)
