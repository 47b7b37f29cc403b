"""Two-level BVH traversal == brute-force oracle (property test).

Mirrors the reference's own discipline: it keeps a linear-scan
intersect_ray (src/scene.cpp:311-367) alongside the BVH path. Random
mixed-primitive multi-instance scenes, random rays, nearest-hit equality on
(hit, t) and any-hit consistency.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu import testscenes
from yocto_raytracing_tpu.ops import brute, traverse

FLT_MAX = np.float32(3.4028235e38)


def _build(seed):
    host = testscenes.make_random_scene(seed=seed)
    dev, meta = scene_lib.build_device_scene(host)
    return scene_lib.to_jax(dev), meta


def _rays(seed, n):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    tmin = np.full(n, 1e-4, np.float32)
    tmax = np.full(n, FLT_MAX, np.float32)
    return map(jnp.asarray, (ro, rd, tmin, tmax))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bvh_matches_brute_force(seed):
    scene, meta = _build(seed)
    ro, rd, tmin, tmax = _rays(seed + 100, 256)

    got = traverse.intersect_scene(scene, ro, rd, tmin, tmax,
                                   max_stack=meta.max_stack)
    want = brute.intersect_scene_brute(scene, meta, ro, rd, tmin, tmax)

    hit_g = np.asarray(got["hit"])
    hit_w = np.asarray(want["hit"])
    assert (hit_g == hit_w).all(), f"{(hit_g != hit_w).sum()} lanes disagree"
    both = hit_g & hit_w
    # hit distance must agree; (inst, prim) may differ only at exact-t ties
    t_g = np.asarray(got["t"])[both]
    t_w = np.asarray(want["t"])[both]
    np.testing.assert_allclose(t_g, t_w, rtol=1e-6, atol=1e-6)
    same_prim = (np.asarray(got["prim"])[both]
                 == np.asarray(want["prim"])[both])
    assert (same_prim | np.isclose(t_g, t_w, rtol=1e-5)).all()


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("any_hit", [False, True])
def test_stackless_matches_stack_machine(seed, any_hit):
    """Threaded traversal == stack machine, including tie winners."""
    scene, meta = _build(seed)
    ro, rd, tmin, tmax = _rays(seed + 400, 512)
    a = traverse.intersect_scene(scene, ro, rd, tmin, tmax, any_hit=any_hit,
                                 max_stack=meta.max_stack)
    b = traverse.intersect_scene_stack(scene, ro, rd, tmin, tmax,
                                       any_hit=any_hit,
                                       max_stack=meta.max_stack)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    if not any_hit:
        # identical winners bit-for-bit (visit order is identical)
        np.testing.assert_array_equal(np.asarray(a["inst"]),
                                      np.asarray(b["inst"]))
        np.testing.assert_array_equal(np.asarray(a["prim"]),
                                      np.asarray(b["prim"]))
        np.testing.assert_array_equal(np.asarray(a["t"]), np.asarray(b["t"]))


def test_any_hit_consistent_with_nearest(seed=5):
    scene, meta = _build(seed)
    ro, rd, tmin, tmax = _rays(seed + 200, 256)
    nearest = traverse.intersect_scene(scene, ro, rd, tmin, tmax,
                                       max_stack=meta.max_stack)
    anyh = traverse.intersect_scene(scene, ro, rd, tmin, tmax, any_hit=True,
                                    max_stack=meta.max_stack)
    np.testing.assert_array_equal(np.asarray(anyh["hit"]),
                                  np.asarray(nearest["hit"]))


def test_tmax_clips_hits(seed=6):
    scene, meta = _build(seed)
    ro, rd, tmin, tmax = _rays(seed + 300, 256)
    nearest = traverse.intersect_scene(scene, ro, rd, tmin, tmax,
                                       max_stack=meta.max_stack)
    t = np.asarray(nearest["t"])
    hit = np.asarray(nearest["hit"])
    # shrink tmax below each found hit: the hit must disappear
    clipped = traverse.intersect_scene(
        scene, ro, rd, tmin, jnp.asarray(np.where(hit, t * 0.5, 1e-3)),
        max_stack=meta.max_stack)
    assert not np.asarray(clipped["hit"])[hit].any()


def test_bvh_build_structure():
    host = testscenes.make_random_scene(seed=9)
    dev, meta = scene_lib.build_device_scene(host)
    start = np.asarray(dev.node_start)
    count = np.asarray(dev.node_count)
    isleaf = np.asarray(dev.node_isleaf) == 1
    kind = np.asarray(dev.node_kind)
    # leaves hold at most 4 items (src/scene.cpp:583); internals exactly 2
    assert (count[isleaf] <= 4).all()
    assert (count[~isleaf] == 2).all()
    # parent bbox contains both children's bboxes
    bmin = np.asarray(dev.node_bbox_min)
    bmax = np.asarray(dev.node_bbox_max)
    internal = np.where(~isleaf)[0]
    for k in (0, 1):
        ch = start[internal] + k
        assert (bmin[internal] <= bmin[ch] + 1e-6).all()
        assert (bmax[internal] >= bmax[ch] - 1e-6).all()
    # scene-level tree is the prefix of the pool, leaves index instances
    n_scene_nodes = (kind == 0).sum()
    assert (kind[:n_scene_nodes] == 0).all()
    leaf_items = np.asarray(dev.leaf_items)
    for nid in np.where(isleaf & (kind == 0))[0]:
        items = leaf_items[start[nid]: start[nid] + count[nid]]
        assert ((0 <= items) & (items < meta.num_instances)).all()
    # every prim appears exactly once across its shape's leaves
    for nid in np.where(isleaf & (kind == 1))[0]:
        items = leaf_items[start[nid]: start[nid] + count[nid]]
        assert ((0 <= items) & (items < meta.num_prims)).all()


@pytest.mark.parametrize("seed", [0, 2])
def test_equal_num_split_matches_brute_force(seed):
    """The build_bvh API's other split mode (equal_num=true -> nth_element
    median, src/scene.cpp:622-627; unused by the reference's main). The
    tree differs structurally from the midpoint build but traversal must
    agree with the brute-force oracle — and with the midpoint tree — on
    hit/t for every ray."""
    host = testscenes.make_random_scene(seed=seed)
    dev_m, meta_m = scene_lib.build_device_scene(host)
    dev_e, meta_e = scene_lib.build_device_scene(host, equal_num=True)
    scene_m, scene_e = scene_lib.to_jax(dev_m), scene_lib.to_jax(dev_e)
    # a different split rule must actually produce a different tree
    # somewhere (guards against the flag silently not being plumbed)
    assert (dev_m.node_start.shape != dev_e.node_start.shape
            or (dev_m.node_start != dev_e.node_start).any()
            or (dev_m.leaf_items != dev_e.leaf_items).any())

    ro, rd, tmin, tmax = _rays(seed + 300, 256)
    got = traverse.intersect_scene(scene_e, ro, rd, tmin, tmax,
                                   max_stack=meta_e.max_stack)
    want = brute.intersect_scene_brute(scene_e, meta_e, ro, rd, tmin, tmax)
    mid = traverse.intersect_scene(scene_m, ro, rd, tmin, tmax,
                                   max_stack=meta_m.max_stack)

    hit_g = np.asarray(got["hit"])
    assert (hit_g == np.asarray(want["hit"])).all()
    assert (hit_g == np.asarray(mid["hit"])).all()
    both = hit_g & np.asarray(want["hit"])
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(want["t"])[both],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["t"])[both],
                               np.asarray(mid["t"])[both],
                               rtol=1e-6, atol=1e-6)
