"""Streaming cluster-scan intersector == BVH traversal.

The stream scan (ops/stream.py) tests prims in the same reference DFS
order with the same inclusive acceptance, so it reproduces the traversal's
results exactly — up to XLA FMA contraction. The two paths are separately
compiled programs, and XLA:CPU contracts a*b+c into fma() differently
depending on fusion shape (verified: the same jnp formula jitted at
different shapes differs by 1 ULP), so ``t`` may drift by <= 1 ULP between
them; where ``t`` agrees bitwise, the (inst, prim) winner must agree too,
including equal-t ties.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.ops import stream as stream_mod, traverse

FLT_MAX = np.float32(3.4028235e38)


def _build(host):
    dev, meta = scene_lib.build_device_scene(host)
    ss = stream_mod.build_stream_scene(host, dev, meta)
    return (scene_lib.to_jax(dev), meta,
            jax.tree_util.tree_map(jnp.asarray, ss))


def _rays(seed, n):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return (jnp.asarray(ro), jnp.asarray(rd),
            jnp.full((n,), 1e-4, jnp.float32),
            jnp.full((n,), FLT_MAX, jnp.float32))


def _assert_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]),
                                  err_msg="hit")
    ta = np.asarray(a["t"])
    tb = np.asarray(b["t"])
    # ULP distance (all ts positive here: tmin > 0, misses = +FLT_MAX)
    ulp = np.abs(ta.view(np.int32) - tb.view(np.int32))
    assert ulp.max() <= 1, f"t ULP diff {ulp.max()} at {ulp.argmax()}"
    exact = ta == tb
    for k in ("inst", "prim"):
        np.testing.assert_array_equal(np.asarray(a[k])[exact],
                                      np.asarray(b[k])[exact], err_msg=k)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_stream_matches_traversal_random(seed):
    dev, meta, ss = _build(testscenes.make_random_scene(seed=seed))
    ro, rd, tmin, tmax = _rays(seed + 10, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    _assert_equal(a, b)


def test_stream_matches_traversal_hair():
    dev, meta, ss = _build(testscenes.make_hair_scene(64))
    ro, rd, tmin, tmax = _rays(5, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    _assert_equal(a, b)


def test_stream_any_hit_consistent():
    dev, meta, ss = _build(testscenes.make_random_scene(seed=7))
    ro, rd, tmin, tmax = _rays(8, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax, any_hit=True,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))


@needs_reference
def test_stream_matches_traversal_simple_camera_rays():
    host = scene_lib.load_scene(reference_scene("simple"))
    dev, meta, ss = _build(host)
    from yocto_raytracing_tpu.render import camera as camera_mod

    ids = jnp.arange(2048, dtype=jnp.int32) * 7 % (171 * 96)
    _, uv = camera_mod.pixel_uv(171, 96, 1, ids)
    ro, rd = camera_mod.eval_camera(dev, uv)
    n = ro.shape[0]
    tmin = jnp.full((n,), 1e-4, jnp.float32)
    tmax = jnp.full((n,), FLT_MAX, jnp.float32)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    _assert_equal(a, b)


@pytest.mark.parametrize("seed", [0, 2])
def test_flat_pair_path_matches_traversal(seed):
    """The opt-in flat pair-worklist scan (ops/stream.py, YRT_FLAT_SCAN)
    produces the same results as the oracle — same dense tests in the
    same DFS order, only the loop structure differs."""
    dev, meta, ss = _build(testscenes.make_random_scene(seed=seed))
    ro, rd, tmin, tmax = _rays(seed + 20, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax, flat=True)
    # weaker contract than the production loop path: the flat path's
    # restacked per-instance ray planes fuse differently, so the LOCAL
    # RAY itself can differ by an FMA-contraction ULP, which the prim
    # solve amplifies to a few ULP of t (vs <= 1 for the loop path)
    np.testing.assert_array_equal(np.asarray(a["hit"]),
                                  np.asarray(b["hit"]))
    ta = np.asarray(a["t"])
    tb = np.asarray(b["t"])
    ulp = np.abs(ta.view(np.int32) - tb.view(np.int32))
    assert ulp.max() <= 8, f"t ULP diff {ulp.max()}"
    exact = ta == tb
    np.testing.assert_array_equal(np.asarray(a["prim"])[exact],
                                  np.asarray(b["prim"])[exact])
    c = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax, any_hit=True,
                                    flat=True)
    a2 = traverse.intersect_scene(dev, ro, rd, tmin, tmax, any_hit=True,
                                  max_stack=meta.max_stack)
    np.testing.assert_array_equal(np.asarray(a2["hit"]),
                                  np.asarray(c["hit"]))


@needs_reference
def test_stream_golden_render():
    """End-to-end: renderer with the stream intersector matches the oracle."""
    import os

    from conftest import assert_golden_match
    from yocto_raytracing_tpu import image as image_mod
    from yocto_raytracing_tpu.render import renderer

    img, *_ = renderer.render_scene_file(
        reference_scene("simple"), resolution=96, samples=1,
        intersector="stream")
    assert_golden_match(
        image_mod.tonemap(img),
        os.path.join(os.path.dirname(__file__), "goldens",
                     "simple_96_s1.png"))


@pytest.mark.parametrize("seed", [0, 2])
def test_flat2_hybrid_path_matches_loop_path(seed):
    """The r4 hybrid pair-worklist scan (YRT_FLAT_SCAN=2): flat's single
    fori, but the local ray is RECOMPUTED per pair from gathered
    instance params with the loop path's exact transform ops. Contract:
    bit-identical hits/prims/t vs the PRODUCTION loop path (same f32
    ops in the same DFS fold order — only the control structure
    differs), plus hit-set equality vs the traversal oracle. (The
    oracle's t can differ by tens of ULPs on grazing capsules — the
    documented fusion-amplification class, tie_forensics.py — which is
    why the loop path, not the oracle, is the bit-parity reference.)"""
    dev, meta, ss = _build(testscenes.make_random_scene(seed=seed))
    ro, rd, tmin, tmax = _rays(seed + 40, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    loop = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    b = stream_mod._intersect_block_flat2(ss, ro, rd, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(a["hit"]),
                                  np.asarray(b["hit"]))
    for key in ("hit", "inst", "prim", "t"):
        np.testing.assert_array_equal(np.asarray(loop[key]),
                                      np.asarray(b[key]), err_msg=key)
    c = stream_mod._intersect_block_flat2(ss, ro, rd, tmin, tmax,
                                          any_hit=True)
    a2 = traverse.intersect_scene(dev, ro, rd, tmin, tmax, any_hit=True,
                                  max_stack=meta.max_stack)
    np.testing.assert_array_equal(np.asarray(a2["hit"]),
                                  np.asarray(c["hit"]))


def test_effective_block_unroll():
    """Scene-adaptive block config (r5): block * n_inst <=
    GRAN_BLOCK_ELEMS is the culling-GRANULARITY cap (the 10k-instance
    sweep peaks at 4096-ray blocks, +41% over 32768 — a k-times-larger
    screen tile shortlists ~k times the instances per ray; PERF.md r5),
    while the hierarchical shortlist keeps the mask MEMORY at
    (N, ceil(I/GROUP)): every config must fit MAX_BLOCK_ELEMS, the
    halving may now go below the old 2048 floor, and absurd counts fail
    loudly (r4 advisor finding)."""
    blk = stream_mod.BLOCK_RAYS
    assert stream_mod.effective_block_unroll(1) == (blk, stream_mod.UNROLL)
    assert stream_mod.effective_block_unroll(5) == (blk, stream_mod.UNROLL)
    # 10k instances: the measured optimum 4096-ray block, unroll 2
    b10k, u10k = stream_mod.effective_block_unroll(10004)
    assert b10k == 4096 and u10k == stream_mod.CAPPED_UNROLL == 2
    # every config respects the hierarchical mask budget; the block keeps
    # shrinking (below the old 2048 floor) as instances grow
    blocks = []
    for i in (1, 100, 1000, 10004, 100000, 1000000):
        b, _ = stream_mod.effective_block_unroll(i)
        blocks.append(b)
        assert b * stream_mod.shortlist_width(i) \
            <= stream_mod.MAX_BLOCK_ELEMS, i
    assert blocks == sorted(blocks, reverse=True)
    assert stream_mod.effective_block_unroll(1000000)[0] < 2048


def test_stream_hierarchical_shortlist_matches_traversal():
    """r5: scenes with >= HIER_MIN_INST instances take the two-stage group
    shortlist (merged GROUP-bbox pass + per-group refinement). Slab-test
    monotonicity under bbox enlargement makes its survivor set EXACTLY the
    flat pass's, so the full parity contract must hold unchanged."""
    host = testscenes.make_random_scene(seed=11, n_shapes=2, n_tris=12,
                                        n_lines=4, n_points=2,
                                        n_instances=300)
    dev, meta, ss = _build(host)
    assert ss.grp_wb_min.shape[0] == -(-300 // stream_mod.GROUP)
    assert 300 >= stream_mod.HIER_MIN_INST  # hierarchical path is active
    ro, rd, tmin, tmax = _rays(30, 512)
    a = traverse.intersect_scene(dev, ro, rd, tmin, tmax,
                                 max_stack=meta.max_stack)
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    # oracle contract, scoped like test_flat2: with 300 instances x 4
    # capsules the sample set contains grazing LINE hits, where the
    # separately-compiled oracle legitimately drifts tens of ULPs (the
    # documented fusion-amplification class, tie_forensics.py) — so lines
    # get a loose t bound while every other hit keeps the <= 1 ULP
    # contract. Bit-parity of the shortlist itself is pinned separately
    # (test_stream_hierarchical_equals_flat_shortlist).
    np.testing.assert_array_equal(np.asarray(a["hit"]),
                                  np.asarray(b["hit"]))
    ta, tb = np.asarray(a["t"]), np.asarray(b["t"])
    ulp = np.abs(ta.view(np.int32) - tb.view(np.int32))
    pt = np.asarray(dev.prim_type)
    is_line = np.asarray(a["hit"]) & (pt[np.asarray(a["prim"])] == 1)
    assert ulp[~is_line].max() <= 1, f"non-line t ULP {ulp[~is_line].max()}"
    assert ulp.max() <= 64, f"line t ULP {ulp.max()}"
    exact = ta == tb
    for k in ("inst", "prim"):
        np.testing.assert_array_equal(np.asarray(a[k])[exact],
                                      np.asarray(b[k])[exact], err_msg=k)
    a2 = traverse.intersect_scene(dev, ro, rd, tmin, tmax, any_hit=True,
                                  max_stack=meta.max_stack)
    b2 = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax, any_hit=True)
    np.testing.assert_array_equal(np.asarray(a2["hit"]),
                                  np.asarray(b2["hit"]))


def test_stream_hierarchical_equals_flat_shortlist():
    """Direct contract: the hierarchical shortlist changes NOTHING but
    work — dropping the group tables (grp_wb_min=None forces the flat
    (N, I) pass) must give bit-identical hits, ids, and t."""
    import dataclasses

    host = testscenes.make_random_scene(seed=13, n_shapes=2, n_tris=12,
                                        n_lines=4, n_points=2,
                                        n_instances=300)
    _, _, ss = _build(host)
    ss_flat = dataclasses.replace(ss, grp_wb_min=None, grp_wb_max=None)
    ro, rd, tmin, tmax = _rays(31, 512)
    h = stream_mod._intersect_block(ss, ro, rd, tmin, tmax)
    f = stream_mod._intersect_block(ss_flat, ro, rd, tmin, tmax)
    for key in ("hit", "inst", "prim", "t"):
        np.testing.assert_array_equal(np.asarray(h[key]),
                                      np.asarray(f[key]), err_msg=key)


def test_tile_permutation_shapes():
    """tile_permutation is a true permutation for every config, and the
    r4 near-square width rule holds: 2048-px tiles are 32 wide (the
    measured winner), 256-px tiles stay 16 (the r3 optimum), tiny tiles
    never exceed tile_px."""
    from yocto_raytracing_tpu.render import renderer

    for w, h, spp, block in ((171, 96, 1, 32768), (160, 90, 16, 32768),
                             (64, 64, 64, 8192), (33, 17, 4, 64)):
        p = renderer.tile_permutation(w, h, spp, block)
        assert sorted(p.tolist()) == list(range(w * h)), (w, h, spp, block)

    # width rule (derived from the A/B in the docstring)
    import math

    def tw_of(block, spp):
        tile_px = max(1, block // max(1, spp))
        tw = 1 << int(round(math.log2(max(1, math.isqrt(tile_px)))))
        return max(min(64, tw, tile_px), min(16, tile_px))

    assert tw_of(32768, 16) == 32    # 2048-px tile -> 32x64 (r4 winner)
    assert tw_of(4096, 16) == 16     # 256-px tile -> 16x16 (r3 optimum)
    assert tw_of(8192, 64) == 16     # instance-capped small tiles
    assert tw_of(16, 16) == 1        # tw never exceeds tile_px


def test_fused_dense_fold_experiment(monkeypatch):
    """The opt-in fused dense test (YRT_DENSE_FOLD=fused — measured a
    frame-level no-op on TPU and kept off, ops/stream.py module note):
    its switch-free masked selects + single variadic winner reduce are
    value-exact per-lane, but the different fusion shape lets XLA
    contract fma chains differently, so the contract vs the production
    loop path is the flat-path one: identical hit sets, bounded t ULPs,
    identical winners where t agrees bitwise."""
    dev, meta, ss = _build(testscenes.make_random_scene(seed=4))
    ro, rd, tmin, tmax = _rays(44, 512)
    a = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    monkeypatch.setattr(stream_mod, "_FUSED_DENSE", True)
    stream_mod._intersect_block._clear_cache()
    stream_mod.intersect_stream._clear_cache()
    b = stream_mod.intersect_stream(ss, ro, rd, tmin, tmax)
    monkeypatch.setattr(stream_mod, "_FUSED_DENSE", False)
    stream_mod._intersect_block._clear_cache()
    stream_mod.intersect_stream._clear_cache()
    np.testing.assert_array_equal(np.asarray(a["hit"]),
                                  np.asarray(b["hit"]))
    ta, tb = np.asarray(a["t"]), np.asarray(b["t"])
    ulp = np.abs(ta.view(np.int32) - tb.view(np.int32))
    assert ulp.max() <= 64, f"t ULP diff {ulp.max()}"
    exact = ta == tb
    for k in ("inst", "prim"):
        np.testing.assert_array_equal(np.asarray(a[k])[exact],
                                      np.asarray(b[k])[exact], err_msg=k)
