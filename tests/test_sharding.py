"""SPMD correctness on the 8-device virtual CPU mesh.

Deterministic-output discipline (the functional analogue of race detection,
SURVEY.md §5): the same render must be bit-identical on 1 device and on an
8-way ray-sharded mesh, and the training step must run with sharded inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yocto_raytracing_tpu import parallel, scene as scene_lib, testscenes
from yocto_raytracing_tpu.render import renderer as renderer_mod


@pytest.fixture(scope="module")
def setup():
    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    return scene_lib.to_jax(dev), meta


@pytest.fixture(scope="module")
def setup_stream():
    from yocto_raytracing_tpu.ops import stream as stream_mod

    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dev, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    return scene_lib.to_jax(dev), meta, stream


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_render_bit_identical(setup):
    scene, meta = setup
    w = h = 16
    single = renderer_mod.render_image(scene, meta, w, h, 2, max_depth=3)
    mesh = parallel.make_ray_mesh()
    sharded = parallel.render_image_sharded(
        scene, meta, mesh, w, h, 2, max_depth=3)
    np.testing.assert_array_equal(single, sharded)


def test_sharded_stream_render_bit_identical(setup_stream):
    # the production path: cluster-scan intersector under ray sharding must
    # be bit-identical to the single-device stream render (determinism
    # discipline), and match the traversal oracle up to the <= 1 ULP
    # FMA-contraction drift between separately-compiled intersectors
    # (see tests/test_stream.py docstring)
    scene, meta, stream = setup_stream
    w = h = 16
    oracle = renderer_mod.render_image(scene, meta, w, h, 2, max_depth=3)
    single = renderer_mod.render_image(scene, meta, w, h, 2, max_depth=3,
                                       stream=stream)
    mesh = parallel.make_ray_mesh()
    sharded = parallel.render_image_sharded(
        scene, meta, mesh, w, h, 2, max_depth=3, stream=stream)
    np.testing.assert_array_equal(single, sharded)
    np.testing.assert_allclose(oracle, sharded, rtol=1e-5, atol=1e-6)


def test_train_step_stream(setup_stream):
    # train_step through the stream intersector: loss decreases, finite
    scene, meta, stream = setup_stream
    mesh = parallel.make_ray_mesh()
    w = h = 8
    ids = parallel.shard_rays(np.arange(w * h, dtype=np.int32), mesh)
    scene_r = parallel.replicate_scene(scene, mesh)
    stream_r = parallel.replicate_scene(stream, mesh)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)

    kwargs = dict(width=w, height=h, samples=1, max_depth=3,
                  max_stack=meta.max_stack, stream=stream_r)
    target = renderer_mod.trace_rays(scene_r, ids, amb, **kwargs)
    import dataclasses
    sc = dataclasses.replace(scene_r, mat_kd=scene_r.mat_kd * 0.5)
    sc = parallel.replicate_scene(sc, mesh)
    losses = []
    for _ in range(4):
        sc, loss = parallel.train_step(
            sc, ids, target, amb, jnp.float32(0.3),
            trainable=("mat_kd",), **kwargs)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_sharded_render_uses_all_devices(setup):
    scene, meta = setup
    mesh = parallel.make_ray_mesh()
    ids = parallel.shard_rays(np.arange(64, dtype=np.int32), mesh)
    assert len(ids.sharding.device_set) == 8


def test_train_step_sharded(setup):
    scene, meta = setup
    mesh = parallel.make_ray_mesh()
    w = h = 8
    ids = parallel.shard_rays(np.arange(w * h, dtype=np.int32), mesh)
    scene_r = parallel.replicate_scene(scene, mesh)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)

    target = renderer_mod.trace_rays(
        scene_r, ids, amb, width=w, height=h, samples=1, max_depth=3,
        max_stack=meta.max_stack)
    # perturb materials, train toward the original render
    import dataclasses
    start = dataclasses.replace(
        scene_r, mat_kd=scene_r.mat_kd * 0.5, mat_ks=scene_r.mat_ks * 2.0)
    start = parallel.replicate_scene(start, mesh)

    losses = []
    sc = start
    for _ in range(8):
        sc, loss = parallel.train_step(
            sc, ids, target, amb, jnp.float32(0.3), width=w, height=h,
            samples=1, max_depth=3, max_stack=meta.max_stack,
            trainable=("mat_kd", "mat_ks"))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses
    assert np.isfinite(losses).all()


def test_loss_matches_unsharded(setup):
    scene, meta = setup
    mesh = parallel.make_ray_mesh()
    w = h = 8
    ids_np = np.arange(w * h, dtype=np.int32)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)
    target = jnp.zeros((w * h, 3), jnp.float32)

    kwargs = dict(width=w, height=h, samples=1, max_depth=3,
                  max_stack=meta.max_stack)
    l1 = float(parallel.render_loss(scene, jnp.asarray(ids_np), target, amb,
                                    **kwargs))
    ids_sh = parallel.shard_rays(ids_np, mesh)
    scene_r = parallel.replicate_scene(scene, mesh)
    l8 = float(parallel.render_loss(scene_r, ids_sh, target, amb, **kwargs))
    np.testing.assert_allclose(l1, l8, rtol=1e-6)


# ---------------------------------------------------------------------------
# mechanical proof of the communication contract (SCALING.md):
# the forward render is collective-free; the training step's only
# cross-device ops are add-reductions (the loss mean + gradient psums)
# ---------------------------------------------------------------------------

COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all", "collective-broadcast")


def test_forward_render_is_collective_free(setup_stream):
    """Lower trace_rays_sharded to post-optimization HLO and assert the
    compiled module contains ZERO collective ops — the SCALING.md claim
    ("a forward render has zero cross-device operations"), checked
    mechanically rather than asserted from design."""
    scene, meta, stream = setup_stream
    mesh = parallel.make_ray_mesh()
    w = h = 16
    ids = parallel.shard_rays(np.arange(w * h, dtype=np.int32), mesh)
    scene_r = parallel.replicate_scene(scene, mesh)
    stream_r = parallel.replicate_scene(stream, mesh)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)

    def fwd(s, st, a, i):
        return parallel.trace_rays_sharded(
            s, meta, mesh, i, a, width=w, height=h, samples=1,
            max_depth=3, stream=st)

    txt = jax.jit(fwd).lower(scene_r, stream_r, amb, ids).compile().as_text()
    found = [op for op in COLLECTIVES if op in txt]
    assert not found, f"forward render lowered with collectives: {found}"


@pytest.fixture(scope="module")
def sharded_train_inputs(setup_stream):
    scene, meta, stream = setup_stream
    mesh = parallel.make_ray_mesh()
    w = h = 8
    ids = parallel.shard_rays(np.arange(w * h, dtype=np.int32), mesh)
    scene_r = parallel.replicate_scene(scene, mesh)
    stream_r = parallel.replicate_scene(stream, mesh)
    amb = jnp.asarray([0.1, 0.1, 0.1], jnp.float32)
    target = jnp.zeros((w * h, 3), jnp.float32)
    kwargs = dict(width=w, height=h, samples=1, max_depth=3,
                  max_stack=meta.max_stack, stream=stream_r)
    return mesh, scene_r, ids, target, amb, kwargs


def test_train_step_sharded_collectives(sharded_train_inputs):
    """The production multi-chip training step must communicate ONLY
    through psums: every collective in the compiled HLO is an all-reduce
    whose computation is a scalar add (the loss mean + the gradient
    reductions), and at least one exists. (Plain jit-SPMD train_step
    instead lowers with dozens of pred[] consensus all-reduces inside the
    intersector's while loops — the measured GSPMD pathology that makes
    shard_map the production path, SCALING.md.)"""
    import re

    from yocto_raytracing_tpu.parallel import mesh as mesh_mod

    mesh, scene_r, ids, target, amb, kwargs = sharded_train_inputs
    diff, static, treedef = mesh_mod.partition_scene(scene_r)
    lowered = mesh_mod._train_step_shmap.lower(
        diff, static, ids, target, amb, jnp.float32(0.1),
        kwargs["stream"], jnp.int32(8), jnp.int32(8), jnp.int32(1),
        mesh=mesh, treedef=treedef, axis_name=mesh_mod.RAY_AXIS,
        max_depth=3, max_stack=kwargs["max_stack"])
    txt = lowered.compile().as_text()

    bad = [op for op in COLLECTIVES if op != "all-reduce" and op in txt]
    assert not bad, f"unexpected collectives in train_step_sharded: {bad}"
    ars = re.findall(r"all-reduce[^\n]*to_apply=(%?[\w.\-]+)", txt)
    assert len(ars) >= 1, "no gradient psum found in HLO"
    # every all-reduce reduces with scalar add (a psum, nothing else)
    for comp in set(ars):
        sig = re.search(re.escape(comp) + r"\s*\([^)]*\)[^{]*\{(.*?)\n\}",
                        txt, re.S)
        assert sig and "add(" in sig.group(1), (
            f"all-reduce computation {comp} is not an add")


def test_train_step_sharded_matches_train_step(sharded_train_inputs):
    """Same loss and updated scene as jit-SPMD train_step (up to f32
    reduction order: global mean vs psum-of-shard-means/ndev)."""
    mesh, scene_r, ids, target, amb, kwargs = sharded_train_inputs
    s1, l1 = parallel.train_step(scene_r, ids, target, amb,
                                 jnp.float32(0.2), **kwargs)
    s2, l2 = parallel.train_step_sharded(scene_r, ids, target, amb,
                                         jnp.float32(0.2), mesh=mesh,
                                         **kwargs)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_sharded_hierarchical_shortlist_bit_identical():
    """r5: the hierarchical instance shortlist (>= HIER_MIN_INST
    instances, dynamic group windows + per-group refinement) under ray
    sharding — the sharded stream render must stay bit-identical to the
    single-device one (determinism discipline), proving the dynamic-
    slice shortlist compiles and executes correctly inside shard_map."""
    from yocto_raytracing_tpu.ops import stream as stream_mod

    host = testscenes.make_random_scene(seed=21, n_shapes=2, n_tris=10,
                                        n_lines=0, n_points=2,
                                        n_instances=300)
    dev, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dev, meta)
    assert stream.inst_wb_min.shape[0] >= stream_mod.HIER_MIN_INST
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    scene = scene_lib.to_jax(dev)
    w = h = 16
    single = renderer_mod.render_image(scene, meta, w, h, 1, max_depth=2,
                                       stream=stream)
    mesh = parallel.make_ray_mesh()
    sharded = parallel.render_image_sharded(
        scene, meta, mesh, w, h, 1, max_depth=2, stream=stream)
    np.testing.assert_array_equal(single, sharded)
