"""SPMD rendering and differentiable training over a device mesh.

The reference is a single-threaded CPU loop (src/raytrace.cpp:228-251, the
only parallel machinery — yu::concurrent's thread pool — is never used).
The TPU-native first-class parallel axis is **rays**: pixels/samples are a
flat batch sharded over a 1-D ``jax.sharding.Mesh``, while the scene pytree
(geometry, BVH, materials, textures, lights, camera — the "parameters" of
the differentiable renderer) is **replicated**.

With those shardings declared on the inputs, every per-ray op partitions
trivially and XLA inserts exactly two collectives per training step: the
loss ``psum`` and the gradient ``psum`` over the replicated scene leaves —
both riding ICI. No hand-written transport (the reference has none either;
its "distributed backend" is N/A per SURVEY.md §2.3).

Image assembly: each device owns a contiguous slab of the flat ray-id
range, so gathering the rendered chunk back to host is one device-to-host
copy per device with no reshuffle.
"""

from __future__ import annotations

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import renderer as renderer_mod

RAY_AXIS = "rays"

_distributed_initialized = False


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Multi-host setup: ``jax.distributed.initialize`` gated + idempotent.

    After this, ``jax.devices()`` spans every host in the job and
    ``make_ray_mesh()`` builds a global mesh, so the same
    replicated-scene/sharded-rays layout runs across hosts — gradient
    psums ride ICI within a slice and DCN across (SURVEY.md §2.3
    "Distributed communication backend"). The reference has no analogue
    (single process, src/raytrace.cpp).

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) and to
    TPU-pod auto-detection when none are set. Returns the process id.
    No-op (returns current id) when already initialized or single-process.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_index()
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None
    if coordinator is None and num_processes is None:
        # single-host (or TPU-pod metadata available): let jax auto-detect;
        # on a lone host initialize() is unnecessary and may not apply
        if os.environ.get("TPU_WORKER_HOSTNAMES") is None:
            return jax.process_index()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    _distributed_initialized = True
    return jax.process_index()


def make_ray_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices, ray-parallel axis.

    Defaults to the GLOBAL device list, which spans hosts after
    ``init_distributed`` — the multi-host mesh falls out of the same call.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_scene(scene, mesh: Mesh):
    """Scene pytree -> every leaf replicated on all mesh devices."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(scene, rep)


def shard_rays(ray_ids: np.ndarray, mesh: Mesh, axis_name: str = RAY_AXIS):
    """Flat ray ids -> sharded over the mesh's ray axis (must divide).

    Built shard-by-shard (``make_array_from_callback``) so it works when
    the mesh spans hosts and only this process's slab is addressable —
    ray ids are a cheap iota, every process materializes only its slice.
    """
    ray_ids = np.asarray(ray_ids)
    sh = NamedSharding(mesh, P(axis_name))
    return jax.make_array_from_callback(
        ray_ids.shape, sh, lambda idx: ray_ids[idx])


def _pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def trace_rays_sharded(scene, meta, mesh: Mesh, ray_ids, ambient, *,
                       width, height, samples, max_depth, stream=None,
                       stochastic=False, seed=0, light_sampler=None,
                       axis_name: str = RAY_AXIS):
    """``trace_rays`` under ``jax.shard_map``: each device traces its ray
    shard as an INDEPENDENT program.

    Rays are embarrassingly parallel, but under plain jit-SPMD the stream
    intersector's data-dependent control flow (compacted worklists,
    survivor-bounded fori loops) forces the GSPMD partitioner into
    replicated/serialized schedules — measured on an 8-device CPU mesh:
    wall time INCREASED with device count. ``shard_map`` states the
    parallelism directly: per-shard local shapes, no cross-device
    dependence, no collectives in the forward render. This is the
    production multi-chip render path.

    ``stochastic``/``seed``/``light_sampler`` select the jittered-AA/DOF
    and area-light modes; their RNG is keyed by GLOBAL ray id
    (camera.per_ray_uniform), so the sharded render stays bit-identical
    to the single-device one regardless of the shard layout.
    """
    rep = jax.tree_util.tree_map(
        lambda _: P(), (scene, stream, ambient, light_sampler))
    rng_key = (jnp.uint32(seed)
               if (stochastic or light_sampler is not None) else None)

    def local(scene_, stream_, ambient_, sampler_, ids):
        return renderer_mod.trace_rays(
            scene_, ids, ambient_, width=width, height=height,
            samples=samples, max_depth=max_depth,
            max_stack=meta.max_stack, stream=stream_,
            has_kd_textures=meta.has_kd_textures,
            has_ks_textures=meta.has_ks_textures,
            stochastic=stochastic, rng_key=rng_key,
            light_sampler=sampler_)

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(rep[0], rep[1], rep[2], rep[3],
                                 P(axis_name)),
                       out_specs=P(axis_name), check_vma=False)
    return fn(scene, stream, ambient, light_sampler, ray_ids)


def render_image_sharded(
    scene,
    meta,
    mesh: Mesh,
    width: int,
    height: int,
    samples: int,
    ambient: float = 0.1,
    max_depth: int = 8,
    chunk_pixels: int | None = None,
    stream=None,
    stochastic: bool = False,
    seed: int = 0,
    light_sampler=None,
) -> np.ndarray:
    """Full-frame render with rays sharded over the mesh.

    Semantically identical to renderer.render_image (same trace_rays body,
    same global-ray-id-keyed RNG for the stochastic/area-light modes); the
    batch is padded so every device gets an equal slab. ``stream`` (a
    StreamScene) selects the cluster-scan fast path; like the scene it is
    replicated on every device. Returns (height, width, 4) f32 linear,
    alpha 1.
    """
    spp = samples * samples
    npix = width * height
    nray = npix * spp
    ndev = mesh.devices.size
    amb = jnp.asarray([ambient, ambient, ambient], jnp.float32)

    scene = replicate_scene(scene, mesh)
    if stream is not None:
        stream = replicate_scene(stream, mesh)
    if light_sampler is not None:
        light_sampler = replicate_scene(light_sampler, mesh)
    if chunk_pixels is None:
        chunk_rays = _pad_to(nray, ndev)
    else:
        chunk_rays = _pad_to(min(chunk_pixels * spp, nray), ndev)

    nchunks = -(-nray // chunk_rays)
    out = np.zeros((nchunks * chunk_rays, 3), np.float32)
    for start in range(0, nray, chunk_rays):
        ids = np.minimum(np.arange(start, start + chunk_rays), nray - 1)
        ids_sh = shard_rays(ids.astype(np.int32), mesh)
        rgb = trace_rays_sharded(
            scene, meta, mesh, ids_sh, amb, width=width, height=height,
            samples=samples, max_depth=max_depth, stream=stream,
            stochastic=stochastic, seed=seed, light_sampler=light_sampler)
        # per-shard host copies: works when the mesh spans hosts and only
        # this process's slabs are addressable (per-host tile ownership,
        # SURVEY.md §2.3 — unowned rows stay zero on this process)
        chunk_out = out[start:start + chunk_rays]
        for shard in rgb.addressable_shards:
            chunk_out[shard.index] = np.asarray(shard.data)

    out = out[:nray]
    rgb_pix = out.reshape(npix, spp, 3).sum(axis=1) / np.float32(spp)
    img = np.ones((npix, 4), np.float32)
    img[:, :3] = rgb_pix
    return img.reshape(height, width, 4)


def partition_scene(scene, trainable=None):
    """Split a scene pytree into (float leaves, non-float leaves, treedef).

    Gradients flow only to float leaves (camera, vertex positions, frames,
    materials, lights); integer topology (BVH nodes, prim ids, texture ids)
    and u8 texels are static. ``trainable`` optionally restricts further to
    the named DeviceScene fields (e.g. materials only — geometry gradients
    are correct pointwise but visibility is discontinuous, so optimizing
    geometry needs smaller steps or smoothed estimators). ``None`` marks
    the other partition's slots — each list is itself a valid pytree.
    """
    import dataclasses

    names = [f.name for f in dataclasses.fields(scene)]
    leaves, treedef = jax.tree_util.tree_flatten(scene)
    assert len(leaves) == len(names), "DeviceScene leaves are 1:1 fields"
    isf = [
        jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
        and (trainable is None or n in trainable)
        for l, n in zip(leaves, names)
    ]
    diff = [l if f else None for l, f in zip(leaves, isf)]
    static = [None if f else l for l, f in zip(leaves, isf)]
    return diff, static, treedef


def combine_scene(diff, static, treedef):
    leaves = [d if d is not None else s for d, s in zip(diff, static)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def render_loss(scene, ray_ids, target_rgb, ambient, *, width, height,
                samples, max_depth, max_stack, stream=None, remat=True):
    """Mean-squared error between rendered radiance and a target, per ray.

    The differentiable objective used by train_step and the gradient parity
    tests: every float leaf of ``scene`` receives gradients (camera,
    vertex positions, instance frames, materials, light intensities).
    ``stream`` selects the cluster-scan fast path for the (detached) hit
    topology; gradients still flow through the shading recompute, which
    gathers from ``scene`` — never from the stream tables.
    """
    rgb = renderer_mod.trace_rays(
        scene, ray_ids, ambient, width=width, height=height, samples=samples,
        max_depth=max_depth, max_stack=max_stack, differentiable=True,
        stream=stream, remat=remat)
    return jnp.mean((rgb - target_rgb) ** 2)


@partial(jax.jit, static_argnames=("max_depth", "max_stack", "trainable",
                                   "remat"))
def train_step(scene, ray_ids, target_rgb, ambient, lr, *, width, height,
               samples, max_depth, max_stack, trainable=None, stream=None,
               remat=True):
    """One SGD step on every differentiable scene leaf.

    The full inverse-rendering training step: forward render, MSE loss,
    reverse-mode gradients through the detached-traversal renderer, SGD
    update. Under sharded ``ray_ids`` + replicated ``scene``, XLA reduces
    the per-device gradient contributions with one psum over ICI.
    """
    diff, static, treedef = partition_scene(scene, trainable)

    def loss_fn(d):
        sc = combine_scene(d, static, treedef)
        return render_loss(sc, ray_ids, target_rgb, ambient, width=width,
                           height=height, samples=samples,
                           max_depth=max_depth, max_stack=max_stack,
                           stream=stream, remat=remat)

    loss, grads = jax.value_and_grad(loss_fn)(diff)
    new_diff = [d if g is None else d - lr * g for d, g in zip(diff, grads)]
    return combine_scene(new_diff, static, treedef), loss


@partial(jax.jit,
         static_argnames=("mesh", "treedef", "axis_name", "max_depth",
                          "max_stack"))
def _loss_grads_shmap(diff, static, ray_ids, target_rgb, ambient,
                      stream, width, height, samples, *, mesh, treedef,
                      axis_name, max_depth, max_stack):
    """Global-batch (loss, grads) under shard_map — the collective core
    shared by the SGD step and external-optimizer loops."""
    ndev = mesh.devices.size

    def local(diff_, static_, stream_, target_, ambient_, w_, h_, s_, ids_):
        def loss_fn(d):
            sc = combine_scene(d, static_, treedef)
            return render_loss(sc, ids_, target_, ambient_, width=w_,
                               height=h_, samples=s_, max_depth=max_depth,
                               max_stack=max_stack, stream=stream_)

        loss, grads = jax.value_and_grad(loss_fn)(diff_)
        # global-batch mean = psum of equal-shard means / ndev; gradients
        # of it are the psum of the local gradients / ndev
        scale = jnp.float32(1.0 / ndev)
        loss = jax.lax.psum(loss, axis_name) * scale
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, axis_name) * scale, grads)
        return loss, grads

    rep = P()
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(rep, rep, rep, P(axis_name), rep, rep, rep, rep,
                  P(axis_name)),
        out_specs=(rep, rep), check_vma=False)
    return fn(diff, static, stream, target_rgb, ambient,
              width, height, samples, ray_ids)


@partial(jax.jit,
         static_argnames=("mesh", "treedef", "axis_name", "max_depth",
                          "max_stack"))
def _train_step_shmap(diff, static, ray_ids, target_rgb, ambient, lr,
                      stream, width, height, samples, *, mesh, treedef,
                      axis_name, max_depth, max_stack):
    loss, grads = _loss_grads_shmap(
        diff, static, ray_ids, target_rgb, ambient, stream, width, height,
        samples, mesh=mesh, treedef=treedef, axis_name=axis_name,
        max_depth=max_depth, max_stack=max_stack)
    new_diff = [d if g is None else d - lr * g for d, g in zip(diff, grads)]
    return new_diff, loss


def loss_and_grads_sharded(scene, ray_ids, target_rgb, ambient, *, mesh,
                           width, height, samples, max_depth, max_stack,
                           trainable=None, stream=None,
                           axis_name: str = RAY_AXIS):
    """Sharded global-batch (loss, grads, partition) for EXTERNAL
    optimizers (optax etc. — scripts/inverse_showcase.py drives Adam with
    per-family step sizes through this): the same shard_map core as
    ``train_step_sharded`` (one psum per gradient leaf, nothing else),
    but the update rule stays with the caller. Returns
    ``(loss, grads, (diff, static, treedef))`` — apply updates to
    ``diff`` and rebuild with ``combine_scene``.
    """
    diff, static, treedef = partition_scene(scene, trainable)
    loss, grads = _loss_grads_shmap(
        diff, static, ray_ids, target_rgb, ambient, stream,
        jnp.int32(width), jnp.int32(height), jnp.int32(samples),
        mesh=mesh, treedef=treedef, axis_name=axis_name,
        max_depth=max_depth, max_stack=max_stack)
    return loss, grads, (diff, static, treedef)


def train_step_sharded(scene, ray_ids, target_rgb, ambient, lr, *, mesh,
                       width, height, samples, max_depth, max_stack,
                       trainable=None, stream=None,
                       axis_name: str = RAY_AXIS):
    """The production multi-chip training step: ``train_step`` under
    ``jax.shard_map``.

    Plain jit-SPMD ``train_step`` with sharded ray ids works, but GSPMD
    partitions the stream intersector's data-dependent while loops with
    per-iteration ``pred[]`` consensus all-reduces (38 collectives in the
    compiled module, measured on the 8-device CPU mesh — the same
    pathology that made ``trace_rays_sharded`` a shard_map). Here each
    device runs loss+backward on its ray shard as an independent program
    and the ONLY collectives are the loss psum and one psum per gradient
    leaf — a contract pinned mechanically by
    tests/test_sharding.py::test_train_step_sharded_collectives.

    Loss/gradients are the global-batch mean (psum of equal-shard means /
    n_devices): same value as ``train_step`` up to f32 reduction order.
    """
    diff, static, treedef = partition_scene(scene, trainable)
    new_diff, loss = _train_step_shmap(
        diff, static, ray_ids, target_rgb, ambient, jnp.float32(lr),
        stream, jnp.int32(width), jnp.int32(height), jnp.int32(samples),
        mesh=mesh, treedef=treedef, axis_name=axis_name,
        max_depth=max_depth, max_stack=max_stack)
    return combine_scene(new_diff, static, treedef), loss
