"""Inverse-rendering showcase: recover perturbed materials + light
intensity of the refl scene from a rendered target (VERDICT r4 #3).

The end-to-end *use* of the differentiable renderer that the FD tests
(tests/test_grad*.py) validate pointwise: render the true refl scene at
256p, multiply mat_kd / mat_ks / mat_kr / light_ke by random per-entry
factors, then descend the sharded MSE loss
(`parallel.loss_and_grads_sharded` — the train_step_sharded collective
core) with Adam using per-family step sizes (light_ke lives at ~1e2,
materials at ~1e0; one global SGD lr cannot serve both).

Geometry/topology are untouched, so the detached hit topology matches the
target's exactly and the problem isolates the *shading* gradients: the
ambient term (amb*kd) separates kd from the kd*ke/r^2 product, specular
highlights pin ks, and the mirror bounce pins kr. Materials that are
invisible from the camera (or unlit) receive ~zero gradient and are
EXPECTED to stay at their perturbed values — the per-entry table marks
them; this is the materials analogue of the visibility-boundary law
(GRADIENTS.md): gradients only flow through rays that exist.

Writes the loss curve + recovered-vs-true table to stdout; the committed
run lives in GRADIENTS.md ("Inverse-rendering showcase").

Usage: python scripts/inverse_showcase.py [--steps N] [--res R]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from yocto_raytracing_tpu import scene as scene_lib, parallel
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.parallel import mesh as mesh_mod
from yocto_raytracing_tpu.render import renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
TRAINABLE = ("mat_kd", "mat_ks", "mat_kr", "light_ke")
# Adam's update magnitude ~ lr regardless of gradient scale, so each
# family's step is sized to its parameter scale (ke ~ 1e2, others ~ 1e0)
FAMILY_LR = {"mat_kd": 2e-2, "mat_ks": 2e-2, "mat_kr": 2e-2,
             "light_ke": 2.0}
MAX_DEPTH = 4


def main(steps=200, res=256, samples=2, seed=0, multi=False):
    """``multi=True``: multi-illumination capture — fit TWO targets of
    the same scene rendered under different ambient levels (0.02 and
    0.3) jointly. The single-target problem leaves kd/ks vs ke
    identifiable only through the weak amb*kd term (the near-gauge
    direction, GRADIENTS.md); a second illumination condition pins the
    ambient-only response directly and removes the gauge."""
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, res)
    height = res
    spp = samples * samples
    n = width * height * spp
    amb = jnp.asarray([0.1] * 3, jnp.float32)

    # tile-ordered full-frame ray batch (the production batch order)
    block = stream_mod.effective_block_unroll(
        stream.inst_wb_min.shape[0])[0]
    perm_np, _ = renderer._tile_perm_cached(width, height, spp, block)
    ids = jnp.asarray(
        (perm_np.astype(np.int64)[:, None] * spp
         + np.arange(spp)[None, :]).reshape(-1).astype(np.int32))

    # target(s): the TRUE scene's per-ray radiance (forward-only render)
    ambs = ([jnp.asarray([0.02] * 3, jnp.float32),
             jnp.asarray([0.3] * 3, jnp.float32)] if multi else [amb])

    def render_target(a):
        return jax.lax.stop_gradient(renderer.trace_rays(
            dscene, ids, a, width=jnp.int32(width),
            height=jnp.int32(height), samples=jnp.int32(samples),
            max_depth=MAX_DEPTH, max_stack=meta.max_stack, stream=stream))

    targets = [render_target(a) for a in ambs]

    # perturb: independent multiplicative factors per entry
    rng = np.random.default_rng(seed)
    true_vals = {f: np.asarray(getattr(dscene, f)) for f in TRAINABLE}
    import dataclasses

    perturbed = {}
    for f in TRAINABLE:
        factors = rng.uniform(0.45, 1.9, size=true_vals[f].shape)
        perturbed[f] = (true_vals[f] * factors).astype(np.float32)
    scene0 = dataclasses.replace(
        dscene, **{f: jnp.asarray(perturbed[f]) for f in TRAINABLE})

    mesh = parallel.make_ray_mesh()
    names = [fld.name for fld in dataclasses.fields(scene0)]
    leaf_lr = [FAMILY_LR.get(nm) for nm in names]

    diff, static, treedef = mesh_mod.partition_scene(scene0, TRAINABLE)
    opt = optax.adam(1.0)  # per-leaf scale applied below
    opt_state = opt.init(diff)

    # every big array rides as an ARGUMENT (closure arrays would bake
    # into the executable as constants); the one jitted step = fwd
    # render(s) + MSE + reverse-mode grads (psum over the mesh) +
    # per-family Adam. Under ``multi`` the loss/grads sum over the
    # illumination conditions.
    @jax.jit
    def adam_step(diff, static_, stream_, opt_state, ids_, targets_):
        loss = jnp.float32(0.0)
        grads = None
        for a, t in zip(ambs, targets_):
            l_, g_ = mesh_mod._loss_grads_shmap(
                diff, static_, ids_, t, a, stream_, jnp.int32(width),
                jnp.int32(height), jnp.int32(samples), mesh=mesh,
                treedef=treedef, axis_name=mesh_mod.RAY_AXIS,
                max_depth=MAX_DEPTH, max_stack=meta.max_stack)
            loss = loss + l_
            grads = (g_ if grads is None else
                     [x if y is None else x + y
                      for x, y in zip(grads, g_)])
        updates, opt_state = opt.update(grads, opt_state, diff)
        new_diff = [
            d if u is None else jnp.maximum(d + lr * u, 0.0)  # stay physical
            for d, u, lr in zip(diff, updates, leaf_lr)
        ]
        return new_diff, opt_state, loss

    losses = []
    t0 = time.perf_counter()
    for s in range(steps):
        diff, opt_state, loss = adam_step(diff, static, stream,
                                          opt_state, ids, tuple(targets))
        if s % 10 == 0 or s == steps - 1:
            losses.append((s, float(loss)))
            print(f"step {s:4d}  loss {float(loss):.3e}", flush=True)
    dt = time.perf_counter() - t0
    print(f"{steps} steps in {dt:.1f}s ({steps * n / dt / 1e6:.2f} "
          f"Mrays/s fwd+bwd sustained)")

    final = mesh_mod.combine_scene(diff, static, treedef)
    print(f"\nconfig: refl {width}x{height} @ {spp} spp, depth {MAX_DEPTH}, "
          f"{n} rays/step, Adam lr={FAMILY_LR}")
    print("loss curve:", " ".join(f"{s}:{v:.3e}" for s, v in losses))
    print(f"\n{'param':14s} {'true':>24s} {'perturbed':>10s} "
          f"{'recovered':>24s} {'rel.err':>8s}")
    mat_names = [m.name for m in host.materials]
    for f in TRAINABLE:
        rec = np.asarray(getattr(final, f))
        tru = true_vals[f]
        per = perturbed[f]
        for i in range(tru.shape[0]):
            nm = (mat_names[i] if f.startswith("mat_")
                  and i < len(mat_names) else str(i))
            denom = np.maximum(np.abs(tru[i]), 1e-3)
            relerr = float(np.max(np.abs(rec[i] - tru[i]) / denom))
            perr = float(np.max(np.abs(per[i] - tru[i]) / denom))
            flag = "" if relerr < 0.05 else \
                ("  (unobserved)" if abs(relerr - perr) < 1e-3 else "  *")
            print(f"{f}[{nm}]".ljust(20),
                  np.array2string(tru[i], precision=3),
                  np.array2string(per[i], precision=3),
                  np.array2string(rec[i], precision=3),
                  f"{relerr:7.1%}{flag}")


if __name__ == "__main__":
    kw = {}
    if "--steps" in _sys.argv:
        kw["steps"] = int(_sys.argv[_sys.argv.index("--steps") + 1])
    if "--res" in _sys.argv:
        kw["res"] = int(_sys.argv[_sys.argv.index("--res") + 1])
    if "--multi" in _sys.argv:
        kw["multi"] = True
    main(**kw)
