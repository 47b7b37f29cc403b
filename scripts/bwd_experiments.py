"""Backward-pass experiments for the fwd+bwd north star (VERDICT r3 #2).

Measures, on the refl bench configuration (910x512-shaped ray batch,
16 spp worth of ids, depth 4, stream intersector, real TPU):

  fwd            — production forward (while_loop path)
  fwd_diff       — differentiable forward alone (scan path): the cost of
                   switching the depth loop to scan
  step_none      — train_step, remat=False (save all scan residuals)
  step_remat     — train_step, remat=True (jax.checkpoint on the depth
                   step; 'hits' saved so the traversal never replays)
  step_mat       — remat winner, trainable=materials+lights only (how
                   much of the backward is the geometry/texture scatter)

Prints one line per measurement (best of 3) + the bwd/fwd ratios.
GRADIENTS.md records the outcome.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFL = "/root/reference/in/refl_pointlight/refl_pointlight.obj"


def best_of(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from yocto_raytracing_tpu import scene as scene_lib
    from yocto_raytracing_tpu.ops import stream as stream_mod
    from yocto_raytracing_tpu.parallel import mesh as mesh_mod
    from yocto_raytracing_tpu.render import renderer

    host = scene_lib.load_scene(REFL)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = jax.tree_util.tree_map(
        jnp.asarray, stream_mod.build_stream_scene(host, dscene, meta))
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, 512)
    height = 512
    n = 1 << 18
    ids = jnp.arange(n, dtype=jnp.int32)
    amb = jnp.asarray([0.1] * 3, jnp.float32)
    target = jnp.zeros((n, 3), jnp.float32)
    kw = dict(width=width, height=height, samples=4, max_depth=4,
              max_stack=meta.max_stack, stream=stream)

    results = {}

    def run(name, fn):
        fn()  # compile
        dt = best_of(fn)
        results[name] = dt
        print(f"{name:12s} {dt*1e3:8.1f} ms   {n/dt/1e6:6.3f} Mrays/s",
              flush=True)

    def fwd():
        r = renderer.trace_rays(dscene, ids, amb, **kw)
        assert np.isfinite(float(r[0, 0]))

    def fwd_diff():
        r = renderer.trace_rays(dscene, ids, amb, differentiable=True,
                                **kw)
        assert np.isfinite(float(r[0, 0]))

    def step(remat, trainable=None):
        def go():
            _, loss = mesh_mod.train_step(
                dscene, ids, target, amb, jnp.float32(0.0),
                trainable=trainable, remat=remat, **kw)
            assert np.isfinite(float(loss))
        return go

    run("fwd", fwd)
    run("fwd_diff", fwd_diff)
    run("step_none", step(False))
    run("step_remat", step(True))
    run("step_mat", step(True, trainable=(
        "mat_kd", "mat_ks", "mat_ke", "mat_kr", "mat_rs", "light_ke")))

    f = results["fwd"]
    print(f"\nratios vs fwd: diff={results['fwd_diff']/f:.2f} "
          f"none={results['step_none']/f:.2f} "
          f"remat={results['step_remat']/f:.2f} "
          f"mat={results['step_mat']/f:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
