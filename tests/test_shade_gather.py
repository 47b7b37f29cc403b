"""r5 packed prim-row gather vs the r4 four-gather path.

eval_hit's packed (P, 25) prim table gathers the same f32 VALUES as the
legacy per-ray path (a gather of a gather), but the two lower as
different producer graphs, so XLA may contract the downstream
barycentric solve's a*b+c chains into fma() differently — the documented
fusion class (ops/stream.py module docstring, tie_forensics.py), which
near-grazing (den -> 0) pairs amplify by orders of magnitude. The
meaningful contracts are therefore end-to-end: the rendered frame
matches within tonemap quantization, and parameter gradients agree to
float tolerance (render/shade.py::eval_hit, YRT_SHADE_GATHER)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import image as image_mod
from yocto_raytracing_tpu import scene as scene_lib, testscenes
from yocto_raytracing_tpu.render import renderer
from yocto_raytracing_tpu.render import shade as shade_mod

W, H = 64, 32


def _setup():
    host = testscenes.make_random_scene(seed=3)
    dev, meta = scene_lib.build_device_scene(host)
    return scene_lib.to_jax(dev), meta


def _render(packed, dev, meta, monkeypatch):
    monkeypatch.setattr(shade_mod, "_PACKED_PRIM_GATHER", packed)
    ids = jnp.arange(W * H, dtype=jnp.int32)
    amb = jnp.asarray([0.1] * 3, jnp.float32)
    # fresh jit wrapper over the UNjitted trace_rays per flag value: the
    # flag is read at trace time and is not part of trace_rays' cache key
    fn = jax.jit(lambda sc: renderer.trace_rays.__wrapped__(
        sc, ids, amb, jnp.int32(W), jnp.int32(H), jnp.int32(1),
        max_depth=3, max_stack=meta.max_stack))
    return np.asarray(fn(dev)).reshape(H, W, 3)


def test_packed_gather_render_matches(monkeypatch):
    dev, meta = _setup()
    a = _render(True, dev, meta, monkeypatch)
    b = _render(False, dev, meta, monkeypatch)
    # radiance agrees to fusion-ULP level...
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
    # ...and is invisible after tonemap quantization (<= 1 u8 step)
    ta = image_mod.tonemap(np.concatenate(
        [a, np.ones((H, W, 1), np.float32)], axis=-1))
    tb = image_mod.tonemap(np.concatenate(
        [b, np.ones((H, W, 1), np.float32)], axis=-1))
    assert np.abs(ta.astype(np.int32) - tb.astype(np.int32)).max() <= 1


def test_packed_gather_gradients_match(monkeypatch):
    """Gradients to pos/norm flow through BOTH gather levels of the
    packed table and agree with the legacy path to float tolerance."""
    dev, meta = _setup()
    ids = jnp.arange(W * H, dtype=jnp.int32)
    amb = jnp.asarray([0.1] * 3, jnp.float32)

    def run(packed):
        monkeypatch.setattr(shade_mod, "_PACKED_PRIM_GATHER", packed)

        def loss(pos, norm):
            sc = dataclasses.replace(dev, pos=pos, norm=norm)
            rgb = renderer.trace_rays.__wrapped__(
                sc, ids, amb, jnp.int32(W), jnp.int32(H), jnp.int32(1),
                max_depth=2, max_stack=meta.max_stack,
                differentiable=True)
            return jnp.mean(rgb ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))(dev.pos, dev.norm)

    ga = run(True)
    gb = run(False)
    for x, y, nm in zip(ga, gb, ("pos", "norm")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=2e-4, atol=2e-6, err_msg=nm)
