"""Texture sampling vs a numpy bilinear oracle (in-range uv)."""

import numpy as np
import jax.numpy as jnp

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.render import texture as texture_mod


class _TexScene:
    """Minimal duck-typed scene carrying only texture fields."""

    def __init__(self, rgb, w, h):
        # quads baked on the LOGICAL (w, h) region like build_device_scene
        quads = []
        for r, ww, hh in zip(rgb, w, h):
            q = np.zeros(r.shape[:2] + (4,), np.int32)
            q[:hh, :ww] = scene_lib.pack_texel_quads(r[:hh, :ww])
            quads.append(q)
        self.tex_quad = jnp.asarray(np.stack(quads))
        self.tex_w = jnp.asarray(w, jnp.int32)
        self.tex_h = jnp.asarray(h, jnp.int32)


def _oracle(tex_u8, uv, srgb):
    h, w = tex_u8.shape[:2]
    out = np.zeros((len(uv), 3), np.float64)
    gamma = 2.2 if srgb else 1.0
    for k, (u, v) in enumerate(uv):
        s = np.fmod(np.float32(u), 1.0) * w
        t = np.fmod(np.float32(v), 1.0) * h
        i, j = int(np.floor(s)), int(np.floor(t))
        i1, j1 = int(np.fmod(i + 1, w)), int(np.fmod(j + 1, h))
        wi, wj = s - i, t - j

        def texel(ii, jj):
            return np.minimum(
                1.0, (tex_u8[jj, ii, :3] / 255.0) ** gamma)

        out[k] = (texel(i, j) * (1 - wi) * (1 - wj)
                  + texel(i1, j) * wi * (1 - wj)
                  + texel(i, j1) * (1 - wi) * wj
                  + texel(i1, j1) * wi * wj)
    return out


def test_bilinear_matches_oracle():
    rng = np.random.default_rng(11)
    tex = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    # pad into a larger allocation like build_device_scene does
    alloc = np.zeros((1, 16, 16, 3), np.uint8)
    alloc[0, :7, :5] = tex
    sc = _TexScene(alloc, [5], [7])

    uv = rng.uniform(0.001, 0.999, size=(64, 2)).astype(np.float32)
    tid = jnp.zeros(64, jnp.int32)
    for srgb in (True, False):
        got = np.asarray(texture_mod.eval_texture(
            sc, tid, jnp.asarray(uv), srgb))
        want = _oracle(tex, uv, srgb)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_repeat_wrap_beyond_one():
    rng = np.random.default_rng(12)
    tex = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    alloc = tex[None]
    sc = _TexScene(alloc, [4], [4])
    uv = np.array([[0.3, 0.6]], np.float32)
    uv_wrapped = uv + 2.0  # fmod(x + 2, 1) == fmod(x, 1) for x >= 0
    a = np.asarray(texture_mod.eval_texture(
        sc, jnp.zeros(1, jnp.int32), jnp.asarray(uv), True))
    b = np.asarray(texture_mod.eval_texture(
        sc, jnp.zeros(1, jnp.int32), jnp.asarray(uv_wrapped), True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@needs_reference
def test_device_scene_texture_tables():
    host = scene_lib.load_scene(reference_scene("simple"))
    dev, _ = scene_lib.build_device_scene(host)
    assert dev.tex_quad.shape[0] == len(host.textures)
    for i, t in enumerate(host.textures):
        if t.ldr is not None:
            assert dev.tex_h[i] == t.ldr.shape[0]
            assert dev.tex_w[i] == t.ldr.shape[1]
            np.testing.assert_array_equal(
                dev.tex_quad[i, : t.ldr.shape[0], : t.ldr.shape[1]],
                scene_lib.pack_texel_quads(t.ldr))
