"""Texture sampling with exact reference semantics.

Parity: lookup_texture + eval_texture (src/raytrace.cpp:39-86):

* u8 texel -> linear via ``min(1, (p/255)^2.2)`` when srgb else gamma 1
  (the renderer never samples HDR textures);
* repeat wrap via C ``fmod`` (truncated toward zero, so negative uv produce
  negative lattice coordinates — the reference then reads out of bounds;
  we emulate its flat ``pixels[j*w + i]`` addressing, clamped into the
  allocation, which is identical for all in-range uv);
* bilinear with neighbor indices ``fmod(i+1, w)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def _lookup(scene, tid, i, j, srgb):
    """Texel fetch (N,) -> (N, 3) linear floats. i/j int32 lattice coords.

    One packed-i32 gather per tap (scene.tex_pack, r|g<<8|b<<16) + VPU
    shift/mask unpack — a u8[N,3] row gather costs ~3x more on TPU.
    """
    w = scene.tex_w[tid]
    h = scene.tex_h[tid]
    # emulate pixels[j*w + i] flat addressing of the original w-wide image,
    # clamped into the allocation (reads at negative/overflow uv are UB in
    # the reference; none occur in the supported scenes)
    flat = jnp.clip(j * w + i, 0, w * h - 1)
    jj = flat // jnp.maximum(w, 1)
    ii = flat % jnp.maximum(w, 1)
    packed = scene.tex_pack[tid, jj, ii]
    texel = jnp.stack([(packed & 0xFF).astype(jnp.float32),
                       ((packed >> 8) & 0xFF).astype(jnp.float32),
                       ((packed >> 16) & 0xFF).astype(jnp.float32)], axis=-1)
    gamma = jnp.where(srgb, jnp.float32(2.2), jnp.float32(1.0))
    return jnp.minimum(1.0, jnp.power(texel / 255.0, gamma))


def eval_texture(scene, tid: jnp.ndarray, uv: jnp.ndarray, srgb: bool):
    """Bilinear sample; tid (N,) int32 (>=0), uv (N, 2) -> (N, 3)."""
    w = scene.tex_w[tid].astype(jnp.float32)
    h = scene.tex_h[tid].astype(jnp.float32)
    s = jnp.fmod(uv[:, 0], 1.0) * w
    t = jnp.fmod(uv[:, 1], 1.0) * h
    i = jnp.floor(s)
    j = jnp.floor(t)
    i1 = jnp.fmod(i + 1, w)
    j1 = jnp.fmod(j + 1, h)
    wi = (s - i)[:, None]
    wj = (t - j)[:, None]
    i = i.astype(jnp.int32)
    j = j.astype(jnp.int32)
    i1 = i1.astype(jnp.int32)
    j1 = j1.astype(jnp.int32)
    cij = _lookup(scene, tid, i, j, srgb) * (1 - wi) * (1 - wj)
    ci1j = _lookup(scene, tid, i1, j, srgb) * wi * (1 - wj)
    cij1 = _lookup(scene, tid, i, j1, srgb) * (1 - wi) * wj
    ci1j1 = _lookup(scene, tid, i1, j1, srgb) * wi * wj
    return cij + ci1j + cij1 + ci1j1
