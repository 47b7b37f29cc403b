"""Texture sampling with exact reference semantics.

Parity: lookup_texture + eval_texture (src/raytrace.cpp:39-86):

* u8 texel -> linear via ``min(1, (p/255)^2.2)`` when srgb else gamma 1
  (the renderer never samples HDR textures);
* repeat wrap via C ``fmod`` (truncated toward zero, so negative uv produce
  negative lattice coordinates — the reference then reads out of bounds,
  which is UB; we emulate its flat ``pixels[j*w + i]`` addressing for the
  BASE tap, clamped into the allocation, and take the neighbor taps from
  the pre-baked 2x2 quad of that base — identical for all uv >= 0, where
  behavior is actually defined);
* bilinear with neighbor indices ``fmod(i+1, w)`` — pre-baked per lattice
  point into ``scene.tex_quad`` so the whole filter is ONE wide-row gather
  (TPU's gather engine is row-granular: a 4-lane row costs the same as a
  1-lane row and ~7x less than four separate taps).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unpack(packed):
    """(N,) i32 r|g<<8|b<<16 -> (N, 3) f32 in [0, 255]."""
    return jnp.stack([(packed & 0xFF).astype(jnp.float32),
                      ((packed >> 8) & 0xFF).astype(jnp.float32),
                      ((packed >> 16) & 0xFF).astype(jnp.float32)], axis=-1)


def eval_texture(scene, tid: jnp.ndarray, uv: jnp.ndarray, srgb: bool,
                 wh=None):
    """Bilinear sample; tid (N,) int32 (>=0), uv (N, 2) -> (N, 3).

    ``wh``: optional precomputed per-ray (w, h) f32 pair (e.g. riding the
    packed material row) — skips two per-ray gathers of tex_w/tex_h.
    """
    if wh is None:
        w = scene.tex_w[tid].astype(jnp.float32)
        h = scene.tex_h[tid].astype(jnp.float32)
    else:
        w, h = wh
    s = jnp.fmod(uv[:, 0], 1.0) * w
    t = jnp.fmod(uv[:, 1], 1.0) * h
    i = jnp.floor(s)
    j = jnp.floor(t)
    wi = (s - i)[:, None]
    wj = (t - j)[:, None]
    i = i.astype(jnp.int32)
    j = j.astype(jnp.int32)
    wi32 = w.astype(jnp.int32)
    h32 = h.astype(jnp.int32)
    # emulate pixels[j*w + i] flat addressing of the original w-wide image,
    # clamped into the allocation (reads at negative/overflow uv are UB in
    # the reference; none occur in the supported scenes)
    flat = jnp.clip(j * wi32 + i, 0, wi32 * h32 - 1)
    jj = flat // jnp.maximum(wi32, 1)
    ii = flat % jnp.maximum(wi32, 1)
    quad = scene.tex_quad[tid, jj, ii]            # (N, 4) i32
    gamma = jnp.where(srgb, jnp.float32(2.2), jnp.float32(1.0))

    def texel(k):
        return jnp.minimum(1.0, jnp.power(_unpack(quad[:, k]) / 255.0,
                                          gamma))

    return (texel(0) * (1 - wi) * (1 - wj)
            + texel(1) * wi * (1 - wj)
            + texel(2) * (1 - wi) * wj
            + texel(3) * wi * wj)
