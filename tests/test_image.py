"""Image layer: tonemap semantics and HDR codec roundtrip."""

import os

import numpy as np

from yocto_raytracing_tpu import image as image_mod
from yocto_raytracing_tpu.io import hdr as hdr_mod


def test_tonemap_gamma_and_truncation():
    img = np.zeros((1, 4, 4), np.float32)
    img[0, :, 3] = 1.0
    img[0, 0, :3] = 0.5
    img[0, 1, :3] = 1.0
    img[0, 2, :3] = 2.0   # clamps to 255
    img[0, 3, :3] = 0.0
    out = image_mod.tonemap(img)
    # 0.5^(1/2.2) * 255 = 186.51... -> truncates to 186
    assert out[0, 0, 0] == 186
    assert out[0, 1, 0] == 255
    assert out[0, 2, 0] == 255
    assert out[0, 3, 0] == 0
    assert (out[..., 3] == 255).all()


def test_tonemap_exposure_scales_linearly():
    img = np.full((1, 1, 4), 0.25, np.float32)
    out0 = image_mod.tonemap(img, exposure=0.0, no_srgb=True)
    out2 = image_mod.tonemap(img, exposure=2.0, no_srgb=True)
    assert out0[0, 0, 0] == int(0.25 * 255)
    assert out2[0, 0, 0] == 255  # 0.25 * 4 = 1.0


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 4, size=(17, 23, 3)) ** 2).astype(np.float32)
    path = os.path.join(tmp_path, "t.hdr")
    hdr_mod.write_hdr(path, img)
    back = hdr_mod.read_hdr(path)
    assert back.shape == img.shape
    # RGBE stores an 8-bit mantissa at the MAX channel's exponent: per-pixel
    # absolute error is bounded by one mantissa step of the max channel
    step = img.max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(back - img) <= step + 1e-6).all()


def test_save_hdr_or_ldr_extension_switch(tmp_path):
    img = np.random.default_rng(1).uniform(
        0, 1, size=(8, 8, 4)).astype(np.float32)
    img[..., 3] = 1.0
    p_png = os.path.join(tmp_path, "o.png")
    p_hdr = os.path.join(tmp_path, "o.hdr")
    image_mod.save_hdr_or_ldr(p_png, img)
    image_mod.save_hdr_or_ldr(p_hdr, img)
    ldr = image_mod.load_image4b(p_png)
    np.testing.assert_array_equal(ldr, image_mod.tonemap(img))
    f = image_mod.load_image4f(p_hdr)
    step = img[..., :3].max(axis=-1, keepdims=True) / 128.0
    assert (np.abs(f[..., :3] - img[..., :3]) <= step + 1e-6).all()


def test_ldr_load_applies_gamma(tmp_path):
    u8 = np.zeros((2, 2, 4), np.uint8)
    u8[..., :3] = 128
    u8[..., 3] = 255
    p = os.path.join(tmp_path, "g.png")
    image_mod.save_image_png(p, u8)
    f = image_mod.load_image4f(p)
    np.testing.assert_allclose(f[..., 0], (128 / 255) ** 2.2, rtol=1e-5)
    np.testing.assert_allclose(f[..., 3], 1.0)
