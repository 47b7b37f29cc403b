"""Test environment: CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a host-platform device mesh
(``--xla_force_host_platform_device_count``), the single-process stand-in
for a TPU pod slice; the real-chip path is exercised by bench.py.
Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# jax may already be imported by interpreter startup hooks (sitecustomize in
# this image), so env vars alone are too late for the platform choice;
# config.update still works because no backend is initialized yet. XLA_FLAGS
# is read lazily at backend init, so setting it here is safe either way.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_enable_fast_math" not in _flags:
    # XLA:CPU fast-math is ON by default: LLVM then approximates f32
    # division (85.5/171 != 0.5!) and assumes no-NaNs, breaking the slab
    # test's NaN-drop semantics. TPU hardware is IEEE; the CPU harness must
    # match it for pixel parity.
    _flags += " --xla_cpu_enable_fast_math=false"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # never grab the real TPU

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def reference_scene(name: str) -> str:
    return os.path.join(REFERENCE_DIR, "in", f"{name}_pointlight",
                        f"{name}_pointlight.obj")


needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_DIR, "in")),
    reason="reference scene assets not mounted",
)


@pytest.fixture(scope="session")
def goldens_dir():
    return os.path.join(os.path.dirname(__file__), "goldens")


def load_png_rgba(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)


def assert_golden_match(ldr: np.ndarray, golden_path: str, max_off_by_2=0):
    """Pixel-parity bar vs the oracle.

    Every channel within 1 u8 step, with an optional budget of
    ``max_off_by_2`` straggler pixels (grazing-incidence lanes where f32
    vs C++ SSE rounding legitimately flips a near-tie).
    """
    ref = load_png_rgba(golden_path)
    assert ldr.shape == ref.shape, (ldr.shape, ref.shape)
    d = np.abs(ref.astype(np.int32) - ldr.astype(np.int32))
    worst = int(d.max())
    n_off2 = int((d.max(axis=-1) > 1).sum())
    assert n_off2 <= max_off_by_2, (
        f"maxdiff={worst}, pixels off by >1: {n_off2} "
        f"(budget {max_off_by_2})")
