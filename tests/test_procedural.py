"""Procedural image makers: byte-identity vs the reference C++.

The oracle compiles scripts/dump_procedural_ref.cpp against a patched copy
of the reference's yocto_math.h (constexpr relaxation only) and compares
raw RGBA bytes. Skipped when the reference tree or g++ is unavailable;
structural tests below run everywhere.
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from conftest import needs_reference
from yocto_raytracing_tpu import procedural

HERE = os.path.dirname(os.path.abspath(__file__))
SCRIPTS = os.path.join(os.path.dirname(HERE), "scripts")

W = H = 128
TILE = 32


@pytest.fixture(scope="module")
def oracle_dir(tmp_path_factory):
    if not os.path.isdir("/root/reference/src/ext"):
        pytest.skip("reference sources not mounted")
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    sys.path.insert(0, SCRIPTS)
    try:
        from measure_reference import patch_yocto_math
    finally:
        sys.path.pop(0)
    work = tmp_path_factory.mktemp("proc_oracle")
    patch_yocto_math("/root/reference/src/ext/yocto_math.h",
                     str(work / "yocto_math.h"))
    exe = str(work / "dump")
    subprocess.run(
        ["g++", "-O2", "-std=c++14", "-I", str(work),
         os.path.join(SCRIPTS, "dump_procedural_ref.cpp"), "-o", exe],
        check=True, capture_output=True, timeout=300)
    out = work / "out"
    out.mkdir()
    subprocess.run([exe, str(out)], check=True, timeout=120)
    return out


def _oracle(oracle_dir, name, dtype=np.uint8, comps=4):
    raw = np.fromfile(os.path.join(oracle_dir, name), dtype=dtype)
    return raw.reshape(H, W, comps)


CASES = [
    ("grid.bin", lambda: procedural.make_grid_image(W, H, TILE)),
    ("checker.bin", lambda: procedural.make_checker_image(W, H, TILE)),
    ("bumpdimple.bin", lambda: procedural.make_bumpdimple_image(W, H, TILE)),
    ("ramp.bin", lambda: procedural.make_ramp_image(
        W, H, (10, 20, 30, 255), (200, 100, 50, 255))),
    ("ramp_srgb.bin", lambda: procedural.make_ramp_image(
        W, H, (10, 20, 30, 255), (200, 100, 50, 255), srgb=True)),
    ("gammaramp.bin", lambda: procedural.make_gammaramp_image(W, H)),
    ("uv.bin", lambda: procedural.make_uv_image(W, H)),
    ("uvgrid.bin", lambda: procedural.make_uvgrid_image(W, H, TILE, True)),
    ("uvgrid_gray.bin",
     lambda: procedural.make_uvgrid_image(W, H, TILE, False)),
    ("recuvgrid.bin",
     lambda: procedural.make_recuvgrid_image(W, H, TILE, True)),
    ("bump_normal.bin", lambda: procedural.bump_to_normal_map(
        procedural.make_bumpdimple_image(W, H, TILE), 4.0)),
]


@needs_reference
@pytest.mark.parametrize("name,maker", CASES, ids=[c[0] for c in CASES])
def test_byte_identical_to_reference(oracle_dir, name, maker):
    ref = _oracle(oracle_dir, name)
    ours = maker()
    assert ours.shape == ref.shape and ours.dtype == np.uint8
    diff = np.argwhere(ours != ref)
    assert diff.size == 0, (
        f"{name}: {len(diff)} byte mismatches, first at {diff[:3].tolist()}")


# ---- structural checks (run without the reference) ----


def test_grid_structure():
    img = procedural.make_grid_image(64, 64, 16)
    assert img.shape == (64, 64, 4)
    assert (img[0, :, 0] == 90).all()       # edge row -> c0
    assert (img[8, 8] == [128, 128, 128, 255]).all()


def test_checker_structure():
    img = procedural.make_checker_image(64, 64, 16)
    assert (img[0, 0] == [90, 90, 90, 255]).all()
    assert (img[0, 16] == [128, 128, 128, 255]).all()


def test_bump_to_normal_unit_length():
    bump = procedural.make_bumpdimple_image(64, 64, 16)
    nm = procedural.bump_to_normal_map(bump, 4.0)
    n = nm[..., :3].astype(np.float32) / 255.0 * 2.0 - 1.0
    ln = np.linalg.norm(n, axis=-1)
    assert np.all(ln < 1.1) and np.all(ln > 0.85)
    assert nm[..., 3].min() == 255
