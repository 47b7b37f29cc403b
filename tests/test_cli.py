"""CLI flags and checkpoint/resume."""

import os

import numpy as np
import pytest

from conftest import needs_reference, reference_scene
from yocto_raytracing_tpu import cli, scene as scene_lib, testscenes
from yocto_raytracing_tpu.render import renderer as renderer_mod


def test_parser_defaults_match_reference():
    # raytrace.cpp:258-270: -r 720, -s 1, -a 0.1, -o out.png
    args = cli.build_parser().parse_args(["scene.obj"])
    assert args.resolution == 720
    assert args.samples == 1
    assert args.ambient == pytest.approx(0.1)
    assert args.output == "out.png"
    assert args.scenein == "scene.obj"


def test_parser_short_flags():
    args = cli.build_parser().parse_args(
        ["-r", "96", "-s", "3", "-a", "0.2", "-o", "x.hdr", "in.obj"])
    assert (args.resolution, args.samples, args.ambient, args.output) == (
        96, 3, pytest.approx(0.2), "x.hdr")


@needs_reference
def test_cli_end_to_end(tmp_path):
    out = os.path.join(tmp_path, "o.png")
    rc = cli.main(["-r", "32", "-s", "1", "-o", out,
                   reference_scene("simple")])
    assert rc == 0
    from yocto_raytracing_tpu import image as image_mod

    img = image_mod.load_image4b(out)
    assert img.shape == (32, 57, 4)
    assert img[..., :3].max() > 0


def test_checkpoint_resume(tmp_path):
    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    ck = os.path.join(tmp_path, "acc.npz")

    full = renderer_mod.render_image(dev, meta, 16, 16, 1, max_depth=2,
                                     chunk_pixels=64)
    # run with checkpointing, then truncate the snapshot to mid-render and
    # resume: result must be bit-identical
    renderer_mod.render_image(dev, meta, 16, 16, 1, max_depth=2,
                              chunk_pixels=64, checkpoint=ck)
    snap = np.load(ck)
    renderer_mod._atomic_savez(ck, key=snap["key"], done=128,
                               acc=snap["acc"][:128])
    resumed = renderer_mod.render_image(dev, meta, 16, 16, 1, max_depth=2,
                                        chunk_pixels=64, checkpoint=ck)
    np.testing.assert_array_equal(full, resumed)


def test_checkpoint_config_mismatch_ignored(tmp_path):
    host = testscenes.make_grad_scene()
    dev, meta = scene_lib.build_device_scene(host)
    dev = scene_lib.to_jax(dev)
    ck = os.path.join(tmp_path, "acc.npz")
    renderer_mod.render_image(dev, meta, 16, 16, 1, max_depth=2,
                              chunk_pixels=64, checkpoint=ck)
    # different samples: snapshot must be ignored, not misused
    a = renderer_mod.render_image(dev, meta, 16, 16, 2, max_depth=2,
                                  chunk_pixels=64)
    os.remove(ck)
    renderer_mod.render_image(dev, meta, 16, 16, 2, max_depth=2,
                              chunk_pixels=64, checkpoint=ck)
    b = renderer_mod.render_image(dev, meta, 16, 16, 2, max_depth=2,
                                  chunk_pixels=64, checkpoint=ck)
    np.testing.assert_array_equal(a, b)
