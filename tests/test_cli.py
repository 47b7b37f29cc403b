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


def test_cli_load_error_clean_exit(tmp_path, capsys):
    # missing file / unknown extension -> message + exit 1, no traceback
    # (reference printf+exit(1)s, src/scene.cpp:119-122)
    rc = cli.main(["-r", "8", os.path.join(tmp_path, "nope.obj")])
    assert rc == 1
    err = capsys.readouterr().err
    assert err.startswith("error:") and "Traceback" not in err

    bad = os.path.join(tmp_path, "scene.xyz")
    open(bad, "w").close()
    rc = cli.main(["-r", "8", bad])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_config_from_args_roundtrip():
    # RenderConfig is the object the pipeline consumes; every CLI knob
    # must land in it
    args = cli.build_parser().parse_args(
        ["-r", "96", "-s", "3", "-a", "0.2", "-o", "x.hdr",
         "--camera", "1", "--max-depth", "5", "--chunk-pixels", "256",
         "--intersector", "bvh", "--checkpoint", "c.npz", "in.obj"])
    cfg = cli.config_from_args(args)
    assert cfg.resolution == 96 and cfg.samples == 3
    assert cfg.ambient == pytest.approx(0.2)
    assert (cfg.output, cfg.camera, cfg.max_depth) == ("x.hdr", 1, 5)
    assert (cfg.chunk_pixels, cfg.intersector, cfg.checkpoint) == (
        256, "bvh", "c.npz")
    assert cfg.to_dict()["resolution"] == 96


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
