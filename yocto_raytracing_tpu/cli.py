"""Command-line renderer: ``python -m yocto_raytracing_tpu.cli``.

Mirrors the reference executable's interface (src/raytrace.cpp:256-287):
``raytrace [options] scenein`` with --resolution/-r (720), --samples/-s (1,
the stratified grid side, spp = s^2), --ambient/-a (0.1 grey),
--output/-o (out.png; .hdr writes float Radiance), plus the TPU-native
knobs: --camera, --max-depth, --chunk-pixels, --sharded (ray-parallel over
all local devices), --checkpoint (accumulator snapshot for resume).
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="yocto_raytracing_tpu",
        description="TPU-native wavefront raytracer")
    p.add_argument("scenein", help="input scene (.obj)")
    p.add_argument("--resolution", "-r", type=int, default=720,
                   help="vertical resolution (width = aspect * r)")
    p.add_argument("--samples", "-s", type=int, default=1,
                   help="stratified grid side; spp = s^2")
    p.add_argument("--ambient", "-a", type=float, default=0.1,
                   help="grey ambient level")
    p.add_argument("--output", "-o", default="out.png",
                   help="output image (.png tonemapped / .hdr float)")
    p.add_argument("--camera", type=int, default=0, help="camera index")
    p.add_argument("--max-depth", type=int, default=8,
                   help="mirror recursion cap")
    p.add_argument("--chunk-pixels", type=int, default=1 << 15,
                   help="pixels per compiled device chunk")
    p.add_argument("--sharded", action="store_true",
                   help="shard rays over all local devices")
    p.add_argument("--checkpoint", default="",
                   help="accumulator checkpoint path (resume if it exists)")
    p.add_argument("--intersector", choices=("stream", "bvh"),
                   default="stream",
                   help="stream: cluster-scan fast path (default); "
                        "bvh: stackless traversal oracle (bit-equal)")
    p.add_argument("--stochastic", action="store_true",
                   help="jittered AA + thin-lens DOF when the camera has "
                        "aperture > 0 (e.g. the simple scene's cam_dof, "
                        "select with --camera 1)")
    p.add_argument("--seed", type=int, default=0,
                   help="RNG seed for the stochastic modes")
    p.add_argument("--area-lights", action="store_true",
                   help="sample emissive shapes by element CDF (soft "
                        "shadows; averages over spp)")
    return p


def config_from_args(args) -> "RenderConfig":
    """Parsed argparse namespace -> the RenderConfig pytree the render
    pipeline consumes (the reference's five knobs + TPU execution knobs)."""
    from .utils import RenderConfig

    return RenderConfig(
        resolution=args.resolution, samples=args.samples,
        ambient=args.ambient, output=args.output, camera=args.camera,
        max_depth=args.max_depth, chunk_pixels=args.chunk_pixels,
        sharded=args.sharded, checkpoint=args.checkpoint,
        intersector=args.intersector, stochastic=args.stochastic,
        seed=args.seed, area_lights=args.area_lights)


def run(scenein: str, cfg: "RenderConfig") -> int:
    """Load + render + save under one config. Raises SceneLoadError."""
    from . import image as image_mod
    from . import scene as scene_lib
    from .render import renderer
    from .utils import get_logger, log_phase

    log = get_logger()

    with log_phase(f"loading scene {scenein}"):
        host = scene_lib.load_scene(scenein)

    with log_phase("building bvh + device scene"):
        dscene, meta = scene_lib.build_device_scene(host, camera=cfg.camera)
        light_sampler = None
        if cfg.area_lights:
            from .render import lights as lights_mod

            light_sampler = lights_mod.build_light_sampler(host, dscene,
                                                           meta)
        stream = None
        if cfg.intersector == "stream":
            import jax
            import jax.numpy as jnp

            from .ops import stream as stream_mod

            stream = stream_mod.build_stream_scene(host, dscene, meta)
            stream = jax.tree_util.tree_map(jnp.asarray, stream)
        dscene = scene_lib.to_jax(dscene)

    cam = host.cameras[cfg.camera]
    width = renderer.image_width(cam.aspect, cfg.resolution)
    height = cfg.resolution
    spp = cfg.samples * cfg.samples
    log.info("scene: %d instances, %d prims, %d bvh nodes, %d lights",
             meta.num_instances, meta.num_prims, meta.num_nodes,
             meta.num_lights)

    with log_phase(f"rendering {width}x{height} @ {spp} spp",
                   rays=width * height * spp):
        if cfg.sharded:
            from . import parallel

            mesh = parallel.make_ray_mesh()
            img = parallel.render_image_sharded(
                dscene, meta, mesh, width, height, cfg.samples,
                ambient=cfg.ambient, max_depth=cfg.max_depth,
                chunk_pixels=cfg.chunk_pixels, stream=stream,
                stochastic=cfg.stochastic, seed=cfg.seed,
                light_sampler=light_sampler)
        else:
            img = renderer.render_image(
                dscene, meta, width, height, cfg.samples,
                ambient=cfg.ambient, max_depth=cfg.max_depth,
                chunk_pixels=cfg.chunk_pixels,
                checkpoint=cfg.checkpoint or None, stream=stream,
                stochastic=cfg.stochastic, seed=cfg.seed,
                light_sampler=light_sampler)

    with log_phase(f"saving image {cfg.output}"):
        image_mod.save_hdr_or_ldr(cfg.output, img)
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .scene import SceneLoadError

    try:
        return run(args.scenein, config_from_args(args))
    except SceneLoadError as e:
        # clean exit, mirroring the reference's printf+exit(1) on load
        # failure (src/scene.cpp:119-122) — no traceback for a user error
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
