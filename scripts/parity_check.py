"""Full acceptance run: render reference scenes with BOTH renderers and
diff pixel-exact -> PARITY.md.

Two settings per scene:
* 128p @ 1 spp — the fast verification bar (maxdiff <= 1, zero pixels off
  by > 1, except documented grazing ties on instance10000);
* 1280x720 @ 9 spp (-r 720 -s 3) — the reference's own acceptance
  artifact (/root/reference/run.sh), its golden suite's exact settings.

The oracle is the g++ -O3 rebuild of the reference
(scripts/measure_reference.py builds it at /tmp/refsrc/bin/raytrace).
The lines scene's .obj is missing from the upstream snapshot (SURVEY §4);
"lines" here synthesizes the stand-in hair scene (testscenes.
make_hair_scene, seeded -> reproducible), writes it to OBJ through
io/objwriter, and renders THAT file with both renderers — the reference
binary parses the l/vr extensions itself, so its capsule intersector
(src/scene.cpp:285-307) and hair BRDF (src/raytrace.cpp:162-175) are the
oracle, not our own goldens.

Usage: python scripts/parity_check.py [--full] [scenes...]
"""
import argparse
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
BIN = "/tmp/refsrc/bin/raytrace"
SCENES = ["simple", "basic", "refl", "lines", "instance10000"]
LINES_OBJ = "/tmp/lines_scene/lines_pointlight.obj"


def ensure_lines_obj():
    """Synthesize the lines stand-in scene and write it to OBJ (seeded,
    so repeated runs produce a bit-identical file)."""
    if os.path.exists(LINES_OBJ):
        return
    from yocto_raytracing_tpu import testscenes
    from yocto_raytracing_tpu.io import objwriter

    os.makedirs(os.path.dirname(LINES_OBJ), exist_ok=True)
    objwriter.save_obj(testscenes.make_hair_scene(256), LINES_OBJ)


def ensure_oracle():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_reference import build_reference

    build_reference()


def scene_obj(scene, for_oracle):
    if scene == "lines":
        ensure_lines_obj()
        return LINES_OBJ
    root = "/tmp/refsrc" if for_oracle else "/root/reference"
    return f"{root}/in/{scene}_pointlight/{scene}_pointlight.obj"


def oracle_png(scene, res, s):
    out = f"/tmp/ref_{scene}_{res}_s{s}.png"
    if not os.path.exists(out):
        obj = scene_obj(scene, for_oracle=True)
        subprocess.run([BIN, "-r", str(res), "-s", str(s), "-o", out, obj],
                       check=True, capture_output=True,
                       cwd=os.path.dirname(obj))
    from PIL import Image

    with Image.open(out) as im:
        return np.asarray(im.convert("RGBA"), np.uint8)


def ours_png(scene, res, s):
    from yocto_raytracing_tpu import image as image_mod
    from yocto_raytracing_tpu.render import renderer

    obj = scene_obj(scene, for_oracle=False)
    t0 = time.perf_counter()
    out, *_ = renderer.render_scene_file(obj, resolution=res, samples=s,
                                         max_depth=8)
    dt = time.perf_counter() - t0
    return image_mod.tonemap(out), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run the 1280x720 @ 9 spp acceptance config")
    ap.add_argument("scenes", nargs="*", default=None)
    args = ap.parse_args()
    scenes = args.scenes or SCENES

    ensure_oracle()
    configs = [(128, 1)] + ([(720, 3)] if args.full else [])
    rows = []
    for scene in scenes:
        for res, s in configs:
            ref = oracle_png(scene, res, s)
            ldr, dt = ours_png(scene, res, s)
            assert ldr.shape == ref.shape, (ldr.shape, ref.shape)
            d = np.abs(ref.astype(np.int32) - ldr.astype(np.int32))
            off2 = int((d.max(axis=-1) > 1).sum())
            rows.append((scene, res, s * s, int(d.max()), off2,
                         d.shape[0] * d.shape[1], dt))
            print(f"{scene} {res}p {s*s}spp: maxdiff={d.max()} "
                  f"off_by_gt1={off2}/{d.shape[0]*d.shape[1]} "
                  f"({dt:.1f}s ours)", flush=True)

    path = os.path.join(REPO, "PARITY.md")
    with open(path, "w") as f:
        f.write(
            "# Forward parity vs the reference binary\n\n"
            "Pixel diffs of tonemapped u8 output against the g++ -O3\n"
            "rebuild of the reference renderer at matched settings\n"
            "(oracle: scripts/measure_reference.py; driver:\n"
            "scripts/parity_check.py). 720p @ 9 spp (`-r 720 -s 3`) is the\n"
            "reference's own acceptance configuration (run.sh + check/).\n"
            "Renders use the production defaults: stream cluster-scan\n"
            "intersector, tile-ordered fused dispatch, depth-8 mirror cap\n"
            "(the reference recurses unboundedly; kr^8 < 1 u8 step on\n"
            "every scene).\n\n"
            "| scene | res | spp | max channel diff | pixels off by >1 "
            "| pixels | ours (s, incl. load+compile-cache) |\n"
            "|---|---|---|---|---|---|---|\n")
        for scene, res, spp, mx, off2, npx, dt in rows:
            f.write(f"| {scene} | {res}p | {spp} | {mx} | {off2} | {npx} |"
                    f" {dt:.1f} |\n")
        f.write(
            "\nAcceptance bar: every channel within 1 u8 step; a handful\n"
            "of pixels off by more than 1 step are accepted only on the\n"
            "instance scene (exact-equal hit-distance ties between\n"
            "abutting coplanar prims resolve by f32-vs-SSE rounding at\n"
            "grazing incidence — see .claude/skills/verify/SKILL.md) and,\n"
            "at 9 spp, isolated silhouette-boundary samples on every\n"
            "scene. The lines scene's .obj is absent upstream; its row\n"
            "renders the synthesized hair scene written out to OBJ through\n"
            "io/objwriter with BOTH renderers (the reference binary parses\n"
            "the l/vr extensions itself — see module docstring).\n"
            "\nGenerated by scripts/parity_check.py --full.\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
