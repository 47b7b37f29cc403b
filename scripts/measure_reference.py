"""Measure the reference C++ binary's wall-clock on this machine.

Fixes the bench-baseline provenance: instead of a hardcoded constant in
bench.py, this script builds the reference renderer (g++ -O3 via its own
CMake config, single-threaded render loop per src/raytrace.cpp:228-251),
times the benchmark configs, and writes ``BASELINE_MEASURED.json`` at the
repo root. bench.py picks that file up when present.

Usage:  python scripts/measure_reference.py [--skip-instance]

The reference needs three small compile fixes for modern g++ (constexpr
reinterpret_cast members and two missing includes); they are applied to a
COPY under /tmp/refsrc — /root/reference itself is never written.
"""

from __future__ import annotations
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REF = "/root/reference"
SRC = "/tmp/refsrc"
BIN = os.path.join(SRC, "bin", "raytrace")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BASELINE_MEASURED.json")

# (name, scene, resolution, samples-grid-side)
CONFIGS = [
    ("refl_512p_16spp", "refl_pointlight", 512, 4),
    ("instance10000_1024p_64spp", "instance10000_pointlight", 1024, 8),
]


def _is_elf(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(4) == b"\x7fELF"
    except OSError:
        return False


def patch_yocto_math(src_header: str, dst_header: str) -> None:
    """Copy yocto_math.h with the constexpr-reinterpret_cast members (ill-
    formed for modern g++) relaxed to inline. Reused by the procedural-
    image oracle test (tests/test_procedural.py)."""
    lines = open(src_header).read().split("\n")
    for ln in (1880, 1882, 1946, 1948):
        lines[ln - 1] = lines[ln - 1].replace("constexpr", "inline", 1)
    for ln in (2140, 2146, 2797, 2803, 2809, 2815, 2821, 2828, 2835, 6138):
        if lines[ln - 1].startswith("constexpr inline"):
            lines[ln - 1] = lines[ln - 1].replace("constexpr inline",
                                                  "inline", 1)
    open(dst_header, "w").write("\n".join(lines))


def build_reference() -> None:
    if _is_elf(BIN):
        return
    if os.path.isdir(SRC):
        shutil.rmtree(SRC)
    shutil.copytree(REF, SRC)
    ym = os.path.join(SRC, "src/ext/yocto_math.h")
    patch_yocto_math(ym, ym)
    scn = os.path.join(SRC, "src/ext/yocto_scn.h")
    txt = open(scn).read().split("\n")
    txt.insert(1, "#include <cstring>")
    open(scn, "w").write("\n".join(txt))
    obj = os.path.join(SRC, "src/ext/yocto_obj.cpp")
    txt = open(obj).read().split("\n")
    txt.insert(28, "#include <stdexcept>")
    open(obj, "w").write("\n".join(txt))

    bdir = os.path.join(SRC, "build2")
    os.makedirs(bdir, exist_ok=True)
    subprocess.run(["cmake", "..", "-DCMAKE_BUILD_TYPE=Release"], cwd=bdir,
                   check=True, capture_output=True)
    subprocess.run(["make", "-j"], cwd=bdir, check=True, capture_output=True)
    assert _is_elf(BIN), "reference build failed"


def time_config(scene: str, res: int, s: int, reps: int = 1) -> float:
    obj = os.path.join(SRC, "in", scene, f"{scene}.obj")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        subprocess.run([BIN, "-r", str(res), "-s", str(s), "-o",
                        "/tmp/ref_bench_out.png", obj], check=True,
                       capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-instance", action="store_true",
                    help="skip the ~10-minute instance10000 measurement")
    args = ap.parse_args()

    build_reference()
    results = {}
    if os.path.exists(OUT):  # resume: keep configs measured by a prior run
        with open(OUT) as f:
            results = json.load(f).get("configs", {})

    def write():
        payload = {
            "binary": "g++ -O3 single-thread build of /root/reference "
                      "(src/raytrace.cpp:228-251 render loop has no "
                      "threading)",
            "machine": os.uname().nodename,
            "measured_at": time.strftime("%Y-%m-%d"),
            "configs": results,
        }
        with open(OUT, "w") as f:
            json.dump(payload, f, indent=2)
            f.write("\n")

    for name, scene, res, s in CONFIGS:
        if args.skip_instance and "instance" in name:
            continue
        if name in results:
            continue
        # width = round(aspect * res); all benchmark cameras are 16:9
        width = int(16 / 9 * res + 0.5)
        secs = time_config(scene, res, s)
        rays = width * res * s * s
        results[name] = {
            "seconds": round(secs, 3),
            "rays": rays,
            "mrays_per_s": round(rays / secs / 1e6, 4),
            "note": "includes scene load + BVH build + PNG write "
                    "(render dominates)",
        }
        print(f"{name}: {secs:.2f}s = {rays / secs / 1e6:.3f} Mrays/s",
              flush=True)
        write()  # incremental: a killed run keeps completed configs
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
