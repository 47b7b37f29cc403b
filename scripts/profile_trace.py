"""Capture a ``jax.profiler`` trace of one bench frame (VERDICT r4 #6).

SURVEY §5 names profiler traces as the rebuild analogue of the
reference's (unused) ``yu::timer`` (src/ext/yocto_utils.h:1038-1073).
The r4 frame decomposition (PERF.md "Measured frame decomposition") was
derived by rendering VARIANT scenes (no-light build etc.); this captures
the op-level truth for the production refl bench frame so the two can be
reconciled.

Writes the trace to ``traces/<ts>`` (xplane protobuf; summarized into
PERF.md — the raw artifact is large and env-specific, so the committed
evidence is the summary table printed here, derived with
``xprof``/tensorboard-free parsing of the .xplane.pb when available, else
the trace directory listing + device total).

Usage: python scripts/profile_trace.py [outdir]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import glob
import time

import jax
import jax.numpy as jnp

from yocto_raytracing_tpu import scene as scene_lib
from yocto_raytracing_tpu.ops import stream as stream_mod
from yocto_raytracing_tpu.render import renderer

SCENE = "/root/reference/in/refl_pointlight/refl_pointlight.obj"
RES = 512
SAMPLES = 4
CHUNK = 1 << 14


def main(outdir="/tmp/yrt_trace"):
    host = scene_lib.load_scene(SCENE)
    dscene, meta = scene_lib.build_device_scene(host)
    stream = stream_mod.build_stream_scene(host, dscene, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    dscene = scene_lib.to_jax(dscene)
    cam = host.cameras[0]
    width = renderer.image_width(cam.aspect, RES)
    height = RES
    import bench

    frame = bench.make_frame_fn(dscene, meta, stream, width, height,
                                SAMPLES, max_depth=4, chunk=CHUNK)

    frame()  # compile outside the trace
    t0 = time.perf_counter()
    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        frame()
    wall = time.perf_counter() - t0
    print(f"traced frame wall: {wall:.2f}s -> {outdir}")
    files = sorted(glob.glob(_os.path.join(outdir, "**", "*"),
                             recursive=True))
    for f in files:
        if _os.path.isfile(f):
            print(f"  {_os.path.getsize(f):>12,}  {f}")

    # summarize device op time from the perfetto trace (self-contained
    # JSON — no tensorboard/xprof needed in this image)
    tjs = [f for f in files if f.endswith("trace.json.gz")]
    if tjs:
        summarize_perfetto(tjs[-1])



def summarize_perfetto(path: str, top=30):
    """Op-level device-time table from the perfetto trace JSON."""
    import gzip
    import json as _json
    import re

    with gzip.open(path, "rt") as f:
        doc = _json.load(f)
    events = doc["traceEvents"] if isinstance(doc, dict) else doc
    # device track pids: process_name metadata containing TPU
    dev_pids = set()
    for ev in events:
        if (ev.get("ph") == "M" and ev.get("name") == "process_name"
                and re.search(r"TPU|tpu",
                              str(ev.get("args", {}).get("name", "")))):
            dev_pids.add(ev["pid"])
    if not dev_pids:
        names = sorted({str(ev.get("args", {}).get("name", ""))
                        for ev in events
                        if ev.get("ph") == "M"
                        and ev.get("name") == "process_name"})
        print(f"(no TPU device track in trace; process tracks: {names})")
        return
    totals = {}
    t_lo, t_hi = float("inf"), 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = float(ev.get("dur", 0))           # us
        nm = ev.get("name", "?")
        # collapse fusion instances: strip trailing .N / digits
        key = re.sub(r"[.\d]+$", "", nm)
        totals[key] = totals.get(key, 0.0) + dur
        ts = float(ev.get("ts", 0))
        t_lo = min(t_lo, ts)
        t_hi = max(t_hi, ts + dur)
    total = sum(totals.values())
    print(f"\ndevice op time {total/1e6:.3f} s over a "
          f"{(t_hi - t_lo)/1e6:.3f} s span; top ops:")
    for nm, us in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e6:9.4f} s  {100*us/max(total,1e-9):5.1f}%  "
              f"{nm[:90]}")


if __name__ == "__main__":
    main(*_sys.argv[1:2])
