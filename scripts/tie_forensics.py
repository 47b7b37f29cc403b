"""Forensic classification of the instance10000 720p residuals (PARITY.md).

PARITY.md attributed the >1-step pixels on the instance scene to
exact-equal hit-distance ties. This script replaces attribution with
per-sample evidence (VERDICT r3 #7):

1. diff the two 720p @ 9 spp renders (ours vs the reference binary's),
   take the K worst >1-step pixels;
2. regenerate each pixel's 9 stratified sample rays bit-exactly ON THE
   BACKEND THAT RENDERED (TPU; traced-divisor camera path);
3. interrogate the REFERENCE's own intersector with those rays via
   scripts/tie_probe.cpp (links /tmp/refsrc/bin/libhwlib.a): BVH pick
   with barycentrics + the brute candidate set within 2 ULP of the pick;
4. query OUR production stream intersector with the same rays;
5. classify every flipped sample:
     near-tie flip — BOTH intersectors accept both picks, at hit
                 distances within ULPs of each other; each side's argmin
                 legitimately resolves to a different prim because the
                 two arithmetics round the (near-)equal t values in
                 opposite orders. The exact-equal tie (t bit-identical,
                 winner = traversal order) is the delta=0 special case.
                 The instance meshes contain coincident sheets (e.g.
                 shape-local triangles ~485-503 duplicated at
                 ~1515-1531), which is why these occur at all.
     edge-flip — the renderers DISAGREE on a single grazing triangle
                 test: the losing side rejects the other's pick by an
                 ULP-scale barycentric margin (w1, w2 or 1-w1-w2 barely
                 negative under its rounding of the same Moller-Trumbore
                 arithmetic). The probe prints both sides' barycentrics
                 in C99 hexfloat so the margin is visible bit-by-bit.
     grazing-amplification flip — the strongest evidence this class is
                 compiler-level, not semantic: OUR OWN arithmetic flips
                 the same test between two compilations (eager per-op vs
                 fused). Fusion rounds the normalized instance-local
                 direction 1 ULP differently per component; at a
                 silhouette ray the Moller-Trumbore denominator -> 0
                 amplifies that into ~1e-4 of barycentric margin —
                 crossing the w1+w2 <= 1 boundary. The C++'s compiler
                 makes the same class of choice with its own rounding.
                 (Samples at pixels with no primary-hit flip diverge the
                 same way at a shadow or mirror stage instead.)

Backend note: this MUST run on the same backend that produced the
"ours" render (the TPU): at these grazing margins the camera ray itself
differs by ULPs between backends, which is enough to change the verdict
— the first (CPU) run of this script proved that the hard way.

Usage: python scripts/tie_forensics.py  (expects the 720p renders cached
at /tmp/{ref,ours}_instance10000_720_s3.png). Output committed in
PARITY.md.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OBJ = "/root/reference/in/instance10000_pointlight/instance10000_pointlight.obj"
REF_PNG = "/tmp/ref_instance10000_720_s3.png"
OURS_PNG = "/tmp/ours_instance10000_720_s3.png"
PROBE = "/tmp/tie_probe"
SAMPLES = 3
TOP_K = 8


def setup_backend():
    # the default (TPU) backend: rays must be bit-identical to the ones
    # the diffed render traced (see docstring backend note)
    pass


def ensure_probe():
    subprocess.run(
        ["g++", "-O3", "-std=c++14", "-I", "/tmp/refsrc/src",
         os.path.join(REPO, "scripts", "tie_probe.cpp"),
         "/tmp/refsrc/bin/libhwlib.a", "-o", PROBE], check=True)


def worst_pixels(k):
    import numpy as np
    from PIL import Image

    ref = np.asarray(Image.open(REF_PNG).convert("RGBA"), np.int32)
    ours = np.asarray(Image.open(OURS_PNG).convert("RGBA"), np.int32)
    d = np.abs(ref - ours).max(axis=-1)
    js, iis = np.nonzero(d > 1)
    order = np.argsort(-d[js, iis], kind="stable")[:k]
    return [(int(iis[o]), int(js[o]), int(d[js[o], iis[o]]))
            for o in order], len(js)


def load_scene_once():
    from yocto_raytracing_tpu import scene as scene_lib

    host = scene_lib.load_scene(OBJ)
    dev, meta = scene_lib.build_device_scene(host)
    return host, dev, meta, scene_lib.to_jax(dev)


def sample_rays(scene, pixels, width, height):
    import numpy as np
    import jax.numpy as jnp

    from yocto_raytracing_tpu.render import camera as camera_mod

    spp = SAMPLES * SAMPLES
    ids = np.concatenate([
        np.arange((j * width + i) * spp, (j * width + i + 1) * spp)
        for i, j, _ in pixels]).astype(np.int32)
    _, uv = camera_mod.pixel_uv(jnp.int32(width), jnp.int32(height),
                                jnp.int32(SAMPLES), jnp.asarray(ids))
    ro, rd = camera_mod.eval_camera(scene, uv)
    return np.asarray(ro), np.asarray(rd)


def ours_hits(host, dev, meta, ro, rd):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from yocto_raytracing_tpu.ops import stream as stream_mod

    stream = stream_mod.build_stream_scene(host, dev, meta)
    stream = jax.tree_util.tree_map(jnp.asarray, stream)
    n = len(ro)
    res = stream_mod.intersect_stream(
        stream, jnp.asarray(ro), jnp.asarray(rd),
        jnp.full((n,), np.float32(1e-4)),
        jnp.full((n,), np.float32(3.4028235e38)))
    prim = np.asarray(res["prim"])
    inst = np.asarray(res["inst"])
    t = np.asarray(res["t"])
    hit = np.asarray(res["hit"])
    off = np.asarray(meta.shape_prim_offset)
    shape_of_inst = np.array([ist.shape for ist in host.instances])
    ei = np.where(hit, prim - off[shape_of_inst[inst]], -1)
    return inst, ei, t, hit


def our_eval_prim(host, inst_idx, ei, ro1, rd1, fused=False):
    """OUR Moller-Trumbore on one (instance, triangle) — raw barycentrics
    so a reject's margin is visible (ops/intersect.py, the same code the
    stream scan runs).

    ``fused=True`` compiles transform+test as ONE jitted program (the
    fusion context of the production render); eager mode compiles each op
    separately. At grazing incidence the two legitimately differ: fusion
    changes the last ULP of the normalized local direction, and den->0
    amplifies that into ~1e-4 of barycentric swing — the third residual
    mechanism (see classification in the module docstring)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from yocto_raytracing_tpu.ops import intersect as ix

    ist = host.instances[inst_idx]
    shp = host.shapes[ist.shape]
    v = shp.pos[shp.triangles[ei]]

    def run(axes, o, ro, rd, v0, v1, v2):
        lo, ld = ix.transform_ray_inverse(axes, o, ro, rd)
        return ix.intersect_triangle(
            lo, ld, jnp.float32(1e-4), jnp.float32(3.4028235e38),
            v0, v1, v2), ld

    fn = jax.jit(run) if fused else run
    (hit, t, w1, w2), ld = fn(
        jnp.asarray(ist.axes), jnp.asarray(ist.o),
        jnp.asarray(ro1)[None], jnp.asarray(rd1)[None],
        jnp.asarray(v[0])[None], jnp.asarray(v[1])[None],
        jnp.asarray(v[2])[None])
    return (bool(np.asarray(hit)[0]), float(np.asarray(t)[0]),
            float(np.asarray(w1)[0]), float(np.asarray(w2)[0]),
            np.asarray(ld)[0])


def run_probe(ro, rd):
    args = [PROBE, OBJ]
    for k in range(len(ro)):
        args += [float(x).hex() for x in ro[k]]
        args += [float(x).hex() for x in rd[k]]
    out = subprocess.run(args, capture_output=True, text=True,
                         check=True).stdout
    picks, cands, cur = {}, {}, None
    for line in out.splitlines():
        m = re.match(r"ray (\d+) bvh_pick ist=(-?\d+) ei=(-?\d+) t=(\S+) "
                     r"ew=(\S+),(\S+),(\S+)", line)
        if m:
            cur = int(m.group(1))
            picks[cur] = (int(m.group(2)), int(m.group(3)),
                          float.fromhex(m.group(4)),
                          tuple(float.fromhex(m.group(g))
                                for g in (5, 6, 7)))
            cands[cur] = []
            continue
        m = re.match(r"\s+cand ist=(\d+) ei=(\d+) t=(\S+)", line)
        if m:
            cands[cur].append((int(m.group(1)), int(m.group(2)),
                               float.fromhex(m.group(3))))
    return picks, cands


def main():
    import numpy as np

    setup_backend()
    ensure_probe()
    if not os.path.exists(OURS_PNG):
        print("ours 720p render missing; render it first (see docstring)")
        return 1

    pixels, n_off = worst_pixels(TOP_K)
    print(f"{n_off} pixels off by >1; probing the worst {len(pixels)}: "
          f"{[(i, j) for i, j, _ in pixels]}")

    from yocto_raytracing_tpu.render import renderer as renderer_mod

    width = renderer_mod.image_width(16 / 9, 720)
    host, dev, meta, scene = load_scene_once()
    ro, rd = sample_rays(scene, pixels, width, 720)
    picks, cands = run_probe(ro, rd)
    inst_o, ei_o, t_o, hit_o = ours_hits(host, dev, meta, ro, rd)

    spp = SAMPLES * SAMPLES
    n_tie = n_edge = n_graze = n_other = 0
    for px, (i, j, dmax) in enumerate(pixels):
        for s in range(spp):
            k = px * spp + s
            ri, re_, rt, rew = picks[k]
            op = (int(inst_o[k]), int(ei_o[k]))
            if (ri, re_) == op:
                continue
            t_ours = float(t_o[k])
            print(f"\npixel ({i},{j}) diff={dmax} sample {s}: "
                  f"ref ist={ri} ei={re_} t={rt.hex()} "
                  f"w=({rew[0].hex()}, {rew[1].hex()}, {rew[2].hex()})")
            print(f"  ours ist={op[0]} ei={op[1]} t={t_ours.hex()}")

            # ref's arithmetic on OUR pick (from the probe's candidate
            # window); our arithmetic on REF's pick (direct eval)
    
            ref_on_ours = next((c[2] for c in cands[k]
                                if (c[0], c[1]) == op), None)
            h2, t2, w1, w2, _ = (our_eval_prim(host, ri, re_, ro[k], rd[k])
                                 if ri >= 0
                                 else (False, 0.0, 0.0, 0.0, None))
            if h2:
                print(f"  our eval of ref pick: hit t={float(t2).hex()}")
            if ref_on_ours is not None:
                print(f"  ref eval of our pick: hit "
                      f"t={float(ref_on_ours).hex()}")

            rel = 2e-6  # ~16 f32 ULP
            if (h2 and ref_on_ours is not None
                    and abs(t2 - t_ours) <= rel * t_ours
                    and abs(ref_on_ours - rt) <= rel * rt):
                # both sides accept both prims at ULP-close distances;
                # each argmin is self-consistent: ours has t_ours <= t2,
                # ref has rt <= ref_on_ours
                exact = np.float32(rt) == np.float32(t_ours)
                n_tie += 1
                print(f"  -> NEAR-TIE FLIP"
                      f"{' (t bit-equal: exact tie)' if exact else ''}: "
                      f"both intersectors accept both prims; the two "
                      f"arithmetics order the near-equal t values "
                      f"oppositely (ours: {t_ours.hex()} <= "
                      f"{float(t2).hex()}; ref: {rt.hex()} <= "
                      f"{float(ref_on_ours).hex()})")
                continue
            if ri >= 0 and not h2 and (not hit_o[k] or t_ours > rt):
                m = min(w1, w2, 1.0 - (w1 + w2))
                print(f"  our eval of ref pick REJECTS: "
                      f"w1={float(w1).hex()} w2={float(w2).hex()} "
                      f"1-w1-w2={float(1.0 - (w1 + w2)).hex()}")
                if m > -1e-4:
                    n_edge += 1
                    print(f"  -> EDGE-FLIP: ours rejects the grazing hit "
                          f"by margin {m:.3e} (ULP-scale roundoff on the "
                          f"same Moller-Trumbore arithmetic)")
                    continue
            if ri >= 0 and h2 and (not hit_o[k] or t_ours > rt):
                # our EAGER eval accepts what the render missed: compare
                # against the FUSED (production) compilation of the same
                # arithmetic — grazing amplification of the last ULP of
                # the normalized local direction
                hf, tf, w1f, w2f, ldf = our_eval_prim(host, ri, re_,
                                                      ro[k], rd[k],
                                                      fused=True)
                _, _, w1e, w2e, lde = our_eval_prim(host, ri, re_,
                                                    ro[k], rd[k])
                print(f"  same arithmetic, two compilations: "
                      f"eager accept (w1+w2={float(w1e + w2e).hex()}), "
                      f"fused hit={hf} (w1+w2={float(w1f + w2f).hex()})")
                print(f"    local dir eager  "
                      f"{[float(x).hex() for x in lde]}")
                print(f"    local dir fused  "
                      f"{[float(x).hex() for x in ldf]}")
                if not hf:
                    n_graze += 1
                    print("  -> GRAZING-AMPLIFICATION FLIP: the fused "
                          "(production) compilation rounds the normalized "
                          "local direction 1 ULP differently; at this "
                          "silhouette ray den->0 amplifies that to ~1e-4 "
                          "of barycentric margin, flipping the accept. "
                          "The C++'s own compilation sits on the other "
                          "side of the same razor edge.")
                    continue
            if hit_o[k] and rt > t_ours and ref_on_ours is None:
                h3, t3, w13, w23, _ = our_eval_prim(host, op[0], op[1],
                                                    ro[k], rd[k])
                m = min(w13, w23, 1.0 - (w13 + w23))
                print(f"  our eval of our pick: hit={h3} "
                      f"w1={float(w13).hex()} w2={float(w23).hex()}")
                if h3 and m < 1e-4:
                    n_edge += 1
                    print(f"  -> EDGE-FLIP: ours accepts a grazing hit "
                          f"the reference rejects (margin {m:.3e})")
                    continue
            n_other += 1
            print("  -> UNCLASSIFIED")

    print(f"\nsummary over worst {len(pixels)} pixels: "
          f"{n_tie} near-tie flips, {n_edge} edge-flips, "
          f"{n_graze} grazing-amplification flips, {n_other} unclassified")
    ok = n_other == 0 and (n_tie + n_edge + n_graze) > 0
    print("VERDICT:", "PROVEN — every flipped sample is an ULP-scale "
          "grazing-incidence artifact (near-tie argmin crossover or "
          "single-test barycentric edge flip); no systematic divergence" if ok
          else "incomplete — unclassified flips remain")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
