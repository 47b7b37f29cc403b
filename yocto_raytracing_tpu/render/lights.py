"""Area-light sampling: element CDFs + per-ray light-point sampling.

The reference builds per-element CDFs for area sampling
(yscn::update_lights, src/ext/yocto_scn.cpp:1748-1779: point counts,
line lengths, triangle areas via ym::sample_*_cdf) and then never uses
them — its renderer hard-codes point lights at ``shp->pos.front()``
(src/raytrace.cpp:121-130). This module wires those CDFs into an optional
stochastic soft-shadow mode: each ray samples ONE point on each emissive
shape (element by inverse-CDF, position uniform within the element,
ym::sample_triangle semantics) and shades with the same quirk-exact
ke/r^2 point-light model, so an emissive shape whose geometry is a single
point degenerates BIT-EXACTLY to the deterministic path — a property the
tests pin.

Sampling is in SHAPE SPACE, matching the reference's light convention
(light position = shape-space pos, transformed by the light frame at
shading time, raytrace.cpp:129-130).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene import PRIM_LINE, PRIM_POINT, PRIM_TRIANGLE
from ..ops import sampling as sampling_mod


def build_light_sampler(host, dev, meta):
    """Per-light element CDF tables -> dict pytree (None if no lights).

    For each light instance (every-component-positive ke, the shade rule),
    build the unnormalized running-sum CDF over the emissive shape's
    elements in POOL ORDER (points, then lines, then triangles — the
    unified prim pool layout), padded to the max element count.
    Returns dict(cdf (L, E) f32, n (L,) i32, prim_lo (L,) i32).
    """
    pool_off = list(meta.shape_prim_offset)
    lights = []
    for ist in host.instances:
        mat = host.materials[ist.material] if ist.material >= 0 else None
        if mat is None or not (mat.ke > 0).all():
            continue
        shp = host.shapes[ist.shape]
        weights = []
        if len(shp.points):
            weights.append(np.ones(len(shp.points), np.float32))
        if len(shp.lines):
            d = shp.pos[shp.lines[:, 1]] - shp.pos[shp.lines[:, 0]]
            weights.append(np.linalg.norm(d, axis=-1).astype(np.float32))
        if len(shp.triangles):
            c = np.cross(shp.pos[shp.triangles[:, 1]]
                         - shp.pos[shp.triangles[:, 0]],
                         shp.pos[shp.triangles[:, 2]]
                         - shp.pos[shp.triangles[:, 0]])
            weights.append(
                (0.5 * np.linalg.norm(c, axis=-1)).astype(np.float32))
        # an emissive shape with ZERO elements contributes nothing to the
        # prim pool, so pool_off[shape] is the NEXT shape's first prim —
        # sampling through it would pick another shape's geometry. Mark it
        # degenerate: sample_light_points falls back to the deterministic
        # light position (pos[0]) for that light, keeping the (L,) axis
        # aligned with scene.light_* order.
        degenerate = not weights
        w = (np.concatenate(weights) if weights
             else np.ones(1, np.float32))
        lights.append((np.cumsum(w).astype(np.float32),
                       pool_off[ist.shape], degenerate))
    if not lights:
        return None
    emax = max(len(c) for c, _, _ in lights)
    cdf = np.stack([np.pad(c, (0, emax - len(c)), mode="edge")
                    for c, _, _ in lights])
    return dict(
        cdf=jnp.asarray(cdf),
        n=jnp.asarray([len(c) for c, _, _ in lights], jnp.int32),
        prim_lo=jnp.asarray([lo for _, lo, _ in lights], jnp.int32),
        deg=jnp.asarray([d for _, _, d in lights], bool),
    )


def sample_light_points(scene, sampler, ruv):
    """Per-ray shape-space sample point on each light.

    ruv (N, 3): u01 variates (element select, then the element's own 1-2
    coordinates). Returns (L, N, 3) shape-space positions. With a single
    point element the CDF pick and the position both collapse to pos[0] —
    bit-equal to the deterministic point-light path.
    """
    cdf = sampler["cdf"]                      # (L, E)
    nl = sampler["n"]
    lo = sampler["prim_lo"]
    total = cdf[:, -1]                        # (L,)
    x = ruv[None, :, 0] * total[:, None]      # (L, N)
    # inverse CDF: count of strictly-smaller entries (searchsorted-right
    # as a dense compare — E is small for light shapes)
    idx = jnp.sum((cdf[:, None, :] < x[..., None]).astype(jnp.int32),
                  axis=-1)
    idx = jnp.clip(idx, 0, (nl - 1)[:, None])  # (L, N)
    prim = jnp.clip(lo[:, None] + idx, 0, scene.prim_v.shape[0] - 1)
    pv = scene.prim_v[prim]                    # (L, N, 3)
    ptype = scene.prim_type[prim]              # (L, N)
    v0 = scene.pos[pv[..., 0]]                 # (L, N, 3)
    v1 = scene.pos[pv[..., 1]]
    v2 = scene.pos[pv[..., 2]]
    u = ruv[None, :, 1:2]
    v = ruv[None, :, 2:3]
    tri = sampling_mod.sample_triangle(
        jnp.concatenate([u, v], axis=-1)
        * jnp.ones_like(v0[..., :2]), v0, v1, v2)
    line = v0 * (1.0 - u) + v1 * u
    out = jnp.where((ptype == PRIM_TRIANGLE)[..., None], tri,
                    jnp.where((ptype == PRIM_LINE)[..., None], line, v0))
    # element-less emissive shapes: deterministic pos[0] light position
    return jnp.where(sampler["deg"][:, None, None],
                     scene.light_pos[:, None, :], out)
