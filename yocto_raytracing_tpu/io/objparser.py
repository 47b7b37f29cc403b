"""Wavefront OBJ/MTL parser with Yocto extensions.

From-scratch reimplementation of the loader *semantics* the reference render
path depends on (see SURVEY.md section 3.3), produced directly as flat numpy
arrays instead of the reference's three-layer pointer graph
(yobj::scene -> yscn::scene -> app scene).

Reproduced behaviors, with reference citations:

* directives v/vn/vt/vc/vr, f/l/p, o/g/s/usemtl/mtllib and the Yocto
  extensions ``c`` (camera), ``e`` (environment), ``i`` (instance)
  (src/ext/yocto_obj.cpp:401-496).
* texcoord V flip at parse time: ``v = 1 - v`` (src/ext/yocto_obj.cpp:409-411).
* vertex triplets ``pos/texcoord/norm/color/radius``; missing fields -> -1,
  negative indices relative to current count (src/ext/yocto_obj.cpp:142-169).
* new group on o/usemtl/g and on smoothing change (src/ext/yocto_obj.cpp:442-459);
  groups with no vertices dropped (src/ext/yocto_obj.cpp:500-507).
* per-group vertex dedup by full triplet in first-appearance order
  (src/ext/yocto_scn.cpp:310-319); attribute presence from the group's first
  vertex (src/ext/yocto_scn.cpp:376-382).
* faces: size 3 -> triangle, else fan triangulation (src/ext/yocto_scn.cpp:359-369);
  lines -> consecutive pairs; points -> single ids (src/ext/yocto_scn.cpp:337-351).
* MTL: Ke/Kd/Ks/Kr/Ns/illum + map_* texture slots (src/ext/yocto_obj.cpp:246-324);
  ``Ns -> rs`` roughness conversion ``rs = (2/(ns+2))^(1/4)``
  (src/ext/yocto_scn.cpp:253).
* MTL defaults: kd=ks=kr=ke=0, ns=1 (src/ext/yocto_obj.h:252-277).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ObjCamera:
    name: str
    ortho: bool
    yfov: float
    aspect: float
    aperture: float
    focus: float
    frame: np.ndarray  # (4, 3): rows x, y, z, o


@dataclass
class ObjMaterial:
    name: str = ""
    illum: int = 0
    ke: tuple = (0.0, 0.0, 0.0)
    kd: tuple = (0.0, 0.0, 0.0)
    ks: tuple = (0.0, 0.0, 0.0)
    kr: tuple = (0.0, 0.0, 0.0)
    ns: float = 1.0
    ke_txt: str = ""
    kd_txt: str = ""
    ks_txt: str = ""
    kr_txt: str = ""
    ns_txt: str = ""
    norm_txt: str = ""
    disp_txt: str = ""

    @property
    def rs(self) -> float:
        """Roughness from Phong exponent (src/ext/yocto_scn.cpp:253)."""
        return float((2.0 / (self.ns + 2.0)) ** 0.25)


@dataclass
class ObjShape:
    """One OBJ group, deduplicated and indexed (yscn::shape equivalent)."""

    name: str
    matname: str
    pos: np.ndarray | None = None       # (V, 3) f32
    norm: np.ndarray | None = None      # (V, 3) f32
    texcoord: np.ndarray | None = None  # (V, 2) f32
    radius: np.ndarray | None = None    # (V,)  f32
    points: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))
    lines: np.ndarray = field(default_factory=lambda: np.zeros((0, 2), np.int32))
    triangles: np.ndarray = field(default_factory=lambda: np.zeros((0, 3), np.int32))
    tetrahedra: np.ndarray = field(default_factory=lambda: np.zeros((0, 4), np.int32))


@dataclass
class ObjInstance:
    name: str
    objname: str
    frame: np.ndarray  # (4, 3)


@dataclass
class ObjEnvironment:
    name: str
    matname: str
    frame: np.ndarray  # (4, 3)


@dataclass
class ObjScene:
    shapes: list  # [ObjShape]; shape order = (object, group) file order
    materials: list  # [ObjMaterial] in mtllib order
    textures: list  # [str] unique texture paths in first-reference order
    cameras: list  # [ObjCamera]
    instances: list  # [ObjInstance]
    environments: list  # [ObjEnvironment]
    # objname -> [shape index] for instance resolution
    object_shapes: dict


_IDENT_FRAME = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=np.float32
)


def _parse_frame12(toks: list) -> np.ndarray:
    return np.array([float(t) for t in toks[:12]], dtype=np.float32).reshape(4, 3)


def _parse_triplet(tok: str, sizes: tuple) -> tuple:
    """'p/t/n/c/r' -> 5 resolved 0-based indices, -1 if absent.

    Mirrors parse_vertlist (src/ext/yocto_obj.cpp:142-169): empty field or
    missing -> -1; negative -> size + v; positive -> v - 1.
    """
    parts = tok.split("/")
    out = [-1, -1, -1, -1, -1]
    for i in range(min(len(parts), 5)):
        p = parts[i]
        if not p:
            out[i] = -1
            continue
        v = int(p)
        out[i] = sizes[i] + v if v < 0 else v - 1
    return tuple(out)


def load_mtl(filename: str) -> tuple:
    """Parse one .mtl file -> ([ObjMaterial], [texture paths in order]).

    Mirrors load_mtl (src/ext/yocto_obj.cpp:212-332). Texture options
    (-clamp/-bm) are parsed and skipped; the render path ignores them
    (lookup is always repeat-wrap, src/raytrace.cpp:66-67).
    """
    materials = []
    textures = []
    texture_set = set()
    cur = None

    def parse_texture(toks: list) -> str:
        if not toks:
            return ""
        path = toks[-1].replace("\\", "/")
        if path and path not in texture_set:
            textures.append(path)
            texture_set.add(path)
        return path

    with open(filename, "rt", errors="replace") as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            key, args = toks[0], toks[1:]
            if key == "newmtl":
                cur = ObjMaterial(name=args[0] if args else "")
                materials.append(cur)
            elif cur is None:
                continue
            elif key == "illum":
                cur.illum = int(args[0])
            elif key == "Ke":
                cur.ke = tuple(float(a) for a in args[:3])
            elif key == "Kd":
                cur.kd = tuple(float(a) for a in args[:3])
            elif key == "Ks":
                cur.ks = tuple(float(a) for a in args[:3])
            elif key == "Kr":
                cur.kr = tuple(float(a) for a in args[:3])
            elif key == "Ns":
                cur.ns = float(args[0])
            elif key == "map_Ke":
                cur.ke_txt = parse_texture(args)
            elif key == "map_Kd":
                cur.kd_txt = parse_texture(args)
            elif key == "map_Ks":
                cur.ks_txt = parse_texture(args)
            elif key == "map_Kr":
                cur.kr_txt = parse_texture(args)
            elif key == "map_Ns":
                cur.ns_txt = parse_texture(args)
            elif key in ("map_norm", "norm"):
                cur.norm_txt = parse_texture(args)
            elif key in ("map_disp", "disp"):
                cur.disp_txt = parse_texture(args)
            # Ka/Kt/Tr/d/Ni and other slots parsed by the reference are not
            # observable by its render path; ignored here.
    return materials, textures


def load_obj(filename: str, flip_texcoord: bool = True) -> ObjScene:
    """Parse an OBJ file into deduplicated indexed shapes.

    Dispatches to the native C++ geometry parser (native/yrt_native.cpp)
    when available — bit-identical output, ~10x faster on the 100k-line
    stress scene — else the pure-Python path below. c/i/e/mtllib directive
    lines and MTL files are always handled in Python (they are a handful of
    lines per scene).
    """
    from .. import native

    nat = native.parse_obj_native(filename, flip_texcoord)
    if nat is not None:
        return _assemble_from_native(filename, *nat)
    return _load_obj_python(filename, flip_texcoord)


def _scan_directives(filename: str):
    """Cheap second pass for the rare non-geometry directives."""
    cameras, instances, environments, mtllibs = [], [], [], []
    with open(filename, "rt", errors="replace") as f:
        for line in f:
            c0 = line[:1]
            if c0 not in ("c", "e", "i", "m"):
                continue
            toks = line.split()
            if not toks:
                continue
            key, args = toks[0], toks[1:]
            if key == "c":
                cameras.append(ObjCamera(
                    name=args[0], ortho=bool(int(args[1])),
                    yfov=float(args[2]), aspect=float(args[3]),
                    aperture=float(args[4]), focus=float(args[5]),
                    frame=_parse_frame12(args[6:18])))
            elif key == "e":
                environments.append(ObjEnvironment(
                    name=args[0] if args else "<unnamed>",
                    matname=args[1] if len(args) > 1 else "<unnamed_material>",
                    frame=_parse_frame12(args[2:14])))
            elif key == "i":
                instances.append(ObjInstance(
                    name=args[0] if args else "<unnamed>",
                    objname=args[1] if len(args) > 1 else "<unnamed_mesh>",
                    frame=_parse_frame12(args[2:14])))
            elif key == "mtllib":
                name = args[0] if args else ""
                if name and name not in mtllibs:
                    mtllibs.append(name)
    return cameras, instances, environments, mtllibs


def _load_materials(filename: str, mtllibs: list):
    dirname = os.path.dirname(filename)
    materials, textures, texture_set = [], [], set()
    for lib in mtllibs:
        mats, texs = load_mtl(os.path.join(dirname, lib))
        materials.extend(mats)
        for t in texs:
            if t not in texture_set:
                textures.append(t)
                texture_set.add(t)
    return materials, textures


def _assemble_from_native(filename: str, raw_shapes: list,
                          object_names: list) -> ObjScene:
    cameras, instances, environments, mtllibs = _scan_directives(filename)
    materials, textures = _load_materials(filename, mtllibs)
    shapes = []
    object_shapes: dict = {"": []}
    for name in object_names:
        object_shapes.setdefault(name, [])
    for r in raw_shapes:
        objname = object_names[r["object_id"]]
        object_shapes[objname].append(len(shapes))
        shapes.append(ObjShape(
            name=r["name"], matname=r["matname"], pos=r["pos"],
            norm=r["norm"], texcoord=r["texcoord"], radius=r["radius"],
            points=r["points"], lines=r["lines"], triangles=r["triangles"],
            tetrahedra=r.get("tetrahedra",
                             np.zeros((0, 4), np.int32))))
    return ObjScene(
        shapes=shapes, materials=materials, textures=textures,
        cameras=cameras, instances=instances, environments=environments,
        object_shapes=object_shapes)


def _load_obj_python(filename: str, flip_texcoord: bool = True) -> ObjScene:
    """Pure-Python reference implementation (see load_obj)."""
    pos_raw: list = []
    norm_raw: list = []
    texcoord_raw: list = []
    color_raw: list = []
    radius_raw: list = []

    # objects: list of (name, groups); group = dict with matname/groupname/
    # smoothing/verts(list of 5-tuples)/elems(list of (start, type, size))
    def new_group(matname, groupname, smoothing=True):
        return {
            "matname": matname,
            "groupname": groupname,
            "smoothing": smoothing,
            "verts": [],
            "elems": [],
        }

    objects = [("", [new_group("", "")])]
    cur_matname = ""
    mtllibs: list = []
    cameras: list = []
    instances: list = []
    environments: list = []

    with open(filename, "rt", errors="replace") as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            key = toks[0]
            args = toks[1:]
            if key == "v":
                pos_raw.append((float(args[0]), float(args[1]), float(args[2])))
            elif key == "vn":
                norm_raw.append((float(args[0]), float(args[1]), float(args[2])))
            elif key == "vt":
                u, v = float(args[0]), float(args[1])
                if flip_texcoord:
                    v = 1.0 - v
                texcoord_raw.append((u, v))
            elif key == "vc":
                color_raw.append(tuple(float(a) for a in args[:4]))
            elif key == "vr":
                radius_raw.append(float(args[0]))
            elif key in ("f", "l", "p", "t"):
                sizes = (len(pos_raw), len(texcoord_raw), len(norm_raw),
                         len(color_raw), len(radius_raw))
                g = objects[-1][1][-1]
                g["elems"].append((len(g["verts"]), key, len(args)))
                for tok in args:
                    g["verts"].append(_parse_triplet(tok, sizes))
            elif key == "o":
                name = args[0] if args else ""
                objects.append((name, [new_group(cur_matname, "")]))
            elif key == "usemtl":
                cur_matname = args[0] if args else ""
                objects[-1][1].append(new_group(cur_matname, ""))
            elif key == "g":
                name = args[0] if args else ""
                objects[-1][1].append(new_group(cur_matname, name))
            elif key == "s":
                name = args[0] if args else ""
                smoothing = name == "on"
                if objects[-1][1][-1]["smoothing"] != smoothing:
                    objects[-1][1].append(
                        new_group(cur_matname, name, smoothing))
            elif key == "mtllib":
                name = args[0] if args else ""
                if name and name not in mtllibs:
                    mtllibs.append(name)
            elif key == "c":
                cameras.append(ObjCamera(
                    name=args[0],
                    ortho=bool(int(args[1])),
                    yfov=float(args[2]),
                    aspect=float(args[3]),
                    aperture=float(args[4]),
                    focus=float(args[5]),
                    frame=_parse_frame12(args[6:18]),
                ))
            elif key == "e":
                environments.append(ObjEnvironment(
                    name=args[0] if args else "<unnamed>",
                    matname=args[1] if len(args) > 1 else "<unnamed_material>",
                    frame=_parse_frame12(args[2:14]),
                ))
            elif key == "i":
                instances.append(ObjInstance(
                    name=args[0] if args else "<unnamed>",
                    objname=args[1] if len(args) > 1 else "<unnamed_mesh>",
                    frame=_parse_frame12(args[2:14]),
                ))

    pos = np.asarray(pos_raw, dtype=np.float32).reshape(-1, 3)
    norm = np.asarray(norm_raw, dtype=np.float32).reshape(-1, 3)
    texcoord = np.asarray(texcoord_raw, dtype=np.float32).reshape(-1, 2)
    radius = np.asarray(radius_raw, dtype=np.float32).reshape(-1)

    # materials from all mtllibs
    dirname = os.path.dirname(filename)
    materials: list = []
    textures: list = []
    texture_set: set = set()
    for lib in mtllibs:
        mats, texs = load_mtl(os.path.join(dirname, lib))
        materials.extend(mats)
        for t in texs:
            if t not in texture_set:
                textures.append(t)
                texture_set.add(t)

    # convert groups -> shapes (dedup + index), yscn obj_to_scene semantics
    shapes: list = []
    object_shapes: dict = {"": []}
    for objname, groups in objects:
        object_shapes.setdefault(objname, [])
        for g in groups:
            if not g["verts"] or not g["elems"]:
                continue
            vert_map: dict = {}
            vert_ids = np.empty(len(g["verts"]), dtype=np.int32)
            for k, vert in enumerate(g["verts"]):
                idx = vert_map.get(vert)
                if idx is None:
                    idx = len(vert_map)
                    vert_map[vert] = idx
                vert_ids[k] = idx

            shp = ObjShape(name=objname + g["groupname"], matname=g["matname"])
            tris: list = []
            lins: list = []
            pts: list = []
            tets: list = []
            for start, etype, size in g["elems"]:
                ids = vert_ids[start:start + size]
                if etype == "f":
                    if size == 3:
                        tris.append((ids[0], ids[1], ids[2]))
                    else:
                        for i in range(2, size):
                            tris.append((ids[0], ids[i - 1], ids[i]))
                elif etype == "l":
                    for i in range(size - 1):
                        lins.append((ids[i], ids[i + 1]))
                elif etype == "p":
                    pts.extend(int(i) for i in ids)
                elif etype == "t" and size == 4:
                    # 't' tetrahedra (src/ext/yocto_obj.cpp:436-441); the
                    # reference's yscn conversion drops them, but the app
                    # scene model carries the field (src/scene.h:44) — we
                    # parse and carry too (dead on the render path there
                    # and here; intersector in ops/intersect.py)
                    tets.append((ids[0], ids[1], ids[2], ids[3]))
            shp.triangles = np.asarray(tris, dtype=np.int32).reshape(-1, 3)
            shp.lines = np.asarray(lins, dtype=np.int32).reshape(-1, 2)
            shp.points = np.asarray(pts, dtype=np.int32).reshape(-1)
            shp.tetrahedra = np.asarray(tets, dtype=np.int32).reshape(-1, 4)

            # attribute presence decided by the group's first vertex
            # (src/ext/yocto_scn.cpp:377-382)
            v0 = g["verts"][0]
            nverts = len(vert_map)
            keys = np.array(list(vert_map.keys()), dtype=np.int64)  # (V, 5)
            if v0[0] >= 0:
                shp.pos = np.zeros((nverts, 3), dtype=np.float32)
                sel = keys[:, 0] >= 0
                shp.pos[sel] = pos[keys[sel, 0]]
            if v0[1] >= 0:
                shp.texcoord = np.zeros((nverts, 2), dtype=np.float32)
                sel = keys[:, 1] >= 0
                shp.texcoord[sel] = texcoord[keys[sel, 1]]
            if v0[2] >= 0:
                shp.norm = np.zeros((nverts, 3), dtype=np.float32)
                sel = keys[:, 2] >= 0
                shp.norm[sel] = norm[keys[sel, 2]]
            if v0[4] >= 0:
                shp.radius = np.zeros(nverts, dtype=np.float32)
                sel = keys[:, 4] >= 0
                shp.radius[sel] = radius[keys[sel, 4]]
            # vertex color (v0[3]) is dropped by the app layer
            # (src/scene.cpp:183-195 copies no color)

            object_shapes[objname].append(len(shapes))
            shapes.append(shp)

    return ObjScene(
        shapes=shapes,
        materials=materials,
        textures=textures,
        cameras=cameras,
        instances=instances,
        environments=environments,
        object_shapes=object_shapes,
    )
