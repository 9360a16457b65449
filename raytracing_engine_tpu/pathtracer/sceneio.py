"""Declarative JSON scene files for the path tracer.

The reference hardcodes its scene as Rust literals rebuilt per run
(/root/reference/src/main.rs:524-601); the data-driven analog here is a
small JSON schema that assembles the same PTScene SoA pytree a Python
caller would build via `build_pt_scene`, so scenes are shareable files
instead of code:

```json
{
  "materials": [
    {"albedo": [0.7, 0.6, 0.4]},
    {"albedo": [0, 0, 0], "emission": [10, 10, 10]},
    {"albedo": [0.9, 0.9, 0.9], "kind": "mirror"}
  ],
  "spheres": [
    {"center": [6, 4, 6], "radius": 1.5, "mat": 1}
  ],
  "meshes": [
    {"obj": "bunny.obj", "mat": 0, "scale": 2.0, "translate": [0, 8, 0]},
    {"icosphere": {"subdivisions": 3, "radius": 1.2}, "mat": 2},
    {"knot": {"segments": 400}, "mat": 0, "translate": [0, 8, 0]}
  ],
  "camera": {"position": [0, 0, 0], "quat": [0, 0, 0, 1]},
  "mesh_lights": false
}
```

- `kind` is "diffuse" (default), "mirror", or "dielectric" (smooth glass;
  optional `ior`, default 1.5; optional `dispersion` = ior spread between
  blue and red for chromatic refraction; `albedo` is optional there and
  defaults to [1,1,1] — a clear glass tints nothing).
- `checker`: optional per-material world-space checker texture
  `{"color": [r,g,b], "scale": cells-per-unit}` alternating with `albedo`.
- `meshes[*]` sources: `obj` (path relative to the JSON file), `icosphere`
  (accel.icosphere kwargs), `knot` (accel.torus_knot kwargs). `scale` and
  `translate` post-transform vertices. Each mesh gets ONE material.
  `"smooth": true` shades the mesh with barycentric-interpolated vertex
  normals (the OBJ's `vn` records when present, else area-weighted
  welded-vertex normals) — requires the cluster path (`--bvh` on TPU).
- `camera` is optional (origin, identity quat); `cli pt --scene f.json`
  uses it as the starting pose.
- `env`: gradient-sky environment light — `[r, g, b]` (constant) or
  `{"bottom": [r,g,b], "top": [r,g,b]}` (lerped on the ray's z). Escaped
  rays read it at full weight (BSDF-sampling-only, never NEE-sampled).
- `mesh_lights: true` routes emissive triangles through the area-CDF
  mesh-light sampler (required when emissive tris exceed the per-slot
  NEE unroll limit — build_pt_scene raises loudly otherwise).
- `instances`: the two-level (config-5 style) path — ONE base mesh
  replicated by a `grid` ({nx, ny, spacing, base}) and/or explicit
  `transforms` ([{translate, rotate_z, scale}, ...]), each instance
  shaded with material `mat`. Mutually exclusive with `meshes` (the
  instanced intersector traces spheres + instances only; a loose mesh
  would silently vanish — the loader refuses instead).

Unknown top-level or per-entry keys raise: a typo that silently dropped a
light would be a wrongness hazard, not a convenience.
"""

from __future__ import annotations

import json
import os

import numpy as np

from raytracing_engine_tpu.pathtracer.scene import (
    DIELECTRIC, DIFFUSE, MIRROR, PTScene, build_pt_scene)

_KINDS = {"diffuse": DIFFUSE, "mirror": MIRROR,
          "dielectric": DIELECTRIC}
_TOP_KEYS = {"materials", "spheres", "meshes", "camera", "mesh_lights",
             "env", "instances"}
_MAT_KEYS = {"albedo", "emission", "kind", "ior", "checker",
             "dispersion"}
_SPH_KEYS = {"center", "radius", "mat"}
_MESH_KEYS = {"obj", "icosphere", "knot", "mat", "scale", "translate",
              "smooth"}
_CAM_KEYS = {"position", "quat"}
_INST_KEYS = {"mesh", "mat", "grid", "transforms"}
_GRID_KEYS = {"nx", "ny", "spacing", "base"}
_XFORM_KEYS = {"translate", "rotate_z", "scale"}


def _check_keys(d: dict, allowed: set, what: str) -> None:
    extra = set(d) - allowed
    if extra:
        raise ValueError(f"unknown {what} key(s) {sorted(extra)}; "
                         f"allowed: {sorted(allowed)}")


def _mesh_tris(entry: dict, base_dir: str):
    """-> (tris (T,3,3), vnormals (T,3,3) | None). Normals are returned
    only for entries with `"smooth": true` — from the OBJ's `vn` records
    when present, else area-weighted welded-vertex normals
    (accel.mesh.smooth_vertex_normals). Uniform scale / translate leave
    normal directions unchanged."""
    sources = [k for k in ("obj", "icosphere", "knot") if k in entry]
    if len(sources) != 1:
        raise ValueError(f"mesh entry needs exactly one of obj/icosphere/"
                         f"knot, got {sources or 'none'}")
    src = sources[0]
    smooth = bool(entry.get("smooth", False))
    vn = None
    if src == "obj":
        from raytracing_engine_tpu.accel import load_obj

        path = entry["obj"]
        if not os.path.isabs(path):
            path = os.path.join(base_dir, path)
        if smooth:
            tris, vn = load_obj(path, normals=True)
        else:
            tris = load_obj(path)
    elif src == "icosphere":
        from raytracing_engine_tpu.accel import icosphere

        tris = icosphere(**entry["icosphere"])
    else:
        from raytracing_engine_tpu.accel import torus_knot

        tris = torus_knot(**entry["knot"])
    tris = np.asarray(tris, np.float32)
    if smooth and vn is None:
        from raytracing_engine_tpu.accel.mesh import smooth_vertex_normals

        vn = smooth_vertex_normals(tris)
    if "scale" in entry:
        tris = tris * np.float32(entry["scale"])
    if "translate" in entry:
        tris = tris + np.asarray(entry["translate"], np.float32)
    return tris, vn


def load_scene_json(path: str):
    """Load a JSON scene file.

    Returns (scene: PTScene, tris: (T,3,3) f32 | None, tri_mats: (T,) i32
    | None, cam_pos: (3,) f32, cam_quat: (4,) f32, instanced: dict | None,
    tri_normals: (T,3,3) f32 | None). tris/tri_mats/tri_normals feed
    accel.clusters.build_clusters / accel.build_bvh for the --bvh path;
    tri_normals is non-None when any mesh entry sets `"smooth": true`
    (flat entries then carry face normals per corner, so a mixed scene
    builds ONE smooth cluster table that shades each part correctly). `instanced` (from a top-level "instances" object:
    {"mesh": <mesh entry>, "mat": id, "grid": {nx, ny, spacing, base}} or
    explicit "transforms": [{"translate", "rotate_z", "scale"}, ...])
    carries {mesh (T,3,3), transforms [(rot3x3, trans3, scale)], mat} for
    accel.instancing.make_instances + make_instanced_clusters — the
    two-level path; mutually exclusive with "meshes" (the instanced
    intersector traces spheres + instances only).
    """
    with open(path) as f:
        spec = json.load(f)
    if not isinstance(spec, dict):
        raise ValueError(f"{path}: top level must be a JSON object")
    _check_keys(spec, _TOP_KEYS, "scene")
    base_dir = os.path.dirname(os.path.abspath(path))

    materials = []
    for i, m in enumerate(spec.get("materials", [])):
        _check_keys(m, _MAT_KEYS, f"materials[{i}]")
        kind = m.get("kind", "diffuse")
        if kind not in _KINDS:
            raise ValueError(f"materials[{i}].kind {kind!r} not in "
                             f"{sorted(_KINDS)}")
        mat = {"emission": tuple(m.get("emission", (0, 0, 0))),
               "kind": _KINDS[kind], "ior": float(m.get("ior", 1.5)),
               "dispersion": float(m.get("dispersion", 0.0))}
        if "checker" in m:  # {"color": [r,g,b], "scale": cells-per-unit}
            extra = set(m["checker"]) - {"color", "scale"}
            if extra:
                raise ValueError(f"materials[{i}].checker: unknown keys "
                                 f"{sorted(extra)}")
            mat["checker"] = {"color": tuple(m["checker"].get(
                "color", (0, 0, 0))), "scale": float(m["checker"].get(
                    "scale", 1.0))}
        if "albedo" in m:
            mat["albedo"] = tuple(m["albedo"])
        elif kind != "dielectric":
            raise ValueError(f"materials[{i}]: albedo is required for "
                             f"kind {kind!r}")
        materials.append(mat)
    n_mat = len(materials)

    def _mat_id(j, what):
        j = int(j)
        if not 0 <= j < n_mat:
            raise ValueError(f"{what}: mat {j} out of range "
                             f"(have {n_mat} materials)")
        return j

    spheres = []
    for i, s in enumerate(spec.get("spheres", [])):
        _check_keys(s, _SPH_KEYS, f"spheres[{i}]")
        spheres.append((tuple(s["center"]), float(s["radius"]),
                        _mat_id(s["mat"], f"spheres[{i}]")))

    tris = tri_mats = tri_normals = None
    parts, part_mats, part_ns = [], [], []
    for i, m in enumerate(spec.get("meshes", [])):
        _check_keys(m, _MESH_KEYS, f"meshes[{i}]")
        t, vn = _mesh_tris(m, base_dir)
        parts.append(t)
        part_ns.append(vn)
        part_mats.append(np.full(len(t), _mat_id(m.get("mat", 0),
                                                 f"meshes[{i}]"), np.int32))
    if parts:
        tris = np.concatenate(parts, axis=0)
        tri_mats = np.concatenate(part_mats, axis=0)
        if any(vn is not None for vn in part_ns):
            # mixed smooth/flat: flat parts store face normals per corner,
            # which interpolate back to exact flat shading
            def _flat(t):
                n = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
                ln = np.maximum(np.linalg.norm(n, axis=1, keepdims=True),
                                1e-30)
                return np.repeat((n / ln)[:, None, :], 3,
                                 axis=1).astype(np.float32)

            tri_normals = np.concatenate(
                [vn if vn is not None else _flat(t)
                 for t, vn in zip(parts, part_ns)], axis=0)

    env = spec.get("env")
    if isinstance(env, dict):
        extra = set(env) - {"bottom", "top"}
        if extra:
            raise ValueError(f"env: unknown keys {sorted(extra)}")
        env = (tuple(env.get("bottom", (0, 0, 0))),
               tuple(env.get("top", (0, 0, 0))))
    scene = build_pt_scene(
        spheres=spheres, triangles=tris, tri_mats=tri_mats,
        materials=materials,
        mesh_lights=bool(spec.get("mesh_lights", False)),
        env=env,
    )

    instanced = None
    if "instances" in spec:
        if parts:
            raise ValueError(
                "'instances' and 'meshes' cannot be combined: the "
                "two-level intersector traces spheres + instances only, "
                "so a loose mesh would silently vanish")
        inst = spec["instances"]
        _check_keys(inst, _INST_KEYS, "instances")
        if "mesh" not in inst:
            raise ValueError("instances.mesh is required")
        _check_keys(inst["mesh"], _MESH_KEYS - {"mat", "smooth"},
                    "instances.mesh")
        imesh, _ = _mesh_tris(inst["mesh"], base_dir)
        imat = _mat_id(inst.get("mat", 0), "instances")
        transforms = []
        if "grid" in inst:
            g = inst["grid"]
            _check_keys(g, _GRID_KEYS, "instances.grid")
            from raytracing_engine_tpu.accel.instancing import _rotation_z

            nx, ny = int(g["nx"]), int(g["ny"])
            spacing = float(g.get("spacing", 3.0))
            base = tuple(g.get("base", (0.0, 10.0, 0.0)))
            for i in range(nx):
                for j in range(ny):
                    theta = 0.7 * (i * ny + j)
                    t = (base[0] + (i - (nx - 1) / 2) * spacing,
                         base[1] + j * spacing,
                         base[2] + 0.4 * ((i + j) % 3))
                    transforms.append((_rotation_z(theta), t, 1.0))
        for k, x in enumerate(inst.get("transforms", [])):
            _check_keys(x, _XFORM_KEYS, f"instances.transforms[{k}]")
            from raytracing_engine_tpu.accel.instancing import _rotation_z

            transforms.append((_rotation_z(float(x.get("rotate_z", 0.0))),
                               tuple(x.get("translate", (0.0, 0.0, 0.0))),
                               float(x.get("scale", 1.0))))
        if not transforms:
            raise ValueError("instances needs a grid or a transforms list")
        instanced = {"mesh": imesh, "transforms": transforms, "mat": imat}

    cam = spec.get("camera", {})
    _check_keys(cam, _CAM_KEYS, "camera")
    cam_pos = np.asarray(cam.get("position", (0.0, 0.0, 0.0)), np.float32)
    cam_quat = np.asarray(cam.get("quat", (0.0, 0.0, 0.0, 1.0)), np.float32)
    if cam_pos.shape != (3,) or cam_quat.shape != (4,):
        raise ValueError("camera.position must be length 3, camera.quat "
                         "length 4")
    return scene, tris, tri_mats, cam_pos, cam_quat, instanced, tri_normals
