"""Path-tracer scene: spheres + triangle meshes + physically-based materials.

Extends the parity renderer's sphere scene (scene/types.py) with triangles
and emission, per the north star (BASELINE.json): SoA arrays, static padded
shapes, host-built light table for next-event estimation.

Material model (BASELINE config 2: diffuse/specular/emissive):
    kind 0 = DIFFUSE  — Lambertian, albedo/π BRDF, cosine-sampled
    kind 1 = MIRROR   — perfect specular reflection (delta; skipped by NEE)
    emission is a per-material RGB; any primitive with a nonzero-emission
    material is a light for NEE.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
import jax.numpy as jnp

DIFFUSE = 0
MIRROR = 1
EMISSIVE = 2  # alias: a diffuse surface whose emission dominates


def _pad(a, n, fill=0.0):
    a = np.asarray(a, np.float32)
    if a.shape[0] == n:
        return a
    pad = np.full((n - a.shape[0],) + a.shape[1:], fill, np.float32)
    return np.concatenate([a, pad], axis=0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PTScene:
    # spheres (SoA, padded)
    sph_pos: jax.Array      # (S, 3)
    sph_radius: jax.Array   # (S,)
    sph_mat: jax.Array      # (S,) int32
    sph_count: jax.Array    # () int32
    # triangles (SoA, padded): v0 + edge vectors for Möller–Trumbore
    tri_v0: jax.Array       # (T, 3)
    tri_e1: jax.Array       # (T, 3)
    tri_e2: jax.Array       # (T, 3)
    tri_mat: jax.Array      # (T,) int32
    tri_count: jax.Array    # () int32
    # materials
    mat_albedo: jax.Array   # (M, 3)
    mat_emission: jax.Array # (M, 3)
    mat_kind: jax.Array     # (M,) int32
    # NEE light table (host-built from emissive primitives)
    light_kind: jax.Array   # (L,) int32 — 0 sphere, 1 triangle
    light_prim: jax.Array   # (L,) int32 — index into the primitive arrays
    light_area: jax.Array   # (L,) f32   — surface area (uniform-area pdf)
    light_le: jax.Array     # (L, 3) f32 — emitted radiance (precomputed)
    light_count: jax.Array  # () int32

    @property
    def num_sphere_slots(self) -> int:
        return self.sph_pos.shape[0]

    @property
    def num_triangle_slots(self) -> int:
        return self.tri_v0.shape[0]


def build_pt_scene(
    spheres=(),          # sequence of (center(3,), radius, mat_id)
    triangles=None,      # (T, 3, 3) vertex array (v0, v1, v2 per row)
    tri_mats=None,       # (T,) material ids
    materials=(),        # sequence of dicts: albedo(3,), emission(3,), kind
    sphere_pad: int | None = None,
    tri_pad: int | None = None,
    light_pad: int | None = None,
) -> PTScene:
    """Host-side scene assembly: pads SoA arrays, derives the light table."""
    S = len(spheres)
    sphere_pad = sphere_pad or max(S, 1)
    sph_pos = np.zeros((sphere_pad, 3), np.float32)
    sph_radius = np.zeros((sphere_pad,), np.float32)
    sph_mat = np.zeros((sphere_pad,), np.int32)
    for i, (c, r, m) in enumerate(spheres):
        sph_pos[i] = c
        sph_radius[i] = r
        sph_mat[i] = m

    if triangles is None:
        triangles = np.zeros((0, 3, 3), np.float32)
        tri_mats = np.zeros((0,), np.int32)
    triangles = np.asarray(triangles, np.float32)
    tri_mats = np.asarray(tri_mats, np.int32)
    T = triangles.shape[0]
    tri_pad = tri_pad or max(T, 1)
    v0 = _pad(triangles[:, 0], tri_pad)
    e1 = _pad(triangles[:, 1] - triangles[:, 0], tri_pad)
    e2 = _pad(triangles[:, 2] - triangles[:, 0], tri_pad)
    tmat = np.zeros((tri_pad,), np.int32)
    tmat[:T] = tri_mats

    M = max(len(materials), 1)
    mat_albedo = np.zeros((M, 3), np.float32)
    mat_emission = np.zeros((M, 3), np.float32)
    mat_kind = np.zeros((M,), np.int32)
    for i, m in enumerate(materials):
        mat_albedo[i] = m.get("albedo", (0.0, 0.0, 0.0))
        mat_emission[i] = m.get("emission", (0.0, 0.0, 0.0))
        mat_kind[i] = m.get("kind", DIFFUSE)

    # --- light table: all primitives whose material emits -----------------
    lk, lp, la, le = [], [], [], []
    for i in range(S):
        if np.any(mat_emission[sph_mat[i]] > 0):
            lk.append(0)
            lp.append(i)
            la.append(4.0 * np.pi * float(sph_radius[i]) ** 2)
            le.append(mat_emission[sph_mat[i]])
    for i in range(T):
        if np.any(mat_emission[tri_mats[i]] > 0):
            lk.append(1)
            lp.append(i)
            cross = np.cross(e1[i], e2[i])
            la.append(0.5 * float(np.linalg.norm(cross)))
            le.append(mat_emission[tri_mats[i]])
    L = len(lk)
    light_pad = light_pad or max(L, 1)
    light_kind = np.zeros((light_pad,), np.int32)
    light_prim = np.zeros((light_pad,), np.int32)
    light_area = np.ones((light_pad,), np.float32)
    light_le = np.zeros((light_pad, 3), np.float32)
    light_kind[:L] = lk
    light_prim[:L] = lp
    light_area[:L] = la
    if L:
        light_le[:L] = np.stack(le)

    return PTScene(
        sph_pos=jnp.asarray(sph_pos),
        sph_radius=jnp.asarray(sph_radius),
        sph_mat=jnp.asarray(sph_mat),
        sph_count=jnp.int32(S),
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2),
        tri_mat=jnp.asarray(tmat),
        tri_count=jnp.int32(T),
        mat_albedo=jnp.asarray(mat_albedo),
        mat_emission=jnp.asarray(mat_emission),
        mat_kind=jnp.asarray(mat_kind),
        light_kind=jnp.asarray(light_kind),
        light_prim=jnp.asarray(light_prim),
        light_area=jnp.asarray(light_area),
        light_le=jnp.asarray(light_le),
        light_count=jnp.int32(L),
    )
