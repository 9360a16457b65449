"""Path-tracing megakernel: the whole bounce loop per tile, in VMEM.

The XLA wavefront integrator materializes ~dozens of (H, W) planes in HBM
per bounce; at 800x608 that HBM churn — not arithmetic — dominates frame
time. This kernel runs pathtracer.wavefront._trace_core (the SAME window-
parametrized code: one implementation, three execution modes) per image
tile entirely on-chip: ray state lives in registers/VMEM, scene tables load
once per tile, the counter-based PCG RNG computes in-kernel from global
pixel coords, and the only HBM traffic is the final radiance tile.

Covers sphere scenes + up to TRI_UNROLL_MAX unrolled triangles (BASELINE
configs 2 and 4), and — given a ClusterSet (bvh=build_clusters(mesh)) —
arbitrary triangle meshes (config 3): the hierarchical cluster sweep
(ops/pallas/cluster_intersect.cluster_sweep) runs inside the kernel via a
KernelClusters ref view, including the NEE shadow sweeps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracing_engine_tpu.pathtracer.integrator import PTConfig
from raytracing_engine_tpu.pathtracer.scene import PTScene
from raytracing_engine_tpu.pathtracer.wavefront import (
    TRI_UNROLL_MAX,
    trace_window_planes,
)

import numpy as _np

_PRIME = _np.int32(-1640531527)


def pack_pt_scene(scene: PTScene):
    """Flatten a PTScene into kernel tables (rows padded to lane-friendly 8/12/16)."""
    S = scene.sph_pos.shape[0]
    T = scene.tri_v0.shape[0]
    M = scene.mat_albedo.shape[0]
    L = scene.light_kind.shape[0]
    f32 = jnp.float32

    sph = jnp.concatenate(
        [scene.sph_pos, scene.sph_radius[:, None],
         scene.sph_mat[:, None].astype(f32), jnp.zeros((S, 3), f32)], axis=1)
    tri_cols = [scene.tri_v0, scene.tri_e1, scene.tri_e2,
                scene.tri_mat[:, None].astype(f32)]
    if scene.has_tri_uv:  # cols 10-15: per-corner UVs of unrolled slots
        tri_cols += [scene.tri_uv]
    tri = jnp.concatenate(tri_cols, axis=1)
    if tri.shape[1] % 4:
        tri = jnp.concatenate(
            [tri, jnp.zeros((T, 4 - tri.shape[1] % 4), f32)], axis=1)
    # optional material columns in FIXED order (mirrored by _unpack_scene's
    # running offset): albedo2+scale | tex_space | tex_rect | dispersion
    mat_cols = [scene.mat_albedo, scene.mat_emission,
                scene.mat_kind[:, None].astype(f32), scene.mat_ior[:, None]]
    if scene.has_texture:
        mat_cols += [scene.mat_albedo2, scene.mat_tex_scale[:, None]]
    if scene.mat_tex_space is not None:
        mat_cols += [scene.mat_tex_space[:, None]]
    if scene.has_image:
        mat_cols += [scene.mat_tex_rect]
    if scene.has_mips:
        mat_cols += [scene.mat_tex_mips]
    if scene.has_normal_map:
        mat_cols += [scene.mat_nrm_rect, scene.mat_nrm_scale[:, None]]
    if scene.has_metal:
        mat_cols += [scene.mat_rough[:, None]]
    if scene.has_aniso:
        mat_cols += [scene.mat_rough2[:, None]]
    if scene.has_dispersion:
        mat_cols += [scene.mat_dispersion[:, None]]
    mat = jnp.concatenate(mat_cols, axis=1)
    if mat.shape[1] % 4:  # pad to a lane-friendly multiple
        mat = jnp.concatenate(
            [mat, jnp.zeros((M, 4 - mat.shape[1] % 4), f32)], axis=1)
    if scene.has_light_tree:  # tree slot columns ride the spare cols 9-11
        lt_cols = jnp.stack([scene.lt_cluster, scene.lt_cdf_intra,
                             scene.lt_pick_intra], axis=1)
    else:
        lt_cols = jnp.zeros((L, 3), f32)
    light = jnp.concatenate(
        [scene.light_kind[:, None].astype(f32),
         scene.light_prim[:, None].astype(f32),
         scene.light_area[:, None], scene.light_le,
         scene.light_pick[:, None], scene.light_cdf[:, None],
         jnp.broadcast_to(scene.light_total_power, (L, 1)),
         lt_cols], axis=1)
    counts = jnp.stack(
        [scene.sph_count, scene.tri_count, jnp.int32(M), scene.light_count]
    )
    return sph, tri, mat, light, counts


def _unpack_scene(sph, tri, mat, light, counts,
                  has_dielectric=False, env=None,
                  has_texture=False, has_dispersion=False,
                  has_space=False, atlas=None, has_rect=False,
                  has_triuv=False, has_nrm=False,
                  has_metal=False, ltree=None, envm=None,
                  has_rdiel=False, lmlt=None, has_aniso=False,
                  n_mips=0) -> PTScene:
    """Rebuild a PTScene view (of in-kernel arrays) from the packed tables.
    Optional-feature column offsets mirror pack_pt_scene's layout."""
    i32 = jnp.int32
    col = 8  # running offset over pack_pt_scene's optional mat columns
    albedo2 = tex_scale = tex_space = tex_rect = dispersion = None
    nrm_rect = nrm_scale = None
    if has_texture:
        albedo2, tex_scale = mat[:, col:col + 3], mat[:, col + 3]
        col += 4
    if has_space:
        tex_space = mat[:, col]
        col += 1
    if has_rect:
        tex_rect = mat[:, col:col + 4]
        col += 4
    tex_mips = None
    if n_mips:
        tex_mips = mat[:, col:col + 4 * n_mips]
        col += 4 * n_mips
    if has_nrm:
        nrm_rect = mat[:, col:col + 4]
        nrm_scale = mat[:, col + 4]
        col += 5
    rough = rough2 = None
    if has_metal:
        rough = mat[:, col]
        col += 1
    if has_aniso:
        rough2 = mat[:, col]
        col += 1
    if has_dispersion:
        dispersion = mat[:, col]
    return PTScene(
        has_dielectric=has_dielectric,
        has_rough_dielectric=has_rdiel,
        mlt_rows=None if lmlt is None else lmlt[0],
        mlt_smp=None if lmlt is None else lmlt[1],
        mesh_light_area=None if lmlt is None else lmlt[2],
        mesh_light_pick=None if lmlt is None else lmlt[3],
        env=env,
        env_img=None if envm is None else envm[0],
        env_smp=None if envm is None else envm[1],
        env_pick=None if envm is None else envm[2],
        mat_albedo2=albedo2,
        mat_tex_scale=tex_scale,
        mat_tex_space=tex_space,
        tex_atlas=atlas,
        mat_tex_rect=tex_rect,
        mat_tex_mips=tex_mips,
        mat_nrm_rect=nrm_rect,
        mat_nrm_scale=nrm_scale,
        mat_rough=rough,
        mat_rough2=rough2,
        tri_uv=tri[:, 10:16] if has_triuv else None,
        mat_dispersion=dispersion,
        sph_pos=sph[:, 0:3],
        sph_radius=sph[:, 3],
        sph_mat=sph[:, 4].astype(i32),
        sph_count=counts[0],
        tri_v0=tri[:, 0:3],
        tri_e1=tri[:, 3:6],
        tri_e2=tri[:, 6:9],
        tri_mat=tri[:, 9].astype(i32),
        tri_count=counts[1],
        mat_albedo=mat[:, 0:3],
        mat_emission=mat[:, 3:6],
        mat_kind=mat[:, 6].astype(i32),
        mat_ior=mat[:, 7],
        light_kind=light[:, 0].astype(i32),
        light_prim=light[:, 1].astype(i32),
        light_area=light[:, 2],
        light_le=light[:, 3:6],
        light_count=counts[3],
        light_pick=light[:, 6],
        light_cdf=light[:, 7],
        light_total_power=light[0, 8],
        lt_center=None if ltree is None else ltree[:, 0:3],
        lt_radius=None if ltree is None else ltree[:, 3],
        lt_power=None if ltree is None else ltree[:, 4],
        lt_cluster=None if ltree is None else light[:, 9],
        lt_cdf_intra=None if ltree is None else light[:, 10],
        lt_pick_intra=None if ltree is None else light[:, 11],
    )


def _pt_kernel(params_ref, seeds_ref, counts_ref, sph_ref, tri_ref, mat_ref,
               light_ref, *rest, cfg: PTConfig, spp: int,
               tile_h: int, tile_w: int, n_super: int = 0, stripes: int = 1,
               approx_ok: bool = False, has_mlt: bool = False,
               n_instances: int = 0, t_pad: int = 0, n_orders: int = 0,
               groups: int = 1, fast_math: bool = False,
               has_diel: bool = False, has_env: bool = False,
               has_tex: bool = False, has_disp: bool = False,
               has_space: bool = False, has_image: bool = False,
               has_triuv: bool = False, has_nrm: bool = False,
               has_metal: bool = False, has_ltree: bool = False,
               has_envm: bool = False, has_rdiel: bool = False,
               has_lmlt: bool = False, has_aniso: bool = False,
               n_mips: int = 0,
               adaptive_tol: float = 0.0, adaptive_min: int = 8):
    rest = list(rest)
    mlt_ref = rest.pop(0) if has_mlt else None
    env_ref = rest.pop(0) if has_env else None
    ltree_ref = rest.pop(0) if has_ltree else None
    envm = None
    if has_envm:  # env-map radiance + sampling tables + pick scalar
        envm_img_ref, envm_smp_ref, envm_meta_ref = rest[:3]
        rest = rest[3:]
        envm = (envm_img_ref[:], envm_smp_ref[:], envm_meta_ref[0])
    lmlt = None
    if has_lmlt:  # per-lane mesh-light tables + [total_area, pick] scalars
        lmlt_rows_ref, lmlt_smp_ref, lmlt_meta_ref = rest[:3]
        rest = rest[3:]
        lmlt = (lmlt_rows_ref[:], lmlt_smp_ref[:], lmlt_meta_ref[0],
                lmlt_meta_ref[1])
    atlas_ref = rest.pop(0) if (has_image or has_nrm) else None
    spp_ref = rest.pop() if adaptive_tol > 0.0 else None  # trailing output
    if n_super:
        from raytracing_engine_tpu.ops.pallas.cluster_intersect import (
            KernelClusters,
        )

        if n_instances:
            from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
                KernelInstances,
            )

            (inst_ref, iorder_ref, iorders_ref, order_ref, sboxes_ref,
             cboxes_ref, ctri_ref, out_ref, nrays_ref) = rest
            kc = KernelClusters(order_ref, sboxes_ref, cboxes_ref, ctri_ref,
                                n_super, approx_ok=approx_ok,
                                emit_tan=has_nrm or n_mips > 0)
            bvh = KernelInstances(inst_ref, iorder_ref, kc, n_instances,
                                  t_pad, iorders_ref=iorders_ref)
        elif n_orders:
            (order_ref, sboxes_ref, cboxes_ref, ctri_ref, orders_ref,
             refs_ref, out_ref, nrays_ref) = rest
            bvh = KernelClusters(order_ref, sboxes_ref, cboxes_ref, ctri_ref,
                                 n_super, approx_ok=approx_ok,
                                 orders_ref=orders_ref, refs_ref=refs_ref,
                                 n_orders=n_orders, groups=groups,
                                 fast_math=fast_math, emit_tan=has_nrm or n_mips > 0)
        else:
            (order_ref, sboxes_ref, cboxes_ref, ctri_ref,
             out_ref, nrays_ref) = rest
            bvh = KernelClusters(order_ref, sboxes_ref, cboxes_ref, ctri_ref,
                                 n_super, approx_ok=approx_ok, groups=groups,
                                 fast_math=fast_math, emit_tan=has_nrm or n_mips > 0)
    else:
        out_ref, nrays_ref = rest
        bvh = None
    i = pl.program_id(0)
    j = pl.program_id(1)
    # Striped pixel mapping: each VMEM tile covers a (tile_h*stripes,
    # tile_w/stripes) pixel block — squarer blocks mean tighter ray
    # footprints, so the cluster sweep's tile-level gates pass fewer
    # boxes. The camera and the counter-based RNG are keyed on the true
    # GLOBAL pixel coordinates below, so any stripes value renders
    # bit-identical pixels (the wrapper un-permutes the output planes).
    sub_w = tile_w // stripes
    rr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    sidx = cc // sub_w  # stripe index within the tile
    py = i * (tile_h * stripes) + sidx * tile_h + rr + seeds_ref[2]  # + band row
    px = j * sub_w + (cc - sidx * sub_w)

    cam = (params_ref[0], params_ref[1], params_ref[2])
    quat = (params_ref[3], params_ref[4], params_ref[5], params_ref[6])
    base = seeds_ref[0]
    offset = seeds_ref[1]

    scene = _unpack_scene(sph_ref[:], tri_ref[:], mat_ref[:], light_ref[:],
                          (counts_ref[0], counts_ref[1], counts_ref[2],
                           counts_ref[3]), has_dielectric=has_diel,
                          env=env_ref[:, :3] if has_env else None,
                          has_texture=has_tex, has_dispersion=has_disp,
                          has_space=has_space, has_rect=has_image,
                          atlas=(atlas_ref[:] if (has_image or has_nrm)
                                 else None),
                          has_triuv=has_triuv, has_nrm=has_nrm,
                          has_metal=has_metal,
                          ltree=ltree_ref[:] if has_ltree else None,
                          envm=envm, has_rdiel=has_rdiel, lmlt=lmlt,
                          has_aniso=has_aniso, n_mips=n_mips)

    zero = jnp.zeros((tile_h, tile_w), jnp.float32)

    def one_pass(s):
        seed_pass = base + (offset + s) * _PRIME
        # per-pass mesh-light row: scalar reads at dynamic SUBLANE index s
        # (supported in SMEM) — the TPU-native stand-in for a per-lane
        # emissive-triangle gather
        mlt = (tuple(mlt_ref[s, c] for c in range(14))
               if has_mlt else None)
        return trace_window_planes(
            cfg, scene, cam, quat, None, bvh=bvh,
            band_h=tile_h, packet=False,
            band_w=tile_w, seed0=seed_pass, pix=(py, px),
            mesh_light=mlt, gpass=offset + s, seed_base=base,
        )

    if adaptive_tol <= 0.0:
        def body(s, carry):
            ar, ag, ab, nr = carry
            rad, n = one_pass(s)
            return (ar + rad[0], ag + rad[1], ab + rad[2], nr + n)

        ar, ag, ab, nr = lax.fori_loop(
            0, spp, body, (zero, zero, zero, jnp.float32(0.0))
        )
        taken = jnp.float32(spp)
    else:
        # adaptive per-tile sampling: grid cells run SEQUENTIALLY on TPU,
        # so every pass a converged tile skips is real wall-clock saved —
        # the path-tracing analog of the cone-march per-tile early exit.
        # Welford-track each PIXEL's across-pass luminance (mean + M2
        # planes in VMEM); the tile stops when the tile-average relative
        # standard error of the per-pixel means, mean(sqrt(var_px/s)) /
        # mean(lum), drops under adaptive_tol (or at spp). Tile-mean
        # luminance alone is useless here — averaging the tile's lanes
        # hides exactly the per-pixel noise the tolerance is about.
        # The stopping rule correlates sample count with sample values —
        # the standard, slightly biased construction (tested < tolerance
        # against the fixed-spp render); passes consume GLOBAL pass
        # indices, so the prefix taken is chunk/shard invariant.
        min_spp = min(adaptive_min, spp)

        def cond(carry):
            s, ar, ag, ab, nr, mean_px, m2_px = carry
            sf = s.astype(jnp.float32)
            var_px = m2_px / jnp.maximum(sf - 1.0, 1.0)
            se = jnp.mean(jnp.sqrt(jnp.maximum(
                var_px / jnp.maximum(sf, 1.0), 0.0)))
            rel = se / jnp.maximum(jnp.mean(mean_px), 1e-4)
            return (s < min_spp) | ((s < spp) & (rel > adaptive_tol))

        def body(carry):
            s, ar, ag, ab, nr, mean_px, m2_px = carry
            rad, n = one_pass(s)
            x = 0.2126 * rad[0] + 0.7152 * rad[1] + 0.0722 * rad[2]
            sf = (s + 1).astype(jnp.float32)
            d = x - mean_px
            mean_px = mean_px + d / sf
            m2_px = m2_px + d * (x - mean_px)
            return (s + 1, ar + rad[0], ag + rad[1], ab + rad[2], nr + n,
                    mean_px, m2_px)

        s, ar, ag, ab, nr, _, _ = lax.while_loop(
            cond, body, (jnp.int32(0), zero, zero, zero, jnp.float32(0.0),
                         zero, zero))
        taken = s.astype(jnp.float32)
    inv = 1.0 / taken
    out_ref[0] = ar * inv
    out_ref[1] = ag * inv
    out_ref[2] = ab * inv
    # whole (grid_h, grid_w) counter tables in SMEM; each grid step (they
    # run sequentially on TPU) writes its own cell
    nrays_ref[i, j] = nr
    if adaptive_tol > 0.0:
        spp_ref[i, j] = taken


@functools.partial(
    jax.jit, static_argnums=(0, 4),
    static_argnames=("interpret", "tile", "band_h", "stripes", "groups",
                     "fast_math", "adaptive_tol", "adaptive_min",
                     "return_spp"),
)
def render_pt_mega(cfg: PTConfig, scene: PTScene, cam_pos, cam_quat, spp: int,
                   key=None, spp_offset=0, interpret=None, tile=(64, 256),
                   bvh=None, row0=0, band_h=None, stripes=None, groups=1,
                   fast_math=False, adaptive_tol=0.0, adaptive_min=8,
                   return_spp=False):
    """Megakernel render: ((band_h or H, W, 3) image, nrays). rng: pcg.

    row0/band_h: render only a horizontal band of the image (a device band
    in the sharded render). cfg keeps the FULL image height — the camera
    projection and the counter-based pcg stream are defined on global
    pixel coordinates, so a band render is bit-identical to the same rows
    of the full-image render.

    stripes: map each (tile_h, tile_w) VMEM tile onto a SQUARER
    (tile_h*stripes, tile_w//stripes) pixel block (stripes must divide
    tile_w; the block must divide the image; invalid values fall back by
    halving). Squarer blocks have tighter world-space ray footprints, so
    the cluster sweep's tile-level gates can pass fewer boxes. Output is
    bit-identical for every stripes value (camera + RNG are keyed on true
    pixel coordinates; the wrapper un-permutes with pure reshapes).
    MEASURED NEUTRAL (within ±3%) on the 70k-tri bench scene at 512^2 —
    the hierarchical sweep's gates are not the bottleneck there — but the
    knob matters when per-tile cluster counts grow (bigger meshes, tighter
    geometry), so it is kept and tested. Default 1.

    adaptive_tol: > 0 turns on per-tile adaptive sampling — each VMEM
    tile keeps taking passes (while_loop; grid cells run sequentially, so
    skipped passes are real wall-clock) until the relative standard error
    of its mean luminance drops under the tolerance or spp is reached;
    at least adaptive_min passes always run. Slightly biased (stopping
    rule correlates with samples — standard production tradeoff, tested
    close to the fixed-spp render); return_spp=True appends the per-tile
    passes-taken table to the return.

    bvh: optional accel.clusters.ClusterSet — the whole bounce loop
    (intersection + NEE shadow sweeps included) then runs in-kernel via the
    hierarchical cluster sweep; scene.tri_* beyond TRI_UNROLL_MAX slots is
    not shipped to the kernel. Per-slot mesh *area lights* must sit in the
    first TRI_UNROLL_MAX slots — build_pt_scene REFUSES emissive slots
    beyond that; emissive meshes of any size use mesh_lights=True, which
    feeds a per-pass (spp, 16) SMEM row table into the kernel (scalar
    reads at the pass's sublane index — no per-lane gather needed).
    Without a ClusterSet, triangle slots must be <= TRI_UNROLL_MAX.
    """
    from raytracing_engine_tpu.accel.clusters import ClusterSet
    from raytracing_engine_tpu.accel.instancing import InstancedClusters

    if bvh is not None and not isinstance(bvh, (ClusterSet,
                                                InstancedClusters)):
        raise TypeError(
            "render_pt_mega accepts a ClusterSet (build_clusters) or an "
            "InstancedClusters (make_instanced_clusters); for a skip-link "
            "BVH use render_pt_fast"
        )
    instanced = isinstance(bvh, InstancedClusters)
    cs = bvh.cs if instanced else bvh
    if (cfg.light_sampling == "tree" and bvh is not None
            and scene.n_tri_slot_lights):
        # The in-kernel cluster/instanced sweeps return padded-reordered
        # triangle indices, so a BSDF hit on a slot-light triangle cannot
        # be matched to its slot — its hit-side MIS density would read 0
        # while NEE also samples it (double-counted direct light). The
        # unpacked in-kernel scene view loses the static count, so the
        # guard lives here, where the real scene and the bvh meet.
        raise ValueError(
            "light_sampling='tree' with triangle slot lights cannot run "
            "over the cluster/instanced megakernel — use sphere lights, "
            "render_pt_fast with a gather BVH, or light_sampling='power'.")
    if bvh is None and scene.tri_v0.shape[0] > TRI_UNROLL_MAX:
        raise ValueError(
            f"megakernel unrolls triangles; {scene.tri_v0.shape[0]} slots > "
            f"{TRI_UNROLL_MAX} — pass bvh=build_clusters(mesh) instead"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.rng != "pcg":
        cfg = __import__("dataclasses").replace(cfg, rng="pcg")

    if key is None:
        key = jax.random.PRNGKey(0)
    from raytracing_engine_tpu.ops.pallas.rng import key_to_seed

    base = key_to_seed(key)

    h, w = (band_h or cfg.height), cfg.width
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    if scene.has_atlas and tile[1] != scene.tex_atlas.shape[1]:
        # the per-lane texel fetch gathers along the lane axis of a
        # broadcast atlas row — the VMEM tile's lane width must match
        # the atlas row width (128); narrow the tile automatically
        tile = (tile[0], scene.tex_atlas.shape[1])
    if scene.has_env_map and tile[1] != scene.env_img.shape[1]:
        tile = (tile[0], scene.env_img.shape[1])  # same lane-gather rule
    tile_h, tile_w = pick_tile(h, w, *tile)
    if stripes is None:
        stripes = 1
    while stripes > 1 and not (
        tile_w % stripes == 0
        and h % (tile_h * stripes) == 0
        and w % (tile_w // stripes) == 0
    ):
        stripes //= 2
    grid = (h // (tile_h * stripes), w // (tile_w // stripes))

    params = jnp.concatenate([
        jnp.asarray(cam_pos, jnp.float32),
        jnp.asarray(cam_quat, jnp.float32),
    ])
    seeds = jnp.stack([base, jnp.asarray(spp_offset, jnp.int32),
                       jnp.asarray(row0, jnp.int32)])
    if bvh is not None:
        # the cluster tables carry the mesh; keep only the unrolled slots
        # (NEE area-light geometry) of the scene's triangle arrays in VMEM
        import dataclasses as _dc

        n = min(scene.tri_v0.shape[0], TRI_UNROLL_MAX)
        scene = _dc.replace(
            scene,
            tri_v0=scene.tri_v0[:n], tri_e1=scene.tri_e1[:n],
            tri_e2=scene.tri_e2[:n], tri_mat=scene.tri_mat[:n],
            tri_uv=None if scene.tri_uv is None else scene.tri_uv[:n],
            tri_count=jnp.minimum(scene.tri_count, n),
        )
    sph, tri, mat, light, counts = pack_pt_scene(scene)

    has_mlt = scene.has_mesh_light
    multi_order = (not instanced and cs is not None
                   and cs.order_refs is not None
                   and cs.order_refs.shape[0] > 0)
    n_orders = 1 + cs.order_refs.shape[0] if multi_order else 0
    kernel = functools.partial(
        _pt_kernel, cfg=cfg, spp=spp, tile_h=tile_h, tile_w=tile_w,
        n_super=cs.num_super if cs is not None else 0, stripes=stripes,
        approx_ok=not interpret, has_mlt=has_mlt,
        n_instances=bvh.num_instances if instanced else 0,
        t_pad=cs.padded_tris if instanced else 0, n_orders=n_orders,
        groups=groups, fast_math=fast_math,
        has_diel=scene.has_dielectric, has_env=scene.has_env,
        has_tex=scene.has_texture, has_disp=scene.has_dispersion,
        has_space=scene.mat_tex_space is not None,
        has_image=scene.has_image, has_triuv=scene.has_tri_uv,
        has_nrm=scene.has_normal_map, has_metal=scene.has_metal,
        has_ltree=scene.has_light_tree,
        has_envm=scene.has_env_map,
        has_rdiel=scene.has_rough_dielectric,
        has_lmlt=scene.has_lane_mesh_light,
        has_aniso=scene.has_aniso, n_mips=scene.n_mip_levels,
        adaptive_tol=float(adaptive_tol),
        adaptive_min=int(adaptive_min),
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # params
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seeds
        pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
        full(), full(), full(), full(),          # scene tables
    ]
    args = [params, seeds, counts, sph, tri, mat, light]
    if has_mlt:
        from raytracing_engine_tpu.pathtracer.scene import mesh_light_rows

        # one area-weighted emissive triangle per GLOBAL pass — computed
        # here in XLA (gathers are free outside the kernel) and shipped as
        # an SMEM scalar table, padded to 16 columns
        gpass = jnp.asarray(spp_offset, jnp.int32) + jnp.arange(
            spp, dtype=jnp.int32)
        rows = mesh_light_rows(scene, base, gpass)  # (spp, 14)
        mlt_tab = jnp.concatenate(
            [rows, jnp.zeros((spp, 2), jnp.float32)], axis=1)
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [mlt_tab]
    if scene.has_env:
        # (2, 8) zero-padded [bottom, top] gradient-sky rows
        env_tab = jnp.concatenate(
            [scene.env, jnp.zeros((2, 5), jnp.float32)], axis=1)
        in_specs += [full()]
        args += [env_tab]
    if scene.has_light_tree:
        # (C, 8) zero-padded cluster rows [center(3), radius, power];
        # the per-slot tree columns ride the light table's cols 9-11
        ltree_tab = jnp.concatenate(
            [scene.lt_center, scene.lt_radius[:, None],
             scene.lt_power[:, None],
             jnp.zeros((scene.lt_center.shape[0], 3), jnp.float32)], axis=1)
        in_specs += [full()]
        args += [ltree_tab]
    if scene.has_env_map:
        # env-map radiance + alias-sampling tables + the NEE pick scalar;
        # the per-lane texel fetch needs lane width 128, like the atlas
        if tile_w != scene.env_img.shape[1] and not interpret:
            raise ValueError(
                f"env maps need tile width {scene.env_img.shape[1]} "
                f"(lane rows); got tile={tile_h, tile_w}")
        in_specs += [full(), full(), pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [scene.env_img, scene.env_smp,
                 jnp.stack([scene.env_pick])]
    if scene.has_lane_mesh_light:
        # per-lane mesh-light tables (lane-row fetch: tile width 128)
        if tile_w != scene.mlt_rows.shape[1] and not interpret:
            raise ValueError(
                f"lane mesh lights need tile width "
                f"{scene.mlt_rows.shape[1]}; got tile={tile_h, tile_w}")
        in_specs += [full(), full(), pl.BlockSpec(memory_space=pltpu.SMEM)]
        args += [scene.mlt_rows, scene.mlt_smp,
                 jnp.stack([scene.mesh_light_area, scene.mesh_light_pick])]
    if scene.has_atlas:
        # (3K, 128) texture atlas; the per-lane fetch is a lane-axis
        # take_along_axis on a broadcast row — on hardware the VMEM
        # tile's lane width must match the atlas row width (interpret
        # mode follows XLA gather semantics and takes any width)
        if tile_w != scene.tex_atlas.shape[1] and not interpret:
            raise ValueError(
                f"image textures need tile width {scene.tex_atlas.shape[1]} "
                f"(atlas lane rows); got tile={tile_h, tile_w} — pass "
                f"tile=(H, {scene.tex_atlas.shape[1]})")
        in_specs += [full()]
        args += [scene.tex_atlas]
    if bvh is not None:
        from raytracing_engine_tpu.accel.clusters import visit_order

        if instanced:
            from raytracing_engine_tpu.accel.clusters import visit_orders
            from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
                object_space_origins,
            )

            # instance table + near-to-far instance visit order (from the
            # camera — a perf hint, results order-independent) + the
            # per-instance OBJECT-space super orders (each instance sweeps
            # in its own object frame, where a shared world order is
            # meaningless)
            center = (bvh.inst_tab[:, 13:16] + bvh.inst_tab[:, 16:19]) * 0.5
            delta = center - jnp.asarray(cam_pos, jnp.float32)
            iorder = jnp.argsort(jnp.sum(delta * delta, -1)).astype(jnp.int32)
            iorders = visit_orders(
                cs, object_space_origins(bvh.inst_tab, cam_pos))
            in_specs += [
                pl.BlockSpec(memory_space=pltpu.SMEM),  # instances
                pl.BlockSpec(memory_space=pltpu.SMEM),  # instance order
                pl.BlockSpec(memory_space=pltpu.SMEM),  # per-instance orders
            ]
            args += [bvh.inst_tab, iorder, iorders]
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),  # super visit order
            pl.BlockSpec(memory_space=pltpu.SMEM),  # super boxes
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cluster boxes
            full(),                                  # cluster tri rows
        ]
        # super visit order: instanced sweeps use the per-instance
        # OBJECT-space order table above (this 1D order is their unused
        # fallback); single-mesh sweeps order from the world camera
        order = (jnp.arange(cs.num_super, dtype=jnp.int32) if instanced
                 else visit_order(cs, jnp.asarray(cam_pos, jnp.float32)))
        args += [order, cs.super_boxes, cs.boxes, cs.tri]
        if multi_order:
            from raytracing_engine_tpu.accel.clusters import visit_orders

            # row 0 = this frame's camera; rows 1+ = mesh FPS references —
            # closest sweeps pick per tile by mean live origin (KernelClusters)
            refs = jnp.concatenate(
                [jnp.asarray(cam_pos, jnp.float32)[None, :],
                 cs.order_refs], axis=0)
            orders = visit_orders(cs, refs)
            refs4 = jnp.concatenate(
                [refs, jnp.zeros((refs.shape[0], 1), jnp.float32)], axis=1)
            in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),  # orders
                         pl.BlockSpec(memory_space=pltpu.SMEM)]  # refs
            args += [orders, refs4]
    out_shape = [
        jax.ShapeDtypeStruct((3, grid[0] * tile_h, grid[1] * tile_w),
                             jnp.float32),
        jax.ShapeDtypeStruct(grid, jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((3, tile_h, tile_w), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # whole counter table
    ]
    if adaptive_tol > 0.0:  # per-tile passes-taken table
        out_shape.append(jax.ShapeDtypeStruct(grid, jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)
    out, nrays = res[0], res[1]
    spp_map = res[2] if adaptive_tol > 0.0 else None
    if stripes > 1:
        # un-permute the striped tiles back to row-major pixels: tile (i,j)
        # holds pixel block (i, j) as `stripes` vertical stripes laid side
        # by side — pure reshapes/transposes, bit-exact
        sub_w = tile_w // stripes
        out = out.reshape(3, grid[0], tile_h, grid[1], stripes, sub_w)
        out = out.transpose(0, 1, 4, 2, 3, 5)
        out = out.reshape(3, h, w)
    if return_spp:
        if adaptive_tol <= 0.0:
            spp_map = jnp.full(grid, float(spp), jnp.float32)
        return jnp.moveaxis(out, 0, -1), jnp.sum(nrays), spp_map
    return jnp.moveaxis(out, 0, -1), jnp.sum(nrays)


# ---------------------------------------------------------------------------
# Rebin renderer: per-BOUNCE megakernel launches with an image-wide ray
# regroup (one multi-operand lax.sort) between them. Attacks the measured
# bounce-sweep occupancy collapse (benchmarks/experiment_regroup.json: by
# bounce 2 only ~6% of rays are live, spread over most tiles, and the
# replayed gate/test model says frame-wide regrouping cuts the bounce-2
# closest sweep ~4-5x) from BETWEEN dispatches — every in-kernel gating
# granularity finer than a tile measured negative on Mosaic (ROADMAP §1).
# Bit-identical to render_pt_mega / render_pt_fast: all RNG draws are
# counter-keyed on each ray's ORIGINAL pixel coordinates (px, py planes
# carried through every permutation), so regrouping only changes which
# VMEM tile executes a ray, never its arithmetic.
# ---------------------------------------------------------------------------


def _pt_rebin_kernel(params_ref, seeds_ref, counts_ref, sph_ref, tri_ref,
                     mat_ref, light_ref, *rest, cfg: PTConfig,
                     bounce_lo: int, bounce_hi: int,
                     tile_h: int, tile_w: int, stripes: int = 1,
                     n_super: int = 0, approx_ok: bool = False,
                     has_mlt: bool = False, n_orders: int = 0,
                     n_instances: int = 0, t_pad: int = 0,
                     fast_math: bool = False, has_diel: bool = False,
                     has_env: bool = False, has_tex: bool = False,
                     has_disp: bool = False, has_space: bool = False,
                     has_image: bool = False, has_triuv: bool = False,
                     has_nrm: bool = False, has_metal: bool = False,
                     has_ltree: bool = False, has_envm: bool = False,
                     has_rdiel: bool = False, has_lmlt: bool = False,
                     has_aniso: bool = False, n_mips: int = 0,
                     skip_dead: bool = True):
    """One bounce window [bounce_lo, bounce_hi] of the wavefront core per
    tile. bounce_lo == 0 generates camera rays from (striped) pixel ids;
    later windows read the packed state planes emitted by the previous
    launch (in whatever ray order the driver regrouped them to), and
    skip the whole window when every lane in the tile is dead
    (skip_dead — see the branch comment)."""
    from raytracing_engine_tpu.ops.pallas.cluster_intersect import (
        KernelClusters,
    )
    from raytracing_engine_tpu.pathtracer.wavefront import (
        pack_state,
        trace_window_planes,
        unpack_state,
    )

    rest = list(rest)
    mlt_ref = rest.pop(0) if has_mlt else None
    env_ref = rest.pop(0) if has_env else None
    ltree_ref = rest.pop(0) if has_ltree else None
    envm = None
    if has_envm:  # env-map radiance + sampling tables + pick scalar
        envm_img_ref, envm_smp_ref, envm_meta_ref = rest[:3]
        rest = rest[3:]
        envm = (envm_img_ref[:], envm_smp_ref[:], envm_meta_ref[0])
    lmlt = None
    if has_lmlt:  # per-lane mesh-light tables + [total_area, pick] scalars
        lmlt_rows_ref, lmlt_smp_ref, lmlt_meta_ref = rest[:3]
        rest = rest[3:]
        lmlt = (lmlt_rows_ref[:], lmlt_smp_ref[:], lmlt_meta_ref[0],
                lmlt_meta_ref[1])
    atlas_ref = rest.pop(0) if (has_image or has_nrm) else None
    inst_ref = iorder_ref = iorders_ref = None
    if n_instances:  # two-level: instance table + per-instance orders
        inst_ref, iorder_ref, iorders_ref, *rest = rest
    if n_orders:
        (order_ref, sboxes_ref, cboxes_ref, ctri_ref, orders_ref,
         refs_ref, *rest) = rest
    else:
        (order_ref, sboxes_ref, cboxes_ref, ctri_ref, *rest) = rest
        orders_ref = refs_ref = None
    state_in_ref = None
    if bounce_lo > 0:
        state_in_ref, *rest = rest
    out_ref, nrays_ref = rest
    bvh = KernelClusters(order_ref, sboxes_ref, cboxes_ref, ctri_ref,
                         n_super, approx_ok=approx_ok,
                         orders_ref=orders_ref, refs_ref=refs_ref,
                         n_orders=n_orders, fast_math=fast_math,
                         emit_tan=has_nrm or n_mips > 0)
    if n_instances:
        from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
            KernelInstances,
        )

        bvh = KernelInstances(inst_ref, iorder_ref, bvh, n_instances,
                              t_pad, iorders_ref=iorders_ref)

    i = pl.program_id(0)
    j = pl.program_id(1)
    cam = (params_ref[0], params_ref[1], params_ref[2])
    quat = (params_ref[3], params_ref[4], params_ref[5], params_ref[6])
    base = seeds_ref[0]
    gpass = seeds_ref[1]
    seed_pass = base + gpass * _PRIME

    scene = _unpack_scene(sph_ref[:], tri_ref[:], mat_ref[:], light_ref[:],
                          (counts_ref[0], counts_ref[1], counts_ref[2],
                           counts_ref[3]), has_dielectric=has_diel,
                          env=env_ref[:, :3] if has_env else None,
                          has_texture=has_tex, has_dispersion=has_disp,
                          has_space=has_space, has_rect=has_image,
                          atlas=(atlas_ref[:] if (has_image or has_nrm)
                                 else None),
                          has_triuv=has_triuv, has_nrm=has_nrm,
                          has_metal=has_metal,
                          ltree=ltree_ref[:] if has_ltree else None,
                          envm=envm, has_rdiel=has_rdiel, lmlt=lmlt,
                          has_aniso=has_aniso, n_mips=n_mips)
    mlt = tuple(mlt_ref[0, c] for c in range(14)) if has_mlt else None

    kw = dict(band_h=tile_h, band_w=tile_w, seed0=seed_pass,
              mesh_light=mlt, gpass=gpass, seed_base=base, packet=False,
              bounce_lo=bounce_lo, bounce_hi=bounce_hi, emit_state=True)
    if bounce_lo == 0:
        # striped pixel mapping, exactly as _pt_kernel: camera + RNG are
        # keyed on TRUE global pixel coordinates
        sub_w = tile_w // stripes
        rr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        sidx = cc // sub_w
        py = i * (tile_h * stripes) + sidx * tile_h + rr + seeds_ref[2]
        px = j * sub_w + (cc - sidx * sub_w)
        st = trace_window_planes(cfg, scene, cam, quat, None, bvh=bvh,
                                 pix=(py, px), **kw)
        out_ref[:] = pack_state(st)
        nrays_ref[i, j] = st["nrays"]
    elif skip_dead:
        # Dead-tile skip: after the Morton regroup, dead/parked rays
        # (|o| >= 1e17) compact to the image tail, so entire trailing
        # tiles are dead. A dead ray's state is a fixed point of the
        # bounce window (throughput 0, all writes alive-masked), so
        # passing the planes through unchanged is bit-exact — and skips
        # the whole scalar super-sweep the parked lanes would otherwise
        # still pay. One VPU reduction + one scalar branch per tile.
        live_any = jnp.min(jnp.abs(state_in_ref[0])) < 1e17

        @pl.when(live_any)
        def _run():
            st = trace_window_planes(
                cfg, scene, cam, quat, None, bvh=bvh,
                state_in=unpack_state(
                    state_in_ref[:], has_disp,
                    has_tacc=(n_mips > 0
                              and cfg.tex_filter == "trilinear")), **kw)
            out_ref[:] = pack_state(st)
            nrays_ref[i, j] = st["nrays"]

        @pl.when(jnp.logical_not(live_any))
        def _skip():
            out_ref[:] = state_in_ref[:]
            nrays_ref[i, j] = 0.0
    else:
        st = trace_window_planes(cfg, scene, cam, quat, None, bvh=bvh,
                                 state_in=unpack_state(
                                     state_in_ref[:], has_disp,
                                     has_tacc=(n_mips > 0
                                               and cfg.tex_filter
                                               == "trilinear")), **kw)
        out_ref[:] = pack_state(st)
        nrays_ref[i, j] = st["nrays"]


def rebin_keys(state, mode: str, lo, hi, tile_ids=None):
    """int32 regroup sort key per ray from a packed state array.

    All modes put parked/dead rays (|o| >= 1e17) last; live sub-order:

      none        skip the regroup for this gap (keep the incoming order
                  — right when most rays are still alive and coherent,
                  e.g. bounce 0 -> 1: a camera-coherent layout beats any
                  re-binning until enough lanes die)
      oct         direction octant, then original pixel order (the stable
                  sort preserves it) — the model's 'compact+oct'
      morton      24-bit origin Morton, then octant — 'morton+oct'
      oct_morton  octant major, origin Morton minor — direction coherence
                  first (it gates the most boxes), origin locality within
      tile_oct    CURRENT-tile id major, octant minor: rays stay in their
                  (origin-coherent) tile neighborhood and only re-bucket
                  by direction within it — keeps the locality the global
                  sorts trade away; parked rays carry octant 7 and sink
                  to each tile's tail on their own
    """
    ox, oy, oz = state[0], state[1], state[2]
    dx, dy, dz = state[3], state[4], state[5]
    dead = (jnp.abs(ox) >= 1e17).astype(jnp.int32)
    octant = ((dx > 0.0).astype(jnp.int32) * 4
              + (dy > 0.0).astype(jnp.int32) * 2
              + (dz > 0.0).astype(jnp.int32))
    if mode == "oct":
        return dead * 8 + octant
    if mode == "tile_oct":
        return tile_ids * 8 + octant  # parked dirs are (+,+,+): octant 7

    def q(x, a, b):
        c = (x - a) / jnp.maximum(b - a, 1e-6) * 256.0
        return jnp.clip(c.astype(jnp.int32), 0, 255)

    qx, qy, qz = q(ox, lo[0], hi[0]), q(oy, lo[1], hi[1]), q(oz, lo[2], hi[2])
    m = jnp.zeros_like(qx)
    for bit in range(8):
        m = (m | (((qx >> bit) & 1) << (3 * bit + 2))
             | (((qy >> bit) & 1) << (3 * bit + 1))
             | (((qz >> bit) & 1) << (3 * bit)))
    if mode == "morton":
        return dead * (1 << 27) + m * 8 + octant
    if mode == "oct_morton":
        return (dead * (1 << 27)) + octant * (1 << 24) + m
    raise ValueError(f"rebin mode {mode!r}")


@functools.partial(
    jax.jit, static_argnums=(0, 4),
    static_argnames=("interpret", "tile", "tile_b", "band_h", "stripes",
                     "rebin", "fast_math", "skip_dead"),
)
def render_pt_rebin(cfg: PTConfig, scene: PTScene, cam_pos, cam_quat,
                    spp: int, key=None, bvh=None, spp_offset=0,
                    interpret=None, tile=(32, 128), tile_b=None, row0=0,
                    band_h=None, stripes=None, rebin="none,morton",
                    fast_math=False, skip_dead=True):
    """Rebin render: ((band_h or H, W, 3) image, nrays) — bit-identical
    estimator to render_pt_mega, executed as one Pallas launch per bounce
    with an image-wide ray regroup (stable multi-operand lax.sort on a
    coherence key) between launches. Requires a ClusterSet bvh, rng='pcg'.

    row0/band_h: render only a horizontal band (a device band in the
    sharded render, parallel/pt_sharding.py). cfg keeps the FULL image
    height; the camera projection and every counter-based RNG draw are
    keyed on the GLOBAL pixel coordinates carried through the regroup
    sorts, so a band render is bit-identical to the same rows of the
    full render — the regroup (now per-band) only changes which VMEM
    tile executes a ray, never its arithmetic.

    rebin: regroup key per gap, comma-joined; the last entry repeats for
    deeper bounces (modes: rebin_keys). The default 'none,morton' keeps
    the camera-coherent layout into bounce 1 (most rays still alive —
    every re-binning there measured slower than pixel order) and
    Morton-major regroups before bounce 2+ (dead rays compact away,
    survivors group by origin cell). Chip A/B, config 3 @512^2: mega
    132.9 -> rebin oct 123.4 / morton 111.8 / none,morton 95.4 ms with
    contiguous-rank tiling; tile_oct (no dead compaction) 138 — dead-ray
    compaction, not direction coherence, dominates.
    """
    from raytracing_engine_tpu.accel.clusters import ClusterSet, visit_order
    from raytracing_engine_tpu.accel.instancing import InstancedClusters

    instanced = isinstance(bvh, InstancedClusters)
    if not isinstance(bvh, ClusterSet) and not instanced:
        raise TypeError("render_pt_rebin needs a ClusterSet "
                        "(accel.clusters.build_clusters) or an "
                        "InstancedClusters (make_instanced_clusters)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.rng != "pcg":
        cfg = __import__("dataclasses").replace(cfg, rng="pcg")
    if key is None:
        key = jax.random.PRNGKey(0)
    from raytracing_engine_tpu.ops.pallas.rng import key_to_seed
    from raytracing_engine_tpu.pathtracer.wavefront import (
        TRI_UNROLL_MAX,
        state_plane_count,
    )

    base = key_to_seed(key)
    h, w = (band_h or cfg.height), cfg.width
    from raytracing_engine_tpu.ops.pallas.common import pick_tile

    if scene.has_atlas and tile[1] != scene.tex_atlas.shape[1]:
        tile = (tile[0], scene.tex_atlas.shape[1])
    if scene.has_env_map and tile[1] != scene.env_img.shape[1]:
        tile = (tile[0], scene.env_img.shape[1])  # same lane-gather rule
    tile_h, tile_w = pick_tile(h, w, *tile)
    if tile_b is None:
        tile_hb, tile_wb = tile_h, tile_w
    else:
        # bounce launches (b >= 1) may use their OWN tile shape — the
        # per-bounce launch structure makes the granularity an
        # independent knob per window (the bounce-1 incoherent sweep
        # prefers different tiles than the camera-coherent bounce 0).
        # Same lane-width constraints as bounce 0 (atlas-row gathers).
        tb = tile_b
        if scene.has_atlas and tb[1] != scene.tex_atlas.shape[1]:
            tb = (tb[0], scene.tex_atlas.shape[1])
        if scene.has_env_map and tb[1] != scene.env_img.shape[1]:
            tb = (tb[0], scene.env_img.shape[1])
        if (scene.has_lane_mesh_light
                and tb[1] != scene.mlt_rows.shape[1]):
            tb = (tb[0], scene.mlt_rows.shape[1])
        tile_hb, tile_wb = pick_tile(h, w, *tb)
    if stripes is None:
        stripes = 1
    while stripes > 1 and not (
        tile_w % stripes == 0
        and h % (tile_h * stripes) == 0
        and w % (tile_w // stripes) == 0
    ):
        stripes //= 2
    grid = (h // (tile_h * stripes), w // (tile_w // stripes))

    import dataclasses as _dc

    n = min(scene.tri_v0.shape[0], TRI_UNROLL_MAX)
    scene_k = _dc.replace(
        scene,
        tri_v0=scene.tri_v0[:n], tri_e1=scene.tri_e1[:n],
        tri_e2=scene.tri_e2[:n], tri_mat=scene.tri_mat[:n],
        tri_uv=None if scene.tri_uv is None else scene.tri_uv[:n],
        tri_count=jnp.minimum(scene.tri_count, n),
    )
    sph, tri, mat, light, counts = pack_pt_scene(scene_k)
    params = jnp.concatenate([
        jnp.asarray(cam_pos, jnp.float32),
        jnp.asarray(cam_quat, jnp.float32),
    ])

    cs = bvh.cs if instanced else bvh
    multi_order = (not instanced and cs.order_refs is not None
                   and cs.order_refs.shape[0] > 0)
    n_orders = 1 + cs.order_refs.shape[0] if multi_order else 0
    S = state_plane_count(scene, cfg)

    static_kw = dict(
        cfg=cfg, n_super=cs.num_super,
        approx_ok=not interpret, has_mlt=scene.has_mesh_light,
        n_orders=n_orders,
        n_instances=bvh.num_instances if instanced else 0,
        t_pad=cs.padded_tris if instanced else 0,
        fast_math=fast_math, has_diel=scene.has_dielectric,
        has_env=scene.has_env, has_tex=scene.has_texture,
        has_disp=scene.has_dispersion,
        has_space=scene.mat_tex_space is not None,
        has_image=scene.has_image, has_triuv=scene.has_tri_uv,
        has_nrm=scene.has_normal_map, has_metal=scene.has_metal,
        has_ltree=scene.has_light_tree,
        has_envm=scene.has_env_map,
        has_rdiel=scene.has_rough_dielectric,
        has_lmlt=scene.has_lane_mesh_light,
        has_aniso=scene.has_aniso, n_mips=scene.n_mip_levels,
    )
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    base_specs = [smem(), smem(), smem(), full(), full(), full(), full()]

    def common_args(gpass):
        seeds = jnp.stack([base, gpass, jnp.asarray(row0, jnp.int32)])
        args = [params, seeds, counts, sph, tri, mat, light]
        specs = list(base_specs)
        if scene.has_mesh_light:
            # this pass's area-weighted emissive triangle as a (1, 16)
            # SMEM row — the same global-pass-keyed selection as
            # render_pt_mega's (spp, 16) table, one row per launch since
            # every launch here belongs to a single pass
            from raytracing_engine_tpu.pathtracer.scene import (
                mesh_light_rows,
            )

            rows = mesh_light_rows(scene, base, gpass)  # (1, 14)
            args += [jnp.concatenate(
                [rows, jnp.zeros((1, 2), jnp.float32)], axis=1)]
            specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        if scene.has_env:
            args += [jnp.concatenate(
                [scene.env, jnp.zeros((2, 5), jnp.float32)], axis=1)]
            specs += [full()]
        if scene.has_light_tree:
            args += [jnp.concatenate(
                [scene.lt_center, scene.lt_radius[:, None],
                 scene.lt_power[:, None],
                 jnp.zeros((scene.lt_center.shape[0], 3), jnp.float32)],
                axis=1)]
            specs += [full()]
        if scene.has_env_map:
            if tile_w != scene.env_img.shape[1] and not interpret:
                raise ValueError(
                    f"env maps need tile width {scene.env_img.shape[1]}; "
                    f"got {tile_h, tile_w}")
            args += [scene.env_img, scene.env_smp,
                     jnp.stack([scene.env_pick])]
            specs += [full(), full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
        if scene.has_lane_mesh_light:
            if tile_w != scene.mlt_rows.shape[1] and not interpret:
                raise ValueError(
                    f"lane mesh lights need tile width "
                    f"{scene.mlt_rows.shape[1]}; got {tile_h, tile_w}")
            args += [scene.mlt_rows, scene.mlt_smp,
                     jnp.stack([scene.mesh_light_area,
                                scene.mesh_light_pick])]
            specs += [full(), full(),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
        if scene.has_atlas:
            if tile_w != scene.tex_atlas.shape[1] and not interpret:
                raise ValueError(
                    f"image textures need tile width "
                    f"{scene.tex_atlas.shape[1]}; got {tile_h, tile_w}")
            args += [scene.tex_atlas]
            specs += [full()]
        if instanced:
            from raytracing_engine_tpu.accel.clusters import visit_orders
            from raytracing_engine_tpu.ops.pallas.instanced_intersect import (
                object_space_origins,
            )

            # instance table + camera-near-to-far instance order + the
            # per-instance OBJECT-space super orders (mirrors render_pt_mega)
            center = (bvh.inst_tab[:, 13:16] + bvh.inst_tab[:, 16:19]) * 0.5
            delta = center - jnp.asarray(cam_pos, jnp.float32)
            iorder = jnp.argsort(
                jnp.sum(delta * delta, -1)).astype(jnp.int32)
            iorders = visit_orders(
                cs, object_space_origins(bvh.inst_tab, cam_pos))
            args += [bvh.inst_tab, iorder, iorders]
            specs += [smem(), smem(), smem()]
            order = jnp.arange(cs.num_super, dtype=jnp.int32)
        else:
            order = visit_order(cs, jnp.asarray(cam_pos, jnp.float32))
        args += [order, cs.super_boxes, cs.boxes, cs.tri]
        specs += [smem(), smem(), smem(), full()]
        if multi_order:
            from raytracing_engine_tpu.accel.clusters import visit_orders

            refs = jnp.concatenate(
                [jnp.asarray(cam_pos, jnp.float32)[None, :],
                 cs.order_refs], axis=0)
            args += [visit_orders(cs, refs),
                     jnp.concatenate(
                         [refs, jnp.zeros((refs.shape[0], 1), jnp.float32)],
                         axis=1)]
            specs += [smem(), smem()]
        return args, specs

    state_spec = lambda th, tw: pl.BlockSpec((S, th, tw),
                                             lambda i, j: (0, i, j),
                                             memory_space=pltpu.VMEM)
    modes = rebin.split(",")
    gap_mode = lambda b: modes[min(b - 1, len(modes) - 1)]

    def live_bbox(state):
        """AABB of the LIVE ray origins — the Morton quantization domain.
        The scene bbox is useless here (a big floor primitive shrinks the
        interesting region to a couple of cells); live origins sit on the
        surfaces that produced them, so 2^8 cells land at sweep-relevant
        granularity. Perf hint only — any box yields a correct render."""
        live = jnp.abs(state[0]) < 1e17
        lo = tuple(jnp.min(jnp.where(live, state[a], jnp.inf))
                   for a in range(3))
        hi = tuple(jnp.max(jnp.where(live, state[a], -jnp.inf))
                   for a in range(3))
        return lo, hi

    def one_pass(gpass):
        args, specs = common_args(gpass)
        kernel0 = functools.partial(_pt_rebin_kernel, bounce_lo=0,
                                    bounce_hi=0, stripes=stripes,
                                    tile_h=tile_h, tile_w=tile_w,
                                    **static_kw)
        state, nr = pl.pallas_call(
            kernel0,
            out_shape=(jax.ShapeDtypeStruct(
                (S, grid[0] * tile_h, grid[1] * tile_w), jnp.float32),
                jax.ShapeDtypeStruct(grid, jnp.float32)),
            grid=grid,
            in_specs=tuple(specs),
            out_specs=(state_spec(tile_h, tile_w), smem()),
            interpret=interpret,
        )(*args)
        nrays = jnp.sum(nr)
        for b in range(1, cfg.max_bounces + 1):
            # regroup image-wide: ONE stable variadic sort moves the key
            # and every state plane together (argsort + per-plane gathers
            # measured ~4 ms/plane of scalarized HBM gather at 512^2 —
            # see benchmarks/experiment_transport.json)
            mode = gap_mode(b)
            if mode == "none":
                state = state.reshape(S, h, w)
            else:
                bbox_lo = bbox_hi = None
                if mode not in ("oct", "tile_oct"):
                    bbox_lo, bbox_hi = live_bbox(state)
                tids = None
                if mode == "tile_oct":
                    hh, ww = state.shape[1], state.shape[2]
                    yy = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
                    xx = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
                    tids = ((yy // tile_h) * (ww // tile_w)
                            + xx // tile_w)
                keys = rebin_keys(state, mode, bbox_lo,
                                  bbox_hi, tile_ids=tids).reshape(-1)
                ops = [keys] + [state[k].reshape(-1) for k in range(S)]
                srt = jax.lax.sort(ops, num_keys=1, is_stable=True)
                # CONTIGUOUS-RANK tiling: reshape the sorted order to
                # (N/tile_w, tile_w) so each (tile_h, tile_w) VMEM tile
                # owns one contiguous run of sorted ranks. Reshaping to
                # the image (h, w) instead interleaves every sorted run
                # across w/tile_w tiles, throwing most of the regroup's
                # coherence away (measured +20-40 ms on config 3).
                state = jnp.stack(srt[1:]).reshape(
                    S, (h * w) // tile_wb, tile_wb)
            hh, ww = state.shape[1], state.shape[2]
            thb = tile_hb if (hh % tile_hb == 0
                              and ww % tile_wb == 0) else tile_h
            twb = tile_wb if (hh % tile_hb == 0
                              and ww % tile_wb == 0) else tile_w
            grid_b = (hh // thb, ww // twb)
            kernel_b = functools.partial(_pt_rebin_kernel, bounce_lo=b,
                                         bounce_hi=b, tile_h=thb,
                                         tile_w=twb, skip_dead=skip_dead,
                                         **static_kw)
            state, nr = pl.pallas_call(
                kernel_b,
                out_shape=(jax.ShapeDtypeStruct((S, hh, ww), jnp.float32),
                           jax.ShapeDtypeStruct(grid_b, jnp.float32)),
                grid=grid_b,
                in_specs=tuple(specs) + (state_spec(thb, twb),),
                out_specs=(state_spec(thb, twb), smem()),
                interpret=interpret,
            )(*(args + [state]))
            nrays = nrays + jnp.sum(nr)
        # un-permute radiance to pixel order: the carried (py*w + px) ids
        # are exactly a permutation of 0..N-1, so one more small sort on
        # them restores row-major order (cheaper than 3 HBM scatters —
        # benchmarks/experiment_transport.json)
        pixid = (state[16].astype(jnp.int32) * w
                 + state[15].astype(jnp.int32)).reshape(-1)
        srt = jax.lax.sort(
            [pixid, state[9].reshape(-1), state[10].reshape(-1),
             state[11].reshape(-1)], num_keys=1, is_stable=False)
        img = jnp.stack(srt[1:], axis=-1).reshape(h, w, 3)
        return img, nrays

    def body(s, carry):
        acc, nrays = carry
        img, nr = one_pass(jnp.asarray(spp_offset, jnp.int32) + s)
        return acc + img, nrays + nr

    acc, nrays = lax.fori_loop(
        0, spp, body,
        (jnp.zeros((h, w, 3), jnp.float32), jnp.float32(0.0)))
    return acc / spp, nrays
