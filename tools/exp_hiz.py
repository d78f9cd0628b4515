"""Round-3 scoping: early-exit (hierarchical-z) potential on config5.

The visibility resolve is an associative per-pixel lexicographic min over
(quantized z, draw order), so entries can be processed in ANY order.  If each
tile's entries are sorted front-to-back by triangle z-min, the kernel can
stop as soon as every pixel's depth is below the next entry's z-min — exact,
not approximate.  This tool measures the ceiling: the fraction of entries
whose tri-z-min exceeds their tile's FINAL z-max (those are skippable), plus
the exact exit-point fraction assuming the threshold is refreshed per chunk.

    python tools/exp_hiz.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.raster_pallas import rasterize_visibility_pallas
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0, rig.resolution)
    )
    (texels, toff, tw_, th_, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex, *_rest) = arrays
    r = rf.plan.raster

    @jax.jit
    def run(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
        ct = near_clip_triangles(clip, uv3, tri_tex[0],
                                 tri_valid0[0] & cam_valid[0],
                                 extra_cap=r.clip_cap)
        su = setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0],
            scissors[0], tile_w=r.tile_w, tile_h=r.tile_h,
            grid_w=r.grid_w, grid_h=r.grid_h, order=ct.order)
        binned = bin_triangles(
            su, grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=r.entry_cap,
            max_tiles_per_tri=r.max_tiles_per_tri,
            broad_cap=r.broad_cap, spill_cap=r.spill_cap)
        depth0 = jnp.ones((r.fb_h, r.fb_w), jnp.float32)
        vis, _ = rasterize_visibility_pallas(
            binned, depth0, scissors[0], fb_w=r.fb_w, fb_h=r.fb_h,
            tile_w=r.tile_w, tile_h=r.tile_h,
            grid_w=r.grid_w, grid_h=r.grid_h, chunk=r.chunk,
            depth_state=rf.mesh_state.depth,
            interpret=jax.default_backend() != "tpu")
        # per-triangle window-z min over the 3 corners (what setup would add)
        from tyleri_tpu.ops.setup import viewport_transform, W_EPS
        in_front = jnp.all(ct.clip[..., 3] > W_EPS, axis=1)
        safe_clip = jnp.where(in_front[:, None, None], ct.clip,
                              jnp.ones_like(ct.clip))
        sx, sy, sz, _ = viewport_transform(safe_clip, viewports[0])
        zmin_tri = jnp.clip(jnp.min(sz, axis=1), 0.0, 1.0)
        tri_of_entry = jnp.clip(binned.entry_channels[:, 22].astype(jnp.int32),
                                0, zmin_tri.shape[0] - 1)
        # pixel-row/col span per triangle (setup's bbox rule), for the
        # per-sublane-row exit ceiling (VERDICT r4 #2b)
        py0 = jnp.floor(jnp.min(sy, axis=1) - 0.5).astype(jnp.int32)
        py1 = jnp.ceil(jnp.max(sy, axis=1) - 0.5).astype(jnp.int32)
        px0 = jnp.floor(jnp.min(sx, axis=1) - 0.5).astype(jnp.int32)
        px1 = jnp.ceil(jnp.max(sx, axis=1) - 0.5).astype(jnp.int32)
        return (vis.depth, binned.entry_tile, binned.num_entries,
                jnp.take(zmin_tri, tri_of_entry),
                binned.entry_channels[:, 9:12],
                jnp.stack([jnp.take(py0, tri_of_entry),
                           jnp.take(py1, tri_of_entry),
                           jnp.take(px0, tri_of_entry),
                           jnp.take(px1, tri_of_entry)], axis=1))

    (depth, entry_tile, num_entries, entry_zmin, entry_zabc,
     entry_span) = map(np.asarray, jax.device_get(run(view_projs, models)))
    print(f"entries (cap rows): {entry_tile.shape[0]}  live: {num_entries}")

    th_t, tw_t = r.tile_h, r.tile_w
    gh, gw = r.grid_h, r.grid_w
    pad_h, pad_w = gh * th_t, gw * tw_t
    dpad = np.full((pad_h, pad_w), -np.inf, np.float32)
    dpad[:r.fb_h, :r.fb_w] = depth
    tz = dpad.reshape(gh, th_t, gw, tw_t).transpose(0, 2, 1, 3).reshape(
        gh * gw, -1)
    tile_zmax = tz.max(axis=1)          # final z-max per tile
    tile_full = tz.min(axis=1) < 1.0    # proxy: no background at z=1 left?
    covered = (tz < 1.0).mean(axis=1)
    print(f"tiles: {gh * gw}; fully-drawn-over tiles (max z < 1): "
          f"{(tile_zmax < 1.0).mean() * 100:.1f}%  mean covered frac: "
          f"{covered.mean() * 100:.1f}%")

    live = entry_tile < gh * gw
    et = entry_tile[live]
    ez = entry_zmin[live]
    skippable = ez > tile_zmax[et]
    print(f"live entries {live.sum()}; skippable (zmin > final tile zmax): "
          f"{skippable.mean() * 100:.1f}%")

    # exact simulation of the sorted early exit per tile with a per-chunk
    # refreshed threshold: process entries ascending by zmin; zbuf evolves —
    # approximate zbuf evolution by: after processing k entries the tile
    # zmax is the final zmax once all non-skippable entries are done.
    # Conservative estimate of processed work: entries before the FIRST
    # position where zmin > final zmax could still be processed; entries
    # after are skipped (sorted => suffix).  That's exactly 1 - suffix.
    def suffix_model(tag, bound):
        order = np.lexsort((bound, et))
        et_s, ez_s = et[order], bound[order]
        starts = np.searchsorted(et_s, np.arange(gh * gw))
        ends = np.searchsorted(et_s, np.arange(gh * gw) + 1)
        processed = 0
        total = 0
        for t in range(gh * gw):
            seg = ez_s[starts[t]:ends[t]]
            total += seg.size
            if seg.size == 0:
                continue
            k = np.searchsorted(seg, tile_zmax[t], side="right")
            processed += k
        print(f"suffix-exit model [{tag}]: processed {processed} / {total}"
              f" = {100 * processed / max(total, 1):.1f}% (skip "
              f"{100 * (1 - processed / max(total, 1)):.1f}%)")

    suffix_model("tri-global zmin", ez)

    # TILE-LOCAL lower bound: the affine z plane's min over the tile rect
    # (corner picked by coefficient signs), clamped by the triangle-global
    # zmin (the plane min over the rect can undershoot the triangle's own
    # min where the rect lies outside the triangle) — computable at binning
    # time from values the entry table already carries.
    za, zb, zc = (entry_zabc[live, i].astype(np.float64) for i in range(3))
    tx = (et % gw).astype(np.float64)
    ty = (et // gw).astype(np.float64)
    x0, x1 = tx * tw_t + 0.5, tx * tw_t + tw_t - 0.5
    y0, y1 = ty * th_t + 0.5, ty * th_t + th_t - 0.5
    xc = np.where(za > 0, x0, x1)
    yc = np.where(zb > 0, y0, y1)
    zlocal = np.clip(np.maximum(za * xc + zb * yc + zc, ez), 0.0, 1.0)
    skip_local = zlocal > tile_zmax[et]
    print(f"skippable with TILE-LOCAL plane bound: "
          f"{skip_local.mean() * 100:.1f}%")
    suffix_model("tile-local bound", zlocal)

    # ---- per-row / per-col / sub-rect threshold CEILINGS (VERDICT r4 #2b:
    # "carry the threshold per 8-px sublane row").  Upper bound for each
    # formulation: an entry is skippable iff its zmin exceeds the FINAL
    # zbuf max over the rows/cols/rect its pixel bbox touches within the
    # tile.  If even these ideals barely beat the 26.7% tile ceiling, no
    # kernel implementation (which pays chunk granularity + gate costs on
    # top) can pay. ----
    trow = tz.reshape(gh * gw, th_t, tw_t)
    ty_i = (et // gw) * th_t
    tx_i = (et % gw) * tw_t
    ry0 = np.clip(entry_span[live, 0] - ty_i, 0, th_t - 1)
    ry1 = np.clip(entry_span[live, 1] - ty_i, 0, th_t - 1)
    rx0 = np.clip(entry_span[live, 2] - tx_i, 0, tw_t - 1)
    rx1 = np.clip(entry_span[live, 3] - tx_i, 0, tw_t - 1)
    for tag, rows in (("per-pixel-row", 1), ("per-sublane-8row", 8)):
        nr = th_t // rows
        rmax = trow.reshape(gh * gw, nr, rows, tw_t).max(axis=(2, 3))
        # nr is tiny (<= 16), so the segment max loops rows
        span_max = np.full(et.shape, -np.inf, np.float32)
        a = ry0 // rows
        b = ry1 // rows
        for rr in range(nr):
            sel = (a <= rr) & (rr <= b)
            span_max[sel] = np.maximum(span_max[sel], rmax[et[sel], rr])
        print(f"skippable CEILING [{tag} thresholds]: "
              f"{(ez > span_max).mean() * 100:.1f}%")
    # per-128-lane column groups are the whole tile width: use 8/16-px cols
    for tag, cols in (("per-16px-col", 16),):
        nc = tw_t // cols
        cmax = trow.reshape(gh * gw, th_t, nc, cols).max(axis=(1, 3))
        span_max = np.full(et.shape, -np.inf, np.float32)
        a = rx0 // cols
        b = rx1 // cols
        for cc in range(nc):
            sel = (a <= cc) & (cc <= b)
            span_max[sel] = np.maximum(span_max[sel], cmax[et[sel], cc])
        print(f"skippable CEILING [{tag} thresholds]: "
              f"{(ez > span_max).mean() * 100:.1f}%")
    # full sub-rect (row span x 16-px col span): the union bound
    cols = 16
    span_max = np.full(et.shape, -np.inf, np.float32)
    nc = tw_t // cols
    rectmax = trow.reshape(gh * gw, th_t, nc, cols).max(axis=3)  # [T, th, nc]
    ca = rx0 // cols
    cb = rx1 // cols
    for rr in range(th_t):
        rsel = (ry0 <= rr) & (rr <= ry1)
        if not rsel.any():
            continue
        for cc in range(nc):
            sel = rsel & (ca <= cc) & (cc <= cb)
            span_max[sel] = np.maximum(span_max[sel], rectmax[et[sel], rr, cc])
    print(f"skippable CEILING [pixel-row x 16px-col sub-rect]: "
          f"{(ez > span_max).mean() * 100:.1f}%")


if __name__ == "__main__":
    main()
