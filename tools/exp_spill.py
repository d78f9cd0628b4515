"""Differential attribution of the binning spill machinery (TPU).

Times the setup+binning prefix with the spill path varied, on the real
config5 workload.  Differences between variants cancel the shared parts
(setup, dense expansion, big sort, gather + sum consumer), so each delta
attributes one piece of the spill formulation.  Isolated-jit layout
caveats apply to ABSOLUTE numbers; deltas are trustworthy.

    python tools/exp_spill.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops import setup as S
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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

    def make_setup(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
        ct = near_clip_triangles(clip, uv3, tri_tex[0],
                                 tri_valid0[0] & cam_valid[0],
                                 extra_cap=r.clip_cap)
        return setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0],
            scissors[0], tile_w=r.tile_w, tile_h=r.tile_h,
            grid_w=r.grid_w, grid_h=r.grid_h, order=ct.order)

    su = jax.jit(make_setup)(view_projs, models)
    su = jax.tree_util.tree_map(lambda x: jax.device_put(x), su)
    jax.block_until_ready(su)
    T = su.valid.shape[0]
    print(f"T={T} spill_cap={r.spill_cap} entry_cap={r.entry_cap}", flush=True)

    # ---- variant binning: same code shape, spill machinery toggled ----
    def variant_bin(su, mode, spill_cap):
        grid_w, grid_h = r.grid_w, r.grid_h
        ntiles = grid_w * grid_h
        entry_cap = r.entry_cap
        K = r.max_tiles_per_tri
        tx0 = su.tile_lo[:, 0]; ty0 = su.tile_lo[:, 1]
        tx1 = su.tile_hi[:, 0]; ty1 = su.tile_hi[:, 1]
        tw = jnp.maximum(tx1 - tx0 + 1, 0)
        th = jnp.maximum(ty1 - ty0 + 1, 0)
        ncover = jnp.where(su.valid, tw * th, 0)
        is_narrow = su.valid & (ncover <= K) & (ncover > 0)
        tri_ids = jnp.arange(T, dtype=jnp.int32)
        zmin_q = su.channels[:, S.CH_ZMIN].astype(jnp.int32)
        dense_tile = jnp.where(is_narrow, ty0 * grid_w + tx0, jnp.int32(ntiles))
        scount = jnp.where(is_narrow, jnp.maximum(ncover - 1, 0), 0)

        bbox_tbl = jnp.concatenate(
            [tx0[:, None], ty0[:, None], jnp.maximum(tw, 1)[:, None],
             zmin_q[:, None]], axis=1).astype(jnp.int32)
        sidx = jnp.arange(spill_cap, dtype=jnp.int32)
        total_spill = jnp.sum(scount)
        spill_live = sidx < jnp.minimum(total_spill, spill_cap)

        if mode == "nospill":
            spill_tile = jnp.full((spill_cap,), ntiles, jnp.int32)
            spill_tri = jnp.zeros((spill_cap,), jnp.int32)
            spill_zmin = jnp.zeros((spill_cap,), jnp.int32)
        elif mode == "direct":  # committed round-2 formulation
            spill_tri = jnp.repeat(
                tri_ids, scount, total_repeat_length=spill_cap
            ).astype(jnp.int32)
            boundary = jnp.concatenate(
                [jnp.ones((1,), bool), spill_tri[1:] != spill_tri[:-1]])
            seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
            rank = sidx - seg_start
            ebox = bbox_tbl[spill_tri]
            twr = ebox[:, 2]
            cidx = rank + 1
            ctx = ebox[:, 0] + cidx % twr
            cty = ebox[:, 1] + cidx // twr
            spill_tile = jnp.where(
                spill_live, cty * grid_w + ctx, jnp.int32(ntiles)
            ).astype(jnp.int32)
            spill_zmin = ebox[:, 3]
        else:  # sort-compaction, optionally with the sort stubbed
            has_spill = scount > 0
            if mode == "nosort":  # WRONG results; isolates the sort cost
                ckey = jnp.where(
                    has_spill, tri_ids.astype(jnp.uint32),
                    tri_ids.astype(jnp.uint32) | jnp.uint32(1 << 31))
                ckey = ckey[:spill_cap]
            else:
                ckey = jnp.where(
                    has_spill, tri_ids.astype(jnp.uint32),
                    tri_ids.astype(jnp.uint32) | jnp.uint32(1 << 31))
                ckey = jax.lax.sort(ckey, dimension=0,
                                    is_stable=False)[:spill_cap]
            live_c = ckey < jnp.uint32(1 << 31)
            src_c = (ckey & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            src_c = jnp.where(live_c, src_c, 0)
            sc_counts = jnp.where(live_c, scount[src_c], 0)
            sp_local = jnp.repeat(
                jnp.arange(spill_cap, dtype=jnp.int32), sc_counts,
                total_repeat_length=spill_cap)
            boundary = jnp.concatenate(
                [jnp.ones((1,), bool), sp_local[1:] != sp_local[:-1]])
            seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
            rank = sidx - seg_start
            spill_tri = src_c[sp_local]
            ebox = bbox_tbl[spill_tri]
            twr = ebox[:, 2]
            cidx = rank + 1
            ctx = ebox[:, 0] + cidx % twr
            cty = ebox[:, 1] + cidx // twr
            spill_tile = jnp.where(
                spill_live, cty * grid_w + ctx, jnp.int32(ntiles)
            ).astype(jnp.int32)
            spill_zmin = ebox[:, 3]

        rows = T + spill_cap
        pad = max(entry_cap - rows, 0)
        all_tile = jnp.concatenate([dense_tile, spill_tile])
        all_zmin = jnp.concatenate([zmin_q, spill_zmin])
        all_tri = jnp.concatenate([tri_ids, spill_tri])
        if pad:
            all_tile = jnp.concatenate(
                [all_tile, jnp.full((pad,), ntiles, jnp.int32)])
            all_zmin = jnp.concatenate([all_zmin, jnp.zeros((pad,), jnp.int32)])
            all_tri = jnp.concatenate([all_tri, jnp.zeros((pad,), jnp.int32)])
        key = (all_tile.astype(jnp.uint32) << 16) | jnp.clip(
            all_zmin, 0, 65535).astype(jnp.uint32)
        key, entry_tri = jax.lax.sort(
            (key, all_tri), dimension=0, num_keys=1, is_stable=False)
        entry_tile = (key[:entry_cap] >> 16).astype(jnp.int32)
        entry_tri = entry_tri[:entry_cap]
        tile_start = jnp.searchsorted(
            entry_tile, jnp.arange(ntiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)
        entry_channels = su.channels[entry_tri]
        return (jnp.sum(entry_channels), jnp.sum(tile_start),
                jnp.sum(entry_tile))

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *args):
        sync(fn(*args)); t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:28s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    import functools
    for mode in ("nospill", "nosort", "sortc", "direct"):
        for cap in (65536, r.spill_cap):
            fn = jax.jit(functools.partial(
                variant_bin, mode=mode, spill_cap=cap))
            timeit(f"{mode} cap={cap}", fn, su)


if __name__ == "__main__":
    main()
