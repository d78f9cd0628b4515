"""Piecewise timing of bin_triangles internals on the config5 scene (TPU)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tyleri_tpu.ops import setup as S


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.clip import near_clip_triangles
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
    print("plan:", r)

    mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                      precision=jax.lax.Precision.HIGHEST)
    clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
    ct = near_clip_triangles(clip, uv3, tri_tex[0],
                             tri_valid0[0] & cam_valid[0], extra_cap=r.clip_cap)
    su = jax.block_until_ready(setup_triangles(
        ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0], scissors[0],
        tile_w=r.tile_w, tile_h=r.tile_h, grid_w=r.grid_w, grid_h=r.grid_h,
        order=ct.order))

    grid_w, grid_h, entry_cap, spill_cap = r.grid_w, r.grid_h, r.entry_cap, r.spill_cap
    ntiles = grid_w * grid_h
    T = su.valid.shape[0]
    K = r.max_tiles_per_tri

    def head(su):
        tx0 = su.tile_lo[:, 0]; ty0 = su.tile_lo[:, 1]
        tx1 = su.tile_hi[:, 0]; ty1 = su.tile_hi[:, 1]
        tw = jnp.maximum(tx1 - tx0 + 1, 0)
        th = jnp.maximum(ty1 - ty0 + 1, 0)
        ncover = jnp.where(su.valid, tw * th, 0)
        is_narrow = su.valid & (ncover <= K) & (ncover > 0)
        return tx0, ty0, tw, ncover, is_narrow

    @jax.jit
    def p_expand(su):
        tx0, ty0, tw, ncover, is_narrow = head(su)
        tri_ids = jnp.arange(T, dtype=jnp.int32)
        order_int = su.channels[:, S.CH_ORDER].astype(jnp.int32)
        dense_tile = jnp.where(is_narrow, ty0 * grid_w + tx0, jnp.int32(ntiles))
        counts = jnp.where(is_narrow, ncover - 1, 0)
        spill_tri = jnp.repeat(tri_ids, counts, total_repeat_length=spill_cap)
        sidx = jnp.arange(spill_cap, dtype=jnp.int32)
        spill_live = sidx < jnp.minimum(jnp.sum(counts), spill_cap)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), spill_tri[1:] != spill_tri[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
        rank = sidx - seg_start
        bbox_tbl = jnp.concatenate(
            [tx0[:, None], ty0[:, None], jnp.maximum(tw, 1)[:, None],
             order_int[:, None]], axis=1).astype(jnp.int32)
        ebox = bbox_tbl[spill_tri]
        twr = ebox[:, 2]
        cidx = rank + 1
        ctx = ebox[:, 0] + cidx % twr
        cty = ebox[:, 1] + cidx // twr
        spill_tile = jnp.where(spill_live, cty * grid_w + ctx,
                               jnp.int32(ntiles)).astype(jnp.int32)
        return dense_tile, spill_tile, ebox[:, 3], order_int

    @jax.jit
    def p_sort(dense_tile, spill_tile, spill_order, order_int):
        tri_ids = jnp.arange(T, dtype=jnp.int32)
        sidx = jnp.arange(spill_cap, dtype=jnp.int32)
        all_tile = jnp.concatenate([dense_tile, spill_tile])
        all_order = jnp.concatenate([order_int, spill_order])
        all_tri = jnp.concatenate([tri_ids, sidx])  # placeholder tri
        order_bits = int(max(T - 1, 1)).bit_length()
        key = (all_tile.astype(jnp.uint32) << order_bits) | jnp.clip(
            all_order, 0, T - 1).astype(jnp.uint32)
        key, tri = jax.lax.sort((key, all_tri), dimension=0, num_keys=1,
                                is_stable=True)
        return key[:entry_cap], tri[:entry_cap]

    @jax.jit
    def p_gather(tri, su):
        ec = su.channels[tri]
        return ec, jnp.transpose(ec)

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *args, frames=6):
        sync(fn(*args)); t0 = time.perf_counter()
        for _ in range(frames): out = fn(*args)
        sync(out)
        print(f"{name:24s} {(time.perf_counter()-t0)/frames*1000:9.2f} ms",
              flush=True)
        return out

    exp = timeit("expand", p_expand, su)
    srt = timeit("sort+slice", p_sort, *exp)
    timeit("gather+transpose", p_gather, srt[1], su)


if __name__ == "__main__" and "full" not in sys.argv:
    main()


def time_full():
    """Append-mode: time the production bin_triangles jit on config5."""
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.clip import near_clip_triangles
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
    mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                      precision=jax.lax.Precision.HIGHEST)
    clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
    ct = near_clip_triangles(clip, uv3, tri_tex[0],
                             tri_valid0[0] & cam_valid[0], extra_cap=r.clip_cap)
    su = jax.block_until_ready(setup_triangles(
        ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0], scissors[0],
        tile_w=r.tile_w, tile_h=r.tile_h, grid_w=r.grid_w, grid_h=r.grid_h,
        order=ct.order))

    @jax.jit
    def full(su):
        return bin_triangles(su, grid_w=r.grid_w, grid_h=r.grid_h,
                             entry_cap=r.entry_cap,
                             max_tiles_per_tri=r.max_tiles_per_tri,
                             broad_cap=r.broad_cap, spill_cap=r.spill_cap)

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *args, frames=8):
        sync(fn(*args)); t0 = time.perf_counter()
        for _ in range(frames): out = fn(*args)
        sync(out)
        print(f"{name:24s} {(time.perf_counter()-t0)/frames*1000:9.2f} ms",
              flush=True)
        return out

    b = timeit("bin_triangles full", full, su)
    print("entries:", int(b.num_entries))

    # kernel-inputs-only variant (what the fused frame materializes)
    @jax.jit
    def kernel_inputs(su):
        b = bin_triangles(su, grid_w=r.grid_w, grid_h=r.grid_h,
                          entry_cap=r.entry_cap,
                          max_tiles_per_tri=r.max_tiles_per_tri,
                          broad_cap=r.broad_cap, spill_cap=r.spill_cap)
        return (b.entry_channels, b.tile_start, b.num_broad,
                b.broad_channels_cm, b.broad_tiles, b.overflow, b.num_entries)

    timeit("bin kernel-inputs", kernel_inputs, su)


if __name__ == "__main__" and "full" in sys.argv:
    time_full()
