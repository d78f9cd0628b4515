"""Round-3: price the cell-formulation pieces on TPU at config5 scale.

One client, one scene build; times (a) cell binning vs tile binning,
(b) the cells kernel standalone + ablations (no placement dots / no scan)
to attribute its in-kernel cost, (c) the px<->cell permutes, and
(d) entry-count telemetry (live cells entries, overflow, mediums).

    python tools/exp_cells.py [frames] [sections...]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, frames=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / frames * 1e3
    print(f"{name:56s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops import raster_cells as rc
    from tyleri_tpu.ops.binning import (
        bin_triangles, bin_triangles_cells, compact_medium,
        spill_rows_cells,
    )
    from tyleri_tpu.ops.clip import near_cull_triangles
    from tyleri_tpu.ops.raster_pallas import rasterize_visibility_pallas
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.rendering.passes import RasterPlan
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device, flush=True)
    rig = scenelib.config5_sponza(device)
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0,
                              rig.resolution))
    (texels, toff, tw_, th_, clear_color, cam_valid, viewports, scissors,
     view_projs, models, corners, tri_draw, tri_valid0, tri_tex, *_r) = arrays
    W, H = rig.resolution
    r = rf.plan.raster
    ds = rf.mesh_state.depth

    @jax.jit
    def build_setups(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
        ct = near_cull_triangles(clip, uv3, tri_tex[0],
                                 tri_valid0[0] & cam_valid[0],
                                 extra_cap=r.clip_cap)
        su_c = setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0], scissors[0],
            tile_w=16, tile_h=8, grid_w=r.grid_w * 8, grid_h=r.grid_h * 2,
            order=ct.order)
        su_t = setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0], scissors[0],
            tile_w=r.tile_w, tile_h=r.tile_h, grid_w=r.grid_w,
            grid_h=r.grid_h, order=ct.order)
        return su_c, su_t

    su_c, su_t = jax.block_until_ready(build_setups(view_projs, models))
    T = su_c.valid.shape[0]
    n_tris = rig.triangle_count
    spill_c = int(1.3 * n_tris) // (1 << 16) * (1 << 16)
    e_cells = (T + 256 + spill_rows_cells(spill_c) + 127) // 128 * 128
    med_cap = 1 << 13
    print(f"T={T} cells entry_cap={e_cells} tile entry_cap={r.entry_cap}",
          flush=True)

    bc = jax.jit(functools.partial(
        bin_triangles_cells, cell_grid_w=r.grid_w * 8, cell_grid_h=r.grid_h * 2,
        cells_tx=8, cells_ty=2, entry_cap=e_cells, spill_cap=spill_c))
    bt = jax.jit(functools.partial(
        bin_triangles, grid_w=r.grid_w, grid_h=r.grid_h,
        entry_cap=r.entry_cap, max_tiles_per_tri=r.max_tiles_per_tri,
        broad_cap=r.broad_cap, spill_cap=r.spill_cap))

    cells = jax.block_until_ready(bc(su_c))
    tiles = jax.block_until_ready(bt(su_t))
    print("cells entries:", int(cells.num_entries), "overflow:",
          int(cells.overflow), flush=True)
    print("tile entries:", int(tiles.num_entries), "overflow:",
          int(tiles.overflow), flush=True)

    is_med = su_c.valid & (
        (su_c.tile_hi[:, 0] - su_c.tile_lo[:, 0] + 1)
        * (su_c.tile_hi[:, 1] - su_c.tile_lo[:, 1] + 1) > 32)
    med_su, _, movf = compact_medium(su_c, None, is_med, med_cap, 8, 2)
    medium = jax.block_until_ready(bin_triangles(
        med_su, grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=1 << 14,
        max_tiles_per_tri=32, broad_cap=256, spill_cap=1 << 13))
    print("mediums:", int(jnp.sum(is_med)), "compaction overflow:",
          int(movf), flush=True)

    timeit("bin_triangles_cells (sort2 + gather)", bc, su_c, frames=frames)
    timeit("bin_triangles (tile baseline)", bt, su_t, frames=frames)

    depth0 = jnp.ones((H, W), jnp.float32)
    sc = scissors[0]

    kc = jax.jit(functools.partial(
        rc.rasterize_visibility_cells,
        fb_w=W, fb_h=H, tile_w=r.tile_w, tile_h=r.tile_h,
        grid_w=r.grid_w, grid_h=r.grid_h, depth_state=ds))
    kt = jax.jit(functools.partial(
        rasterize_visibility_pallas,
        fb_w=W, fb_h=H, tile_w=r.tile_w, tile_h=r.tile_h,
        grid_w=r.grid_w, grid_h=r.grid_h, chunk=r.chunk, depth_state=ds))

    vc = jax.block_until_ready(kc(cells, medium, depth0, sc))
    vt = jax.block_until_ready(kt(tiles, depth0, sc))
    hc = int(jnp.sum(vc[0].owner >= 0))
    ht = int(jnp.sum(vt[0].owner >= 0))
    print(f"kernel hits: cells={hc} tiles={ht}", flush=True)
    if hc != ht:
        print("!! HIT-COUNT MISMATCH", flush=True)

    timeit("cells kernel (incl. permutes)", kc, cells, medium, depth0, sc,
           frames=frames)
    timeit("serial kernel (exit, baseline)", kt, tiles, depth0, sc,
           frames=frames)

    perm = jax.jit(functools.partial(
        rc._permute, grid_h=r.grid_h, grid_w=r.grid_w,
        tile_h=r.tile_h, tile_w=r.tile_w, cell_h=8, cell_w=16))
    pd = jnp.zeros((r.grid_h * r.tile_h, r.grid_w * r.tile_w), jnp.float32)
    timeit("one px<->cell permute [pad_h, pad_w] f32", perm, pd,
           frames=frames)


if __name__ == "__main__":
    main()
