"""Round-4: attack the visibility kernel's PER-TILE fixed cost.

Decomposition (tools/exp_visibility.py empty/seg*, real sponza table):
  empty segments           10.56 ms   -> 10.4 us per tile, ZERO entries
  first chunk              +4.4 us/tile (seg32 ~= seg64: entries free)
  second chunk             +3.7 us/tile
~15 of the fused frame's 32.3 ms visibility is per-tile overhead.  The
two levers that divide it:
  * tiles_per_prog (wired, default off): N tiles per grid program —
    only ever A/B'd in the round-3 inflated-cap era (rows marked *),
    never honestly priced
  * tile_h=32: halves the tile count (and the binning entry count
    shrinks a little too), at 2x vector work per entry

    python tools/exp_tilecost.py [frames=8]
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
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    frames = int(kv.get("frames", 8))

    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.raster_pallas import rasterize_visibility_pallas
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.pipeline.state import MESH_PIPELINE_STATE
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device, flush=True)
    rig = scenelib.config5_sponza(device)
    print("scene:", rig.name, "tris:", rig.triangle_count, flush=True)

    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0,
                              rig.resolution))
    (texels, toff, tw, th, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex, *_rest) = arrays
    r = rf.plan.raster
    fb_w, fb_h = r.fb_w, r.fb_h

    mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                      precision=jax.lax.Precision.HIGHEST)
    clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
    ct = near_clip_triangles(clip, uv3, tri_tex[0],
                             tri_valid0[0] & cam_valid[0],
                             extra_cap=r.clip_cap)
    depth0 = jnp.ones((fb_h, fb_w), jnp.float32)

    def bin_for(tile_h, tile_w=128):
        grid_w = -(-fb_w // tile_w)
        grid_h = -(-fb_h // tile_h)
        su = setup_triangles(ct.clip, ct.uv, ct.tex_id, ct.valid,
                             viewports[0], scissors[0],
                             tile_w=tile_w, tile_h=tile_h,
                             grid_w=grid_w, grid_h=grid_h, order=ct.order)
        b = bin_triangles(su, grid_w=grid_w, grid_h=grid_h,
                          entry_cap=r.entry_cap,
                          max_tiles_per_tri=r.max_tiles_per_tri,
                          broad_cap=r.broad_cap, spill_cap=r.spill_cap)
        return jax.block_until_ready(b), grid_w, grid_h

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *args, **kw):
        try:
            sync(fn(*args, **kw))
        except Exception as e:
            print(f"  [{name}] COMPILE FAIL: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:28s} {dt * 1000:9.2f} ms", flush=True)

    import dataclasses
    cache = {}

    def row(name, tile_h=16, chunk=128, tpp=1, empty=False, noexit=False,
            lag2=False):
        if tile_h not in cache:
            cache[tile_h] = bin_for(tile_h)
        b, grid_w, grid_h = cache[tile_h]
        if empty:
            b = b._replace(tile_start=jnp.zeros_like(b.tile_start),
                           num_broad=jnp.zeros_like(b.num_broad))
        print(f"[{name}] entries={int(b.num_entries)} "
              f"grid={grid_h}x{grid_w}", flush=True)
        timeit(name, rasterize_visibility_pallas, b, depth0, scissors[0],
               fb_w=fb_w, fb_h=fb_h, tile_w=128, tile_h=tile_h,
               grid_w=grid_w, grid_h=grid_h, chunk=chunk,
               depth_state=MESH_PIPELINE_STATE.depth,
               tiles_per_prog=tpp, noexit=noexit, lag2=lag2)

    rows = {
        "prod_tpp1": dict(tpp=1),
        "prod_tpp2": dict(tpp=2),
        "prod_tpp4": dict(tpp=4),
        "prod_tpp1_empty": dict(tpp=1, empty=True),
        "prod_tpp4_empty": dict(tpp=4, empty=True),
        "prod_th32": dict(tile_h=32, tpp=1),
        "prod_th32_tpp2": dict(tile_h=32, tpp=2),
        "prod_th32_empty": dict(tile_h=32, tpp=1, empty=True),
        "prod_th32_c256": dict(tile_h=32, chunk=256),
        "prod_th8": dict(tile_h=8, tpp=1),
        "prod_th8_tpp3": dict(tile_h=8, tpp=3),  # grid_h 135 = 45*3
        "prod_noexit": dict(noexit=True),
        "prod_lag2": dict(lag2=True),
    }
    sel = [a for a in sys.argv[1:] if "=" not in a] or list(rows)
    for name in sel:
        row(name, **rows[name])


if __name__ == "__main__":
    main()
