"""Per-stage timing of the raster pipeline on the local chip.

Times transform+setup / binning / visibility / shade separately for a
chosen BASELINE config, to direct kernel optimization. Run on TPU:
    python tools/profile_stages.py [config] [frames]
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
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.setup import setup_triangles
    from tyleri_tpu.ops.shade import shade_visibility
    from tyleri_tpu.rendering import passes
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    config = sys.argv[1] if len(sys.argv) > 1 else "config4"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device)
    make = {
        "config2": lambda: scenelib.config2_cube(device, (800, 600)),
        "config3": lambda: scenelib.config3_suzanne(device, (800, 600)),
        "config4": lambda: scenelib.config4_instances(device),
        "config5": lambda: scenelib.config5_sponza(device),
    }[config]
    rig = make()
    print("scene:", rig.name, "tris:", rig.triangle_count)

    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0, rig.resolution)
    )
    plan = rf.plan
    # experiment knobs: override raster geometry without touching the library
    if os.environ.get("TILE_H"):
        import dataclasses

        plan = dataclasses.replace(
            plan, raster=dataclasses.replace(
                plan.raster, tile_h=int(os.environ["TILE_H"])))
    (texels, toff, tw, th, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex,
     *_rest) = arrays
    print("plan:", plan)

    r = plan.raster
    from tyleri_tpu.ops.setup import transform_corner_table
    from tyleri_tpu.ops.clip import near_clip_triangles

    @jax.jit
    def stage_setup(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
        ct = near_clip_triangles(clip, uv3, tri_tex[0],
                                 tri_valid0[0] & cam_valid[0],
                                 extra_cap=r.clip_cap)
        su = setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid,
            viewports[0], scissors[0],
            tile_w=r.tile_w, tile_h=r.tile_h, grid_w=r.grid_w, grid_h=r.grid_h,
            order=ct.order)
        return su

    su = jax.block_until_ready(stage_setup(view_projs, models))

    @jax.jit
    def stage_bin(su):
        return bin_triangles(su, grid_w=r.grid_w, grid_h=r.grid_h,
                             entry_cap=r.entry_cap,
                             max_tiles_per_tri=r.max_tiles_per_tri,
                             broad_cap=r.broad_cap, spill_cap=r.spill_cap)

    binned = jax.block_until_ready(stage_bin(su))
    print("entries:", int(binned.num_entries), "broad:", int(binned.num_broad),
          "overflow:", int(binned.overflow))

    depth0 = jnp.ones((r.fb_h, r.fb_w), jnp.float32)
    use_pallas = passes._use_pallas(r, rf.mesh_state)
    if use_pallas:
        from tyleri_tpu.ops.raster_pallas import rasterize_visibility_pallas

        @jax.jit
        def stage_vis(binned, depth0):
            return rasterize_visibility_pallas(
                binned, depth0, scissors[0],
                fb_w=r.fb_w, fb_h=r.fb_h, tile_w=r.tile_w, tile_h=r.tile_h,
                grid_w=r.grid_w, grid_h=r.grid_h, chunk=r.chunk,
                depth_state=rf.mesh_state.depth,
                interpret=jax.default_backend() != "tpu")
    else:
        from tyleri_tpu.ops.visibility import rasterize_visibility

        @jax.jit
        def stage_vis(binned, depth0):
            return rasterize_visibility(
                binned, depth0, scissors[0],
                fb_w=r.fb_w, fb_h=r.fb_h, tile_w=r.tile_w, tile_h=r.tile_h,
                grid_w=r.grid_w, grid_h=r.grid_h,
                cap_per_tile=r.cap_per_tile, chunk=r.chunk,
                depth_state=rf.mesh_state.depth)
    print("visibility backend:", "pallas" if use_pallas else "xla")

    vis, _ = jax.block_until_ready(stage_vis(binned, depth0))

    color0 = jnp.zeros((r.fb_h, r.fb_w, 4), jnp.float32)

    @jax.jit
    def stage_shade(vis, color0):
        return shade_visibility(vis, texels, toff, tw, th,
                                rf.mesh_state.blend, color0)

    jax.block_until_ready(stage_shade(vis, color0))

    def timeit(name, fn, *args):
        def sync(out):
            # block_until_ready is unreliable on the tunnelled runtime for
            # small programs; fetching one leaf truly synchronizes
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.ravel()[:1]))

        sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:12s} {dt * 1000:9.2f} ms")
        return dt

    # sub-stages of "setup" (transform / clip / plane setup)
    @jax.jit
    def sub_transform(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        return transform_corner_table(corners[0], tri_draw[0], mvps)

    clip0, uv0 = jax.block_until_ready(sub_transform(view_projs, models))

    @jax.jit
    def sub_clip(clip0, uv0):
        return near_clip_triangles(clip0, uv0, tri_tex[0],
                                   tri_valid0[0] & cam_valid[0],
                                   extra_cap=r.clip_cap)

    ct0 = jax.block_until_ready(sub_clip(clip0, uv0))

    @jax.jit
    def sub_setup(ct):
        return setup_triangles(ct.clip, ct.uv, ct.tex_id, ct.valid,
                               viewports[0], scissors[0],
                               tile_w=r.tile_w, tile_h=r.tile_h,
                               grid_w=r.grid_w, grid_h=r.grid_h, order=ct.order)

    jax.block_until_ready(sub_setup(ct0))
    timeit("  transform", sub_transform, view_projs, models)
    timeit("  clip", sub_clip, clip0, uv0)
    timeit("  setup-planes", sub_setup, ct0)

    total = 0.0
    total += timeit("setup", stage_setup, view_projs, models)
    total += timeit("binning", stage_bin, su)
    total += timeit("visibility", stage_vis, binned, depth0)
    total += timeit("shade", stage_shade, vis, color0)
    print(f"{'sum':12s} {total * 1000:9.2f} ms  ({1.0 / total:.1f} fps equivalent)")

    # The FUSED frame is the ground truth: cross-jit boundaries above let
    # XLA pick layouts per stage (e.g. a column-major entry table) that the
    # one-program frame avoids, so stage sums can deviate either way.
    import functools

    from tyleri_tpu.rendering.forward import _render_frame

    frame_fn = functools.partial(
        _render_frame, rf.plan, rf.mesh_state, rf.ui_state
    )
    dt = timeit("fused frame", frame_fn, *arrays)
    print(f"{'fused fps':12s} {1.0 / dt:9.2f}")


if __name__ == "__main__":
    main()
