"""Fused-frame stage attribution for config5 (TPU).

Isolated per-stage jits mislead: XLA picks different layouts/fusions per
program (see CLAUDE.md "LAYOUT TRAP").  This tool compiles CUMULATIVE
PREFIXES of the real frame pipeline — transform+clip+setup | +binning |
+visibility | +shade — inside one jit each, so the deltas are the stages'
true fused costs.

    python tools/profile_fused.py [frames]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

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
    from tyleri_tpu.ops.shade import shade_visibility
    from tyleri_tpu.rendering.forward import _render_frame
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
    print("plan:", r, flush=True)

    def upto(stage):
        """Build a jit computing the pipeline up to `stage` (everything
        later is dead and DCE'd, exactly as in the fused frame)."""

        def f(view_projs, models):
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
            if stage == "setup":
                # force all setup outputs live (sum is cheap vs the stage)
                return (jnp.sum(su.channels), jnp.sum(su.tile_lo),
                        jnp.sum(su.tile_hi), jnp.sum(su.valid))
            binned = bin_triangles(
                su, grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=r.entry_cap,
                max_tiles_per_tri=r.max_tiles_per_tri,
                broad_cap=r.broad_cap, spill_cap=r.spill_cap)
            if stage == "binning":
                return (jnp.sum(binned.entry_channels),
                        jnp.sum(binned.tile_start), binned.num_entries,
                        binned.overflow, jnp.sum(binned.broad_channels_cm))
            depth0 = jnp.ones((r.fb_h, r.fb_w), jnp.float32)
            vis, _ = rasterize_visibility_pallas(
                binned, depth0, scissors[0], fb_w=r.fb_w, fb_h=r.fb_h,
                tile_w=r.tile_w, tile_h=r.tile_h,
                grid_w=r.grid_w, grid_h=r.grid_h, chunk=r.chunk,
                depth_state=rf.mesh_state.depth,
                interpret=jax.default_backend() != "tpu")
            if stage == "visibility":
                return (jnp.sum(vis.depth), jnp.sum(vis.owner),
                        jnp.sum(vis.uw), jnp.sum(vis.tex))
            color0 = jnp.zeros((r.fb_h, r.fb_w, 4), jnp.float32)
            out = shade_visibility(vis, texels, toff, tw_, th_,
                                   rf.mesh_state.blend, color0)
            return (jnp.sum(out),)

        return jax.jit(f)

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *args):
        sync(fn(*args)); t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:22s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    prev = 0.0
    for stage in ("setup", "binning", "visibility", "shade"):
        dt = timeit(f"upto {stage}", upto(stage), view_projs, models)
        print(f"{'  delta ' + stage:22s} {(dt - prev) * 1000:9.2f} ms",
              flush=True)
        prev = dt

    frame_fn = functools.partial(
        _render_frame, rf.plan, rf.mesh_state, rf.ui_state)
    dt = timeit("full frame", frame_fn, *arrays)
    print(f"{'fps':22s} {1.0 / dt:9.2f}")

    # the steady-state production frame: near_clip disabled after 2 clean
    # frames -> fused transform+cull+setup Pallas kernels
    import dataclasses

    from tyleri_tpu.rendering.passes import use_fused_setup

    noclip = dataclasses.replace(rf.plan.raster, near_clip=False)
    if use_fused_setup(noclip, rf.plan.draw_cap):
        plan2 = dataclasses.replace(rf.plan, raster=noclip)
        frame2 = functools.partial(
            _render_frame, plan2, rf.mesh_state, rf.ui_state)
        dt = timeit("fused-setup frame", frame2, *arrays)
        print(f"{'fused fps':22s} {1.0 / dt:9.2f}")

        # ... plus the adaptive valid_cap shrink (dense-slot demand learned
        # from a frame's bin_demand, note_overflow's 1.25x + 1<<16 granule)
        from tyleri_tpu.ops.binning import spill_rows

        f2 = frame2(*arrays)
        dem = int(jax.device_get(f2.bin_demand))
        edem = int(jax.device_get(f2.entry_demand))
        vcap = -(-int(dem * 1.25) // (1 << 16)) * (1 << 16)
        full = rf.plan.tri_cap + noclip.clip_cap
        if vcap <= full - (1 << 16):
            # settle exactly like the window loop: grow spill_cap on
            # reported overflow (sponza's spill demand exceeds the level-0
            # cap at the initial spill_cap — an unchecked v-cap plan here
            # used to silently drop ~200K live entries and flatter the
            # steady number), then apply the round-5 entry-slice fit
            spill_cap = noclip.spill_cap
            for _ in range(6):
                r3 = dataclasses.replace(
                    noclip, valid_cap=vcap, spill_cap=spill_cap,
                    entry_cap=vcap + spill_rows(
                        spill_cap, noclip.max_tiles_per_tri),
                )
                plan3 = dataclasses.replace(rf.plan, raster=r3)
                frame3 = functools.partial(
                    _render_frame, plan3, rf.mesh_state, rf.ui_state)
                f3 = frame3(*arrays)
                over = int(jax.device_get(f3.bin_overflow))
                if over == 0:
                    # re-read demand from the CLEAN frame: the pre-growth
                    # frame truncates and undercounts live entries
                    edem = int(jax.device_get(f3.entry_demand))
                    break
                print(f"  (spill_cap {spill_cap}: overflow {over} -> x2)",
                      flush=True)
                spill_cap *= 2
            # production applies the per-spill-level fit and, after a long
            # clean streak, the stage-2 tighten (1.10x) — mirror both so
            # this steady line IS the production steady plan
            sdem = jax.device_get(f3.spill_demand)
            fit = -(-int(edem * 1.10) // (1 << 16)) * (1 << 16)
            if fit < r3.entry_cap:
                levels = tuple(
                    max(-(-int(d * 1.10) // 512) * 512, 512) for d in sdem)
                r3 = dataclasses.replace(r3, entry_cap=fit,
                                         spill_level_caps=levels)
                plan3 = dataclasses.replace(rf.plan, raster=r3)
                frame3 = functools.partial(
                    _render_frame, plan3, rf.mesh_state, rf.ui_state)
            over3 = int(jax.device_get(frame3(*arrays).bin_overflow))
            if over3:
                # a truncating plan flatters the number (the round-5
                # capacity-tax lesson) — surface it, never hide it
                print(f"  WARNING steady plan overflows ({over3}) — "
                      "number not comparable", flush=True)
            dt = timeit(f"steady frame (v{vcap >> 16}/e{r3.entry_cap >> 16})",
                        frame3, *arrays)
            print(f"{'steady fps':22s} {1.0 / dt:9.2f}")

            # round-5b: the production orbit keeps near_clip ON (real
            # crossings), where the HYBRID fused+clip-subset path now
            # runs (use_fused_setup_clip) — the true steady production
            # frame is this one, not the no-clip ideal above
            r4 = dataclasses.replace(r3, near_clip=True)
            plan4 = dataclasses.replace(rf.plan, raster=r4)
            frame4 = functools.partial(
                _render_frame, plan4, rf.mesh_state, rf.ui_state)
            dt = timeit("steady frame (clip-on hybrid)", frame4, *arrays)
            print(f"{'steady clip-on fps':22s} {1.0 / dt:9.2f}")


if __name__ == "__main__":
    main()
