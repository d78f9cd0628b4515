"""Price the adaptive entry-slice (round 5) on the steady config5 frame.

The (tile, zmin) entry sort keeps dead rows last, so entry_cap can slice
the sorted table below the emitted row budget (valid_cap + spill rows)
once the live entry demand is known: the channel gather and its table
write are latency/BW-bound per STATIC row.  This times the steady fused
production frame (near-clip off, valid_cap shrunk — the plan the window
loop converges to) at the full budget vs demand-fit slices, interleaved
reps so tunnel drift shows as spread.

    python tools/exp_entrycap.py [frames] [reps]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools

import jax
import numpy as np


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.binning import spill_rows
    from tyleri_tpu.rendering.forward import _render_frame
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    rf = ty.ForwardRenderingFunction(
        device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(rf.build_frame_inputs(
        device, scene.render_resources, 1.0, rig.resolution))

    # converge the adaptive plan the way the window loop would: one frame
    # for the demands, then grow spill_cap (overflow feedback doubling)
    # until the budget plan is clean — sponza's spill demand exceeds the
    # level-0 cap at the initial spill_cap, so the SETTLED production
    # entry budget is vcap + spill_rows(GROWN spill_cap), bigger than the
    # pre-growth cap the earlier profiles assumed
    base_frame = functools.partial(
        _render_frame, rf.plan, rf.mesh_state, rf.ui_state)
    f0 = base_frame(*arrays)
    dem = int(jax.device_get(f0.bin_demand))
    edem = int(jax.device_get(f0.entry_demand))
    live = edem
    vcap = -(-int(dem * 1.25) // (1 << 16)) * (1 << 16)
    fit = -(-int(edem * 1.25) // (1 << 16)) * (1 << 16)

    spill_cap = rf.plan.raster.spill_cap
    level_fit = ()

    def plan_with(entry_cap, spill_cap, level_caps=()):
        r = dataclasses.replace(rf.plan.raster, near_clip=False,
                                valid_cap=vcap, entry_cap=entry_cap,
                                spill_cap=spill_cap,
                                spill_level_caps=level_caps)
        return dataclasses.replace(rf.plan, raster=r)

    for _ in range(6):
        srows = spill_rows(spill_cap, rf.plan.raster.max_tiles_per_tri)
        budget = vcap + srows
        probe = functools.partial(
            _render_frame, plan_with(budget, spill_cap),
            rf.mesh_state, rf.ui_state)
        pf = probe(*arrays)
        over = int(jax.device_get(pf.bin_overflow))
        print(f"spill_cap {spill_cap} -> budget {budget} overflow {over}",
              flush=True)
        if over == 0:
            # demand must come from an overflow-FREE frame: a truncating
            # plan undercounts live entries (the production feedback
            # learns only from clean frames for the same reason)
            edem = int(jax.device_get(pf.entry_demand))
            live = edem
            fit = -(-int(edem * 1.25) // (1 << 16)) * (1 << 16)
            if pf.spill_demand is not None:
                sd = np.asarray(jax.device_get(pf.spill_demand))
                level_fit = tuple(
                    max(-(-int(d * 1.25) // 512) * 512, 512) for d in sd)
                print(f"spill level demand {sd.tolist()} -> fit "
                      f"{level_fit}", flush=True)
            break
        spill_cap *= 2
    print(f"dense demand {dem}  live entries {live}  vcap {vcap}  "
          f"budget cap {budget}  fit cap {fit}", flush=True)

    def sync(out):
        np.asarray(jax.device_get(out.color.ravel()[:1]))

    variants = [("budget", budget, ()), ("fit", fit, ())]
    if level_fit:
        from tyleri_tpu.ops.binning import spill_rows as _sr

        lf_budget = vcap + _sr(spill_cap,
                               rf.plan.raster.max_tiles_per_tri, level_fit)
        variants.append(("levelfit", min(lf_budget, fit), level_fit))

    fns = {}
    for name, cap, lcaps in variants:
        fns[name] = functools.partial(
            _render_frame, plan_with(cap, spill_cap, lcaps),
            rf.mesh_state, rf.ui_state)
        out = fns[name](*arrays)
        sync(out)
        over = int(jax.device_get(out.bin_overflow))
        print(f"[{name}] entry_cap={cap} overflow={over}", flush=True)
        assert over == 0, f"{name} truncates live entries"

    for rep in range(reps):
        for name, cap, _lc in variants:
            fn = fns[name]
            sync(fn(*arrays))
            t0 = time.perf_counter()
            for _ in range(frames):
                out = fn(*arrays)
            sync(out)
            dt = (time.perf_counter() - t0) / frames
            print(f"rep{rep} {name:8s} cap={cap:8d} {dt * 1000:9.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
