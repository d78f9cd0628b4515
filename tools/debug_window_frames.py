"""Per-frame diagnosis of the production RenderWindow loop for one flag
combo: wall time per frame, plan-change detection, and XLA compile logging
— to explain A/B rows whose steady-state frame time disagrees with
profile_fused on the same plan (round-3 incident: 3.2 s/frame vs 92 ms fused).

    python tools/debug_window_frames.py base 12
    python tools/debug_window_frames.py base 8 sync   # flush per frame:
        # serialized true device time per frame (no pipelining)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import ab_flags

    name = sys.argv[1] if len(sys.argv) > 1 else "base"
    nframes = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    sync = len(sys.argv) > 3 and sys.argv[3] == "sync"
    for k in ab_flags.KNOBS:
        os.environ.pop(k, None)
    os.environ.update(ab_flags.COMBOS[name])

    import jax

    jax.config.update("jax_log_compiles", True)

    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.window.render_window import RenderWindow, WindowHandle

    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    print("tris:", rig.triangle_count, "combo:", name, flush=True)
    win = RenderWindow(device, WindowHandle(), resolution=rig.resolution,
                       present_mode="immediate")
    rf = win.rendering_function
    prev_plan = None
    for k in range(nframes):
        t0 = time.perf_counter()
        scene = win.get_render_scene()
        rig.fill(scene, 0.1 * k)
        t1 = time.perf_counter()
        win.render(device)
        if sync:
            win.flush()
        t2 = time.perf_counter()
        p = rf.plan
        changed = ""
        if p != prev_plan:
            changed = (f"  PLAN CHANGED: entry={p.raster.entry_cap} "
                       f"spill={p.raster.spill_cap} valid={p.raster.valid_cap} "
                       f"med={p.raster.med_cap} broad={p.raster.broad_cap} "
                       f"clip={p.raster.clip_cap} near={p.raster.near_clip} "
                       f"cpt={p.raster.cap_per_tile}")
            prev_plan = p
        print(f"frame {k:2d}: fill={1e3 * (t1 - t0):7.1f} ms  "
              f"render={1e3 * (t2 - t1):7.1f} ms{changed}", flush=True)
    t0 = time.perf_counter()
    win.flush()
    print(f"flush: {1e3 * (time.perf_counter() - t0):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
