"""Instrumented bench_rig replica for sponza: prints the adaptive plan at
every settle batch and the timed-window frame times, so a driver-bench FPS
that disagrees with the steady fused frame can be attributed (which fits
engaged? did a recompile land in the timed window?)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.window.render_window import RenderWindow, WindowHandle

    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    win = RenderWindow(device, WindowHandle(), resolution=rig.resolution,
                       present_mode="immediate")
    rf = win.rendering_function

    def one(t):
        scene = win.get_render_scene()
        rig.fill(scene, t)
        win.render(device)

    def planline(tag):
        r = rf.plan.raster
        print(f"{tag}: entry_cap={r.entry_cap} valid_cap={r.valid_cap} "
              f"spill_cap={r.spill_cap} levels={r.spill_level_caps} "
              f"near_clip={r.near_clip} stage={rf._fit_stage} "
              f"clean={rf._entry_clean_frames}", flush=True)

    t0 = time.perf_counter()
    for k in range(8):
        one(0.1 * k)
    win.flush()
    planline(f"after warmup (+{time.perf_counter()-t0:.0f}s)")
    prev = None
    for j in range(10):
        if rf.plan == prev:
            print(f"settle: stable after batch {j}", flush=True)
            break
        prev = rf.plan
        for i in range(8):
            one(0.2 + 0.01 * (8 * j + i))
        win.flush()
        planline(f"settle batch {j} (+{time.perf_counter()-t0:.0f}s)")

    for rep in range(2):
        for n in (16, 48):
            s = time.perf_counter()
            for k in range(n):
                one(0.3 + 0.05 * k)
            win.flush()
            dt = time.perf_counter() - s
            print(f"rep{rep} window n={n}: {dt:.3f}s = {1e3*dt/n:.2f} ms/f",
                  flush=True)
        planline(f"rep{rep} end")
    win.flush()

if __name__ == "__main__":
    main()
