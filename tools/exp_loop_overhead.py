"""Round-4: price the production-loop overhead vs the fused frame program
with the HONEST two-point method (diag_window_slow's single-window numbers
carry the whole end-fence constant, misleading under a degraded tunnel).

Rows (each a bench.bench_rig two-point slope on config5; the auto
present-quantize policy DEFERS at 1080p, so production = deferred):
  A. production              (readiness-gated stats drain + deferred quantize)
  B. stats disabled          (no queuing, no drain tasks, no stat device_gets
                              — isolates the whole stats path)
  C. stats off + FUSED quantize (quantize inside the frame program instead of
                              the deferred own-launch; isolates the deferred
                              schedule's saving)
  D. stats off + device-put blob pre-staged is not separable here; see
     exp_fixedcost for transfer latency.

    python tools/exp_loop_overhead.py [frames]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import jax

    import bench
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.window import render_window as rw

    device = ty.RenderDeviceBuilder().build()
    print("devices:", jax.devices(), flush=True)
    rig = scenelib.config5_sponza(device)
    print("scene:", rig.name, "tris:", rig.triangle_count, flush=True)

    # Disable stats at the ENQUEUE: the background drain calls
    # _report_stat_rows directly, so patching _report_frames_stats (the
    # old hook) only silences flush()'s end-of-window report — a constant
    # the two-point slope cancels — and rows B/C would still pay every
    # per-second drain device_get.
    orig_enqueue = rw.RenderWindow._enqueue_frame_stats
    orig_report = rw.RenderWindow._report_stat_rows

    def row(label):
        t0 = time.perf_counter()
        res = bench.bench_rig(device, rig, warmup=8, frames=frames,
                              budget_s=1e9)
        print(f"[{label:>28}] fps={res['fps']:7.2f} "
              f"frame={1e3 / max(res['fps'], 1e-9):7.2f} ms "
              f"(wall {time.perf_counter() - t0:.0f}s)", flush=True)
        return res

    row("production")

    rw.RenderWindow._enqueue_frame_stats = lambda self, d, f: None
    rw.RenderWindow._report_stat_rows = lambda self, d, rows: None
    row("no stats")

    # no stats + fused present quantize forced (the auto policy defers at
    # 1080p; this row isolates the deferred launch's saving)
    class _FusedWindow(rw.RenderWindow):
        def __init__(self, *a, **k):
            k.setdefault("present_quantize", "fused")
            super().__init__(*a, **k)

    orig_cls = rw.RenderWindow
    try:
        rw.RenderWindow = _FusedWindow
        row("no stats, fused quantize")
    finally:
        rw.RenderWindow = orig_cls
        rw.RenderWindow._enqueue_frame_stats = orig_enqueue
        rw.RenderWindow._report_stat_rows = orig_report


if __name__ == "__main__":
    main()
