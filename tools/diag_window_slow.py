"""Isolate why the RenderWindow loop measures seconds/frame while the SAME
frame program profiles at ~92-107 ms (tpu_session r3b step-3, 15:38):

  A. raw launch+fence floor: 16 launches of a trivial jit, one end fence
  B. window loop, stats readback DISABLED (monkeypatched no-op)
  C. window loop, quantize-u8 callback ALSO disabled
  D. window loop, production (stats + quantize on)

If B is fast and D is slow, the per-frame background stats device_get is
the serializer; if C is the discriminator it's the u8 quantize callback;
if even B is slow the dispatch-thread submission path itself is at fault.

    python tools/diag_window_slow.py [frames]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_window(device, rig, frames, label):
    import jax
    import jax.numpy as jnp

    from tyleri_tpu.window.render_window import RenderWindow, WindowHandle

    # generic end fence that works even when the image-fetch path is
    # disabled: the TPU stream is in-order, so fetching a fresh launch's
    # result implies every previously enqueued frame has executed
    marker = jax.jit(lambda x: x + 1.0)
    marker(jnp.zeros((8,))).block_until_ready()

    win = RenderWindow(device, WindowHandle(), resolution=rig.resolution,
                       present_mode="immediate")
    for k in range(6):  # warmup: growth recompiles + adaptive flips
        scene = win.get_render_scene()
        rig.fill(scene, 0.1 * k)
        win.render(device)
    win.flush()
    jax.device_get(marker(jnp.zeros((8,))))
    start = time.perf_counter()
    for k in range(frames):
        scene = win.get_render_scene()
        rig.fill(scene, 0.3 + 0.05 * k)
        win.render(device)
    win.flush()
    jax.device_get(marker(jnp.zeros((8,))))
    dt = time.perf_counter() - start
    print(f"[{label:>24}] {1e3 * dt / frames:8.1f} ms/frame "
          f"({frames} frames in {dt:.1f}s)", flush=True)
    return dt / frames


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    import jax
    import jax.numpy as jnp

    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.window import render_window as rw

    device = ty.RenderDeviceBuilder().build()
    print("devices:", jax.devices(), flush=True)

    # A. floor: N trivial launches, one fence
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    x = jnp.ones((128, 128))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    ys = [f(x) for _ in range(16)]
    v = float(jax.device_get(ys[-1])[0, 0])
    print(f"[{'launch floor':>24}] {1e3 * (time.perf_counter() - t0) / 16:8.1f}"
          f" ms/launch (fence val {v})", flush=True)

    rig = scenelib.config5_sponza(device)
    print("scene:", rig.name, "tris:", rig.triangle_count, flush=True)

    # disable at the enqueue: the background drain calls
    # _report_stat_rows directly, so patching _report_frames_stats alone
    # silences only flush()'s end-of-window report
    orig_enqueue = rw.RenderWindow._enqueue_frame_stats
    orig_report = rw.RenderWindow._report_stat_rows
    orig_u8 = rw._UsingResources._ensure_u8

    # B. no stats readback
    rw.RenderWindow._enqueue_frame_stats = lambda self, d, f: None
    rw.RenderWindow._report_stat_rows = lambda self, d, rows: None
    run_window(device, rig, frames, "no stats")

    # C. no stats AND no u8 quantize callback
    rw._UsingResources._ensure_u8 = lambda self: None
    try:
        run_window(device, rig, frames, "no stats, no quantize")
    except Exception as e:  # flush may depend on u8; report, keep going
        print(f"[{'no stats, no quantize':>24}] failed: {e}", flush=True)
    rw._UsingResources._ensure_u8 = orig_u8

    # D. production
    rw.RenderWindow._enqueue_frame_stats = orig_enqueue
    rw.RenderWindow._report_stat_rows = orig_report
    run_window(device, rig, frames, "production")


if __name__ == "__main__":
    main()
