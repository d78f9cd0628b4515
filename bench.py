"""Benchmark driver: renders BASELINE configs on the available chip and
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md); the driver north
star is 60 FPS at 1080p on a 1M-triangle scene, so vs_baseline = fps / 60
for the reported config.
"""

import json
import os
import sys
import time

# pipeline-cache analog: persist compiles across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NORTH_STAR_FPS = 60.0


def _winner_flags():
    """Best plan-flag combo from the last on-chip A/B session
    (AB_RESULTS.json, written by tools/tpu_session.py).  Applied to the
    north-star sponza config only — the combos were measured on that scene
    and plans read the TYLERI_* knobs at build time (RasterPlan.for_scene).
    Explicit user env (any TYLERI_* already set) wins over the file."""
    if any(k.startswith("TYLERI_") for k in os.environ):
        return {}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "AB_RESULTS.json")
    try:
        with open(path) as f:
            results = json.load(f)
        best = max(results, key=lambda n: results[n]["fps"])
        env = dict(results[best].get("env", {}))
        if env:
            print(f"bench: applying A/B winner '{best}' "
                  f"({results[best]['fps']:.2f} fps): {env}", file=sys.stderr)
        return env
    except (OSError, ValueError, KeyError):
        return {}


def bench_rig(device, rig, warmup=8, frames=16, budget_s=180.0, reps=2):
    """Measure steady-state pipelined FPS of one scene rig through the
    PRODUCTION frame loop (RenderWindow: steal scene -> record -> recycle,
    with occupancy/adaptive feedback — rf.record alone never fires
    note_overflow, so the steady-state fused-setup/valid_cap plans would
    not engage).  present_mode="immediate": FIFO would pace to 60 Hz.

    The end-of-window flush() is the only honest fence
    (jax.block_until_ready does not wait on remote runtimes; flush fetches
    stats + the final image).  Warmup covers the adaptive recompiles:
    near-clip flip after 2 clean frames, valid_cap shrink after 4."""
    from tyleri_tpu.window.render_window import RenderWindow, WindowHandle

    win = RenderWindow(device, WindowHandle(), resolution=rig.resolution,
                       present_mode="immediate")

    def one_frame(t):
        scene = win.get_render_scene()
        rig.fill(scene, t)
        return win.render(device)

    t0 = time.perf_counter()
    for k in range(warmup):
        one_frame(0.1 * k)
        if time.perf_counter() - t0 > budget_s:
            print(f"bench {rig.name}: budget ({budget_s:.0f}s) exhausted "
                  f"during warmup frame {k} (cold compiles?) — skipping",
                  file=sys.stderr)
            win.flush()
            return None
    win.flush()  # drain so the timed window starts clean

    # settle: adaptive plan changes (growth, valid_cap shrink after N
    # clean frames, near-clip flips) each recompile — render flushed
    # 8-frame batches until the plan stops changing BETWEEN batches so
    # every adaptive recompile stays OUT of the timed windows (batches,
    # not single frames: the clean-frame counters need several frames to
    # fire, and each flush costs one tunnel round trip)
    prev_plan = None
    for j in range(6):
        plan = win.rendering_function.plan
        if plan == prev_plan or time.perf_counter() - t0 > budget_s:
            break
        prev_plan = plan
        for i in range(8):
            one_frame(0.2 + 0.01 * (8 * j + i))
        win.flush()

    def timed_window(n, t_base):
        start = time.perf_counter()
        for k in range(n):
            one_frame(t_base + 0.05 * k)
        img = win.flush()   # single end fence for the pipelined window
        assert img is not None
        return time.perf_counter() - start

    # TWO-POINT measurement: each window pays one constant end-fence cost
    # (flush = stats drain + final-image fetch; multiple SECONDS when the
    # remote tunnel's round-trip latency is degraded), so the slope
    # between a short and a long window is the honest steady-state frame
    # time with that constant cancelled.  The raw long-window rate is
    # reported alongside as the conservative number.
    #
    # MULTIPLE REPS: tunnel drift between measurements has produced ±25%
    # swings on a single two-point number (BASELINE.md round-4: cube
    # 474 vs 512, peel2 "rep0 tie / rep1 -17.6%").  Each rep is its own
    # two-point pair on the already-warm window; the caller gets every
    # rep so the headline can report the median and the spread.
    fps_reps, raw_reps, bench_s = [], [], 0.0
    for r in range(max(1, reps)):
        if r and time.perf_counter() - t0 > budget_s:
            break
        t_short = timed_window(frames, 0.3)
        t_long = timed_window(3 * frames, 0.3)
        raw_fps = 3 * frames / t_long
        dt = t_long - t_short
        fps_reps.append((2 * frames) / dt if dt > 1e-3 else raw_fps)
        raw_reps.append(raw_fps)
        bench_s += t_short + t_long
    fps_sorted = sorted(fps_reps)
    n = len(fps_sorted)
    fps = (fps_sorted[n // 2] if n % 2 else
           0.5 * (fps_sorted[n // 2 - 1] + fps_sorted[n // 2]))
    spread = (fps_sorted[-1] - fps_sorted[0]) / fps if fps > 0 else 0.0
    return {
        "fps": fps,
        "fps_reps": [round(v, 3) for v in fps_reps],
        "spread": round(spread, 4),
        "raw_fps": max(raw_reps),
        "mtris_per_s": rig.triangle_count * fps / 1e6,
        "frames": 4 * frames * n,
        "seconds": bench_s,
    }


def bench_config1(device, scenelib):
    """BASELINE config 1: headless 512x512 triangle, pixel-matched against
    the f64 oracle (u8 units).  Returns the max |diff| in u8 units."""
    import jax
    import numpy as np

    import tyleri_tpu as ty
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.testing import oracle
    from tyleri_tpu.utils.math3d import Rect2D, Viewport
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    rig = scenelib.config1_triangle(device)
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.0)
    frame = rf.record(device, scene.render_resources, 1.0, rig.resolution)
    got = np.asarray(jax.device_get(frame.color))

    cam = scene.render_resources.cameras[0]
    mesh = cam.mesh_renderers[0]
    alloc = device.memory_allocator
    pos = alloc.static_vertices_buffer.staging("pos")[
        mesh.vertices.offset:mesh.vertices.offset + mesh.vertices.len]
    uvs = alloc.static_vertices_buffer.staging("uv")[
        mesh.vertices.offset:mesh.vertices.offset + mesh.vertices.len]
    idx = alloc.static_indices_buffer.staging("idx")[
        mesh.indices.offset:mesh.indices.offset + mesh.indices.len].astype(int)
    mvp = (cam.get_projection_matrix().astype(np.float64)
           @ cam.view_matrix.astype(np.float64)
           @ np.asarray(mesh.model, np.float64))
    h = np.concatenate([pos[idx], np.ones((len(idx), 1))], axis=1)
    clip = (h @ mvp.T).reshape(-1, 3, 4)
    uv3 = uvs[idx].reshape(-1, 3, 2)
    w, hgt = rig.resolution
    color = np.zeros((hgt, w, 4), np.float64)
    depth = np.ones((hgt, w), np.float64)
    oracle.rasterize(color, depth, clip, uv3, rf.common_pipeline.state,
                     Viewport(0, 0, w, hgt), Rect2D(0, 0, w, hgt),
                     texture=np.ones((1, 1, 4)))
    diff = np.abs(got.astype(np.float64) - color)
    return int(np.round(diff.max() * 255.0))


def main():
    import jax

    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib

    device = ty.RenderDeviceBuilder().build()
    # generous default: a cold compilation cache pays ~40-150 s per frame
    # executable and the adaptive plan flips (near-clip off, valid_cap
    # shrink) add variants; the persistent cache makes warm runs fast
    total_budget = float(os.environ.get("BENCH_BUDGET_S", 1500))
    deadline = time.monotonic() + total_budget
    # The NORTH-STAR config (sponza 1M @1080p) gets a RESERVED share of
    # the budget that the cheap configs may not eat into: round 4 lost
    # the headline row when a cold cache burned the whole budget on
    # cube+suzanne compiles before sponza ever started (BENCH_r04.json).
    reserve = min(float(os.environ.get("BENCH_SPONZA_RESERVE_S", 900)),
                  0.6 * total_budget)

    # config 1: single-triangle pixel-match (correctness row, not FPS).
    # It still pays cold compiles (measured ~10 min on a cold cache through
    # the tunnel), so on a SHORT driver budget skip it rather than let the
    # unguarded correctness row eat the north-star reserve.
    t_start = time.monotonic()
    results1 = None
    if deadline - time.monotonic() > reserve + 120:
        try:
            results1 = bench_config1(device, scenelib)
        except Exception as e:
            print(f"bench config1 failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        print(f"bench config1 done at +{time.monotonic() - t_start:.0f}s",
              file=sys.stderr)
    else:
        print("bench config1: skipped (short budget — preserving the "
              "north-star reserve)", file=sys.stderr)

    results = {}
    # cheapest-first so something always completes inside the budget
    # frame counts chosen so the single end-of-run sync fetch (one tunnel
    # round-trip, tens of ms) is amortized to <5% of the measured window
    plans = [
        ("cube_800x600", lambda: scenelib.config2_cube(device, (800, 600)), 48),
        ("suzanne_1k_lit", lambda: scenelib.config3_suzanne(device), 48),
        ("instances_100_1080p", lambda: scenelib.config4_instances(device), 32),
        # the north-star config: sponza-scale 1M tris @1080p (frame count
        # low enough to fit the budget at single-digit FPS, high enough to
        # amortize the end-of-run sync fence once the frame gets fast)
        ("sponza_1M_1080p", lambda: scenelib.config5_sponza(device), 16),
    ]
    winner_env = _winner_flags()
    for name, make, frames in plans:
        if name == "sponza_1M_1080p":
            remaining = deadline - time.monotonic()   # reserve is HIS
        else:
            remaining = (deadline - reserve) - time.monotonic()
        if remaining < 30:
            if name != "sponza_1M_1080p":
                print(f"bench {name}: skipped (preserving {reserve:.0f}s "
                      "north-star reserve)", file=sys.stderr)
                continue    # later configs may still fit their slices
            break
        applied = winner_env if name == "sponza_1M_1080p" else {}
        # if the winner combo fails here (e.g. a Mosaic lowering error that
        # only reproduces on real TPU), fall back to base flags rather than
        # lose the headline row
        for attempt_env in ([applied, {}] if applied else [{}]):
            try:
                os.environ.update(attempt_env)
                rig = make()
                print(f"bench {name}: starting at "
                      f"+{time.monotonic() - t_start:.0f}s "
                      f"({remaining:.0f}s slice)", file=sys.stderr)
                r = bench_rig(device, rig, warmup=8, frames=frames,
                              budget_s=max(remaining - 10, 30))
                if r:
                    results[name] = r
                break
            except Exception as e:  # report what we have rather than die
                print(f"bench {name} failed (env={attempt_env}): "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
            finally:
                for k in attempt_env:
                    os.environ.pop(k, None)

    # one JSON line per config; the NORTH-STAR row is printed LAST so a
    # single-line consumer parses the headline metric
    if results1 is not None:
        print(json.dumps({
            "metric": "pixelmatch_triangle_512",
            "value": results1, "unit": "max_px_diff_u8",
            "vs_baseline": 1.0 if results1 <= 1 else 0.0,
        }))
    if not results:
        print(json.dumps({"metric": "fps", "value": 0.0, "unit": "fps",
                          "vs_baseline": 0.0}))
        return
    # headline (printed LAST so a single-line consumer parses it) = the
    # north-star config when present, else the most expensive completed one
    headline = ("sponza_1M_1080p" if "sponza_1M_1080p" in results
                else [n for n, _, _ in plans if n in results][-1])

    def row(name):
        r = results[name]
        out = {
            "metric": f"fps_{name}", "value": round(r["fps"], 3),
            "unit": "frames/sec",
            "vs_baseline": round(r["fps"] / NORTH_STAR_FPS, 4),
            "spread": r["spread"], "reps": r["fps_reps"],
        }
        if r["spread"] > 0.15:   # tunnel-degraded: reps disagree >15%
            out["tunnel_degraded"] = True
        return json.dumps(out)

    for name, _, _ in plans:
        if name in results and name != headline:
            print(row(name))
    print(row(headline))


if __name__ == "__main__":
    main()
