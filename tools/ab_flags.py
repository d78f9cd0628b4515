"""A/B the production plan flags on config5 in ONE TPU client.

The env knobs (TYLERI_LAG2 / TYLERI_WHILE / TYLERI_PEEL2 / ...) are read at
plan-construction time (passes.RasterPlan.for_scene), so flipping
os.environ between RenderWindow constructions gives each combo its own
plan without new processes — one client, many executables, all cached.

    python tools/ab_flags.py [frames] [combo ...]

Combos default to: base, packed, while, packed+while, lag2, packed+lag2.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KNOBS = ("TYLERI_LAG2", "TYLERI_WHILE", "TYLERI_TPP", "TYLERI_NOEXIT",
         "TYLERI_PEEL2")
COMBOS = {
    "base": {},
    "while": {"TYLERI_WHILE": "1"},
    "lag2": {"TYLERI_LAG2": "1"},
    "tpp2": {"TYLERI_TPP": "2"},
    "tpp4": {"TYLERI_TPP": "4"},
    "noexit": {"TYLERI_NOEXIT": "1"},
    "peel2": {"TYLERI_PEEL2": "1"},
}


def main():
    import bench
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    names = sys.argv[2:] or list(COMBOS)

    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device, flush=True)
    rig = scenelib.config5_sponza(device)
    print("scene:", rig.name, "tris:", rig.triangle_count, flush=True)

    results = {}
    for name in names:
        env = COMBOS[name]
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.perf_counter()
        try:
            # a combo whose kernel variant fails to lower on real TPU
            # (Mosaic errors don't reproduce in interpret mode) must not
            # take the remaining combos down with it
            res = bench.bench_rig(device, rig, warmup=8, frames=frames,
                                  budget_s=1e9)
        except Exception:
            import traceback

            traceback.print_exc()
            print(f"[{name:>14}] FAILED (continuing)", flush=True)
            continue
        wall = time.perf_counter() - t0
        results[name] = res
        print(f"[{name:>14}] fps={res['fps']:7.2f}  "
              f"frame={1000.0 / res['fps']:6.2f} ms  (wall {wall:.0f}s)",
              flush=True)

    print("\nsummary:", flush=True)
    base = results.get("base")
    for name, res in results.items():
        d = f"  {res['fps'] - base['fps']:+6.2f} fps vs base" if base else ""
        print(f"  {name:>14}: {res['fps']:7.2f} fps{d}", flush=True)
    return results


if __name__ == "__main__":
    main()
