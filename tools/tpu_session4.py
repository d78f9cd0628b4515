"""Round-4 TPU measurement session (part 2), ONE patient client,
continue-on-error:

    python tools/tpu_session4.py > /tmp/tpu_session4.log 2>&1

  0. device probe + tiny jit
  1. tiny-shape compile probe for the decision combos (catches real-TPU
     Mosaic lowering errors in seconds, not mid-benchmark)
  2. ab_flags production-loop FPS: base / noexit / noexit+packed /
     packed / packed+while (post-deletion flag surface; round-4 part 1
     already measured and killed sublane 10.47 / cells 10.45 vs base
     11.96 — see BASELINE.md)
  3. fused-frame attribution under the winner
  4. exp_loop_overhead — two-point production-loop overhead bisect
     (stats drain / fused quantize)
"""

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def step(name, fn):
    log(f"==== {name} ====")
    try:
        fn()
        log(f"==== {name} DONE ====")
    except Exception:
        traceback.print_exc()
        log(f"==== {name} FAILED (continuing) ====")


NAMES = ["base", "peel2", "noexit"]
AB_RESULTS = {}
VARIANT_OK = {}


def probe():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    x = jax.jit(lambda x: x + 1)(jnp.ones((8, 8)))
    x.block_until_ready()
    log("tiny jit ok")


def variant_probe():
    """Compile every candidate combo ONCE at tiny shapes: a Mosaic
    lowering error that only reproduces on real TPU costs seconds here vs
    a full config5 frame compile (40-150 s) inside ab_flags."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ab_flags
    from tyleri_tpu.pipeline.state import (
        BlendState, CompareOp, DepthFormat, DepthState, PipelineState)
    from tyleri_tpu.rendering import passes
    from tyleri_tpu.utils.math3d import Rect2D, Viewport

    FBW, FBH = 256, 64
    state = PipelineState(
        blend=BlendState(enable=False),
        depth=DepthState(test_enable=True, write_enable=True,
                         compare_op=CompareOp.LESS_OR_EQUAL,
                         format=DepthFormat.D16_UNORM))
    rng = np.random.default_rng(3)
    T = 96
    xy = rng.uniform(-1, 1, (T, 3, 2))
    clip = np.zeros((T, 3, 4), np.float32)
    clip[..., :2] = xy
    clip[..., 2] = rng.uniform(0.1, 0.9, (T,))[:, None]
    clip[..., 3] = 1.0
    uv = rng.random((T, 3, 2)).astype(np.float32)
    texels = jnp.ones((4, 16), jnp.float32)
    meta = (jnp.zeros((1,), jnp.int32), jnp.full((1,), 2, jnp.int32),
            jnp.full((1,), 2, jnp.int32))

    def flags_to_plan_kw(env):
        kw = dict(tile_w=128, tile_h=16, chunk=128, entry_cap=1024,
                  cap_per_tile=512, spill_cap=1024, pallas=True)
        if env.get("TYLERI_LAG2"):
            kw["exit_lag2"] = True
        if env.get("TYLERI_WHILE"):
            kw["exit_while"] = True
        if env.get("TYLERI_PEEL2"):
            kw["peel2"] = True
        if env.get("TYLERI_TPP"):
            kw["tiles_per_prog"] = int(env["TYLERI_TPP"])
        if env.get("TYLERI_NOEXIT"):
            kw["noexit"] = True
        return kw

    for name in NAMES:
        env = ab_flags.COMBOS[name]
        t0 = time.time()
        try:
            plan = passes.RasterPlan(fb_w=FBW, fb_h=FBH,
                                     **flags_to_plan_kw(env))
            color = jnp.zeros((FBH, FBW, 4), jnp.float32)
            depth = jnp.ones((FBH, FBW), jnp.float32)
            c, d, _, _ = passes.mesh_pass(
                plan, state, color, depth,
                jnp.asarray(clip), jnp.asarray(uv),
                jnp.zeros((T,), jnp.int32), jnp.ones((T,), bool),
                Viewport(0, 0, FBW, FBH).as_array(),
                Rect2D(0, 0, FBW, FBH).as_array(), texels, *meta)
            jax.block_until_ready(d)
            covered = int(jnp.sum(jnp.asarray(d) < 1.0))
            VARIANT_OK[name] = covered > 50
            log(f"variant {name:>18}: compiled in {time.time() - t0:5.1f}s, "
                f"covered={covered}{'' if VARIANT_OK[name] else ' (BAD)'}")
        except Exception as e:
            VARIANT_OK[name] = False
            log(f"variant {name:>18}: FAILED in {time.time() - t0:5.1f}s: "
                f"{type(e).__name__}: {str(e)[:200]}")


def run_ab():
    import json

    import ab_flags

    names = [n for n in NAMES if VARIANT_OK.get(n) is not False]
    skipped = [n for n in NAMES if n not in names]
    if skipped:
        log(f"skipping combos that failed the compile probe: {skipped}")
    sys.argv = ["ab_flags", "16"] + names
    results = ab_flags.main()
    AB_RESULTS.update(results or {})
    out = {name: {"fps": res["fps"], "env": ab_flags.COMBOS[name]}
           for name, res in AB_RESULTS.items()}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_RESULTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"ab results -> {path}")


def run_winner_profile():
    import ab_flags

    if not AB_RESULTS:
        log("no ab results; skipping winner profile")
        return
    winner = max(AB_RESULTS, key=lambda n: AB_RESULTS[n]["fps"])
    log(f"winner: {winner} @ {AB_RESULTS[winner]['fps']:.2f} fps")
    for k in ab_flags.KNOBS:
        os.environ.pop(k, None)
    os.environ.update(ab_flags.COMBOS[winner])
    import profile_fused

    sys.argv = ["profile_fused", "8"]
    profile_fused.main()
    for k in ab_flags.KNOBS:
        os.environ.pop(k, None)


def run_loop_overhead():
    import exp_loop_overhead

    sys.argv = ["exp_loop_overhead", "16"]
    exp_loop_overhead.main()


if __name__ == "__main__":
    step("0 probe", probe)
    step("1 variant compile probe", variant_probe)
    step("2 ab_flags", run_ab)
    step("3 winner profile", run_winner_profile)
    step("4 loop overhead", run_loop_overhead)
    log("SESSION COMPLETE")
