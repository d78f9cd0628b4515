"""Round-4 TPU measurement session, ordered by decision value (VERDICT r3
items 2/3/5), ONE patient client, continue-on-error:

    python tools/tpu_session4.py > /tmp/tpu_session4.log 2>&1

  0. device probe + tiny jit
  1. tiny-shape compile probe for the decision combos (catches real-TPU
     Mosaic lowering errors in seconds, not mid-benchmark)
  2. ab_flags production-loop FPS: base / sublane / sublane+tpp4 / cells
     -> prices the round-3 unmeasured sublane kernel (VERDICT #2) and
        feeds the cells keep-or-kill decision (VERDICT #5)
  3. fused-frame attribution under the winner
  4. exp_cellprereq.bench_onehot — MXU placement-dot price (formulation
     candidate A)
  5. exp_hiz — hierarchical-z pre-bin cull ceiling (formulation
     candidate B)
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


NAMES = ["base", "sublane", "sublane+tpp4", "cells"]
AB_RESULTS = {}


def probe():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    x = jax.jit(lambda x: x + 1)(jnp.ones((8, 8)))
    x.block_until_ready()
    log("tiny jit ok")


def variant_probe():
    import tpu_session

    import ab_flags

    ab_flags.COMBOS = {n: ab_flags.COMBOS[n] for n in NAMES}
    tpu_session.variant_compile_probe()
    globals()["VARIANT_OK"] = tpu_session.VARIANT_OK


def run_ab():
    import json

    import ab_flags

    ok = globals().get("VARIANT_OK", {})
    names = [n for n in NAMES if ok.get(n) is not False]
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


def run_onehot():
    import exp_cellprereq

    exp_cellprereq.bench_onehot()


def run_hiz():
    import exp_hiz

    exp_hiz.main()


if __name__ == "__main__":
    step("0 probe", probe)
    step("1 variant compile probe", variant_probe)
    step("2 ab_flags", run_ab)
    step("3 winner profile", run_winner_profile)
    step("4 onehot price", run_onehot)
    step("5 hiz ceiling", run_hiz)
    log("SESSION COMPLETE")
