"""Round-3 TPU measurement session: everything the flag decisions need,
in ONE patient client, ordered by decision value, continue-on-error.

    python tools/tpu_session.py > /tmp/tpu_session.log 2>&1

Steps:
  0. device probe + tiny jit
  1. cells-kernel COMPILE probe at tiny shapes (surfaces Mosaic lowering
     errors in seconds instead of mid-benchmark)
  2. ab_flags fused-frame FPS: base / packed / while / packed+while /
     lag2 / cells  (the production-default decision)
  3. exp_cells breakdown (cell vs tile binning, kernels, permute)
  4. exp_fixed_grid (per-program fixed cost)
  5. exp_cellprereq onehot (placement-dot pricing)
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


def probe():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    x = jax.jit(lambda x: x + 1)(jnp.ones((8, 8)))
    x.block_until_ready()
    log("tiny jit ok")


def cells_compile_probe():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tyleri_tpu.ops.binning import (
        bin_triangles, bin_triangles_cells, compact_medium)
    from tyleri_tpu.ops.raster_cells import rasterize_visibility_cells
    from tyleri_tpu.ops.setup import setup_triangles
    from tyleri_tpu.pipeline.state import CompareOp, DepthState

    FBW, FBH = 256, 64
    rng = np.random.default_rng(0)
    T = 256
    base = rng.uniform(-0.9, 0.9, (T, 1, 2))
    ext = rng.uniform(0.02, 0.1, (T, 3, 2)) * rng.choice([-1, 1], (T, 3, 2))
    xy = np.clip(base + ext, -1, 1).astype(np.float32)
    z = rng.uniform(0.1, 0.9, (T, 1)).astype(np.float32)
    clip = np.concatenate(
        [xy, np.broadcast_to(z[:, :, None], (T, 3, 1)),
         np.ones((T, 3, 1), np.float32)], axis=2)
    su = setup_triangles(
        jnp.asarray(clip), jnp.zeros((T, 3, 2), jnp.float32),
        jnp.zeros((T,), jnp.int32), jnp.ones((T,), bool),
        jnp.asarray([0., 0., FBW, FBH, 0., 1.], jnp.float32),
        jnp.asarray([0, 0, FBW, FBH], jnp.int32),
        tile_w=16, tile_h=8, grid_w=16, grid_h=8)
    cells = bin_triangles_cells(
        su, cell_grid_w=16, cell_grid_h=8, cells_tx=8, cells_ty=2,
        entry_cap=1024, spill_cap=1 << 10)
    med_su, _, _ = compact_medium(su, None, su.valid & False, 128, 8, 2)
    medium = bin_triangles(med_su, grid_w=2, grid_h=4, entry_cap=256,
                           max_tiles_per_tri=8, broad_cap=16, spill_cap=512)
    ds = DepthState(test_enable=True, write_enable=True,
                    compare_op=CompareOp.LESS_OR_EQUAL)
    t0 = time.time()
    vis, _ = rasterize_visibility_cells(
        cells, medium, jnp.ones((FBH, FBW), jnp.float32),
        jnp.asarray([0, 0, FBW, FBH], jnp.int32),
        fb_w=FBW, fb_h=FBH, tile_w=128, tile_h=16, grid_w=2, grid_h=4,
        depth_state=ds)
    jax.block_until_ready(vis.owner)
    hits = int(jnp.sum(vis.owner >= 0))
    log(f"cells kernel compiled in {time.time() - t0:.1f}s, hits={hits}")
    assert hits > 200, hits


AB_RESULTS = {}
VARIANT_OK = {}   # combo name -> bool from the tiny-shape compile probe


def variant_compile_probe():
    """Compile every serial-kernel flag variant ONCE at tiny shapes before
    the A/B: a Mosaic lowering error that only reproduces on real TPU costs
    seconds here vs a full config5 frame compile (40-150 s) in ab_flags.
    Failing combos are skipped by run_ab (logged)."""
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
        if env.get("TYLERI_PACKED"):
            kw["packed_entries"] = True
        if env.get("TYLERI_LAG2"):
            kw["exit_lag2"] = True
        if env.get("TYLERI_WHILE"):
            kw["exit_while"] = True
        if env.get("TYLERI_DYNROLL"):
            kw["dynroll"] = True
        if env.get("TYLERI_CELLS"):
            kw["cells"] = True
        if env.get("TYLERI_TPP"):
            kw["tiles_per_prog"] = int(env["TYLERI_TPP"])
        if env.get("TYLERI_SUBLANE"):
            kw["sublane"] = True
        if env.get("TYLERI_NOEXIT"):
            kw["noexit"] = True
        return kw

    for name, env in ab_flags.COMBOS.items():
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

    # most decision-critical first (the session may be interrupted);
    # dynroll family dropped: standalone kernel timings (session r3c step
    # 4: exit 42.8 ms, dynroll 77.6, dynroll8 54.8) rule it out
    names = ["base", "sublane", "sublane+tpp4", "cells", "packed+while",
             "packed", "while", "tpp4", "packed+while+tpp4", "lag2",
             "cells+tpp4"]
    skipped = [n for n in names if VARIANT_OK.get(n) is False]
    if skipped:
        log(f"skipping combos that failed the compile probe: {skipped}")
    names = [n for n in names if VARIANT_OK.get(n) is not False]
    sys.argv = ["ab_flags", "16"] + names
    results = ab_flags.main()
    AB_RESULTS.update(results or {})
    # include each combo's env so bench.py can re-apply the winner without
    # importing tools/ (the driver runs bench.py standalone)
    out = {name: {"fps": res["fps"], "env": ab_flags.COMBOS[name]}
           for name, res in AB_RESULTS.items()}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AB_RESULTS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log(f"ab results -> {path}")


def run_winner_profile():
    """Fused-frame attribution under the winning combo (its full-frame and
    fused-setup lines honor the env flags; the per-stage prefixes use the
    base kernel and are only a layout-matched reference)."""
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


def run_dynroll():
    import exp_visibility

    sys.argv = ["exp_visibility", "exit", "dynroll", "dynroll8"]
    exp_visibility.main()


def run_exp_cells():
    import exp_cells

    sys.argv = ["exp_cells", "16"]
    exp_cells.main()


def run_fixed_grid():
    import exp_fixed_grid

    exp_fixed_grid.main()


def run_onehot():
    import exp_cellprereq

    exp_cellprereq.bench_onehot()




if __name__ == "__main__":
    step("0 probe", probe)
    step("1 variant compile probe", variant_compile_probe)
    step("2 ab_flags", run_ab)
    step("3 winner profile", run_winner_profile)
    log("SESSION COMPLETE")
