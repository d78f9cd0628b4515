"""Compile-probe named kernel flag variants at tiny shapes with FULL error
text (tpu_session's probe truncates to 200 chars, which hides the Mosaic
diagnostic).  One patient TPU client; run ONLY when no other client is up.

    python tools/probe_variants.py packed noexit packed+while
"""

import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import ab_flags
    from tyleri_tpu.pipeline.state import (
        BlendState, CompareOp, DepthFormat, DepthState, PipelineState)
    from tyleri_tpu.rendering import passes
    from tyleri_tpu.utils.math3d import Rect2D, Viewport

    names = sys.argv[1:] or ["packed", "noexit"]
    log(f"devices: {jax.devices()}")

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
        if env.get("TYLERI_TPP"):
            kw["tiles_per_prog"] = int(env["TYLERI_TPP"])
        return kw

    ok = {}
    for name in names:
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
            ok[name] = covered > 50
            log(f"variant {name}: OK in {time.time() - t0:.1f}s, "
                f"covered={covered}")
        except Exception:
            ok[name] = False
            log(f"variant {name}: FAILED in {time.time() - t0:.1f}s")
            traceback.print_exc()
            sys.stdout.flush()
    log(f"summary: {ok}")


if __name__ == "__main__":
    main()
