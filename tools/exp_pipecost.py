"""Isolate the visibility kernel's ~8 ms empty-workload floor (round 4).

Facts so far (tools/exp_visibility.py, exp_tilecost.py, real-table grid
68x15=1020 tiles, v5e):
  * empty segments cost 8.0-10.6 ms with ZERO entries
  * invariant to tiles_per_prog (rules out grid-step/program overhead)
  * invariant to tile_h (8/16/32 all ~8 ms -> not per-tile-pixel work)
  * invariant to output layout (row-major vs tile-contiguous blocks)
This probe strips the body to find the component:

  v_out1     write 1 constant output block, nothing else
  v_out7     write 7 constant output blocks
  v_state    + depth-init read, iotas, scissor masks, state0
  v_loop     + the 0-trip chunk fori with the full 7-array carry + DMA
             machinery (tile_start all zeros)
  v_loop1    same but a 1-trip loop per tile (tile_start = 128/tile)
  each also at tpp=4

    python tools/exp_pipecost.py [frames=16]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 128
GRID_H, GRID_W = 68, 15


def _kernel(tile_start_ref, entries_ref, *refs,
            nout, level, chunk, e_cap, tpp):
    outs, scr = refs[:nout], refs[nout:]
    gy0 = pl.program_id(0)
    gx = pl.program_id(1)
    for _ts in range(tpp):
        gy = gy0 * tpp + _ts
        if level == 0:
            for i, o in enumerate(outs):
                o[_ts, 0] = jnp.full((TILE_H, TILE_W), float(i),
                                     jnp.float32)
            continue

        t = gy * GRID_W + gx
        start = tile_start_ref[t]
        end = tile_start_ref[t + 1]
        xcb = gx * TILE_W + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1)
        xf = xcb.astype(jnp.float32) + 0.5
        yc = gy * TILE_H + jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0)
        yf = yc.astype(jnp.float32) + 0.5
        in_sc = (xcb >= 0) & (xcb < 1920) & (yc >= 0) & (yc < 1080)

        state0 = tuple(
            jnp.full((TILE_H, TILE_W), float(i), jnp.float32)
            for i in range(7)
        )
        if level == 1:
            state = state0
        else:
            ebuf, sem = scr
            nchunks = jnp.where(end > start, pl.cdiv(end - start, chunk), 0)

            def chunk_slice(k):
                return jnp.minimum(start + k * chunk, e_cap - chunk)

            def mk_dma(slot, k):
                return pltpu.make_async_copy(
                    entries_ref.at[pl.ds(chunk_slice(k), chunk), :],
                    ebuf.at[slot], sem.at[slot])

            @pl.when(nchunks > 0)
            def _():
                mk_dma(0, 0).start()

            def chunk_body(k, st):
                slot = jax.lax.rem(k, 2)
                mk_dma(slot, k).wait()

                @pl.when(k + 1 < nchunks)
                def _():
                    mk_dma(jax.lax.rem(k + 1, 2), k + 1).start()

                c0 = ebuf[slot, 0, 0]
                return tuple(
                    s + c0 * xf * (1.0 / (i + 1.0)) + yf * 0.0
                    + jnp.where(in_sc, 0.0, 1.0)
                    for i, s in enumerate(st))

            state = jax.lax.fori_loop(0, nchunks, chunk_body, state0)

        for o, s in zip(outs, state[:nout]):
            o[_ts, 0] = s


@functools.partial(jax.jit, static_argnames=(
    "nout", "level", "chunk", "tpp"))
def run(entries, tile_start, *, nout, level, chunk, tpp):
    kernel = functools.partial(
        _kernel, nout=nout, level=level, chunk=chunk,
        e_cap=entries.shape[0], tpp=tpp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID_H // tpp, GRID_W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tpp, 1, TILE_H, TILE_W),
                         lambda i, j, *_: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(nout)
        ],
        scratch_shapes=[
            pltpu.SMEM((2, 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        out_shape=[
            jax.ShapeDtypeStruct((GRID_H, GRID_W, TILE_H, TILE_W),
                                 jnp.float32)
            for _ in range(nout)
        ],
    )(tile_start, entries)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    frames = int(kv.get("frames", 16))
    grid = GRID_H * GRID_W
    e_cap = 1 << 18
    rng = np.random.default_rng(0)
    ent = jnp.asarray(rng.standard_normal((e_cap, 128), dtype=np.float32))
    ts_zero = jnp.zeros((grid + 1,), jnp.int32)
    ts_one = jnp.minimum(jnp.arange(grid + 1, dtype=jnp.int32) * 128,
                         e_cap)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, ts, **kw):
        try:
            sync(run(ent, ts, **kw))
        except Exception as e:
            print(f"  [{name}] FAIL: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        t0 = time.perf_counter()
        for _ in range(frames):
            out = run(ent, ts, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:22s} {dt * 1000:9.2f} ms", flush=True)

    timeit("v_out1", ts_zero, nout=1, level=0, chunk=128, tpp=1)
    timeit("v_out7", ts_zero, nout=7, level=0, chunk=128, tpp=1)
    timeit("v_out7_tpp4", ts_zero, nout=7, level=0, chunk=128, tpp=4)
    timeit("v_state", ts_zero, nout=7, level=1, chunk=128, tpp=1)
    timeit("v_loop0", ts_zero, nout=7, level=2, chunk=128, tpp=1)
    timeit("v_loop1", ts_one, nout=7, level=2, chunk=128, tpp=1)
    timeit("v_loop1_tpp4", ts_one, nout=7, level=2, chunk=128, tpp=4)


if __name__ == "__main__":
    main()
