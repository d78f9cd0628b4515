"""Decompose the visibility kernel's ~11 ms empty-segment fixed cost (TPU).

tools/exp_visibility.py measured `empty` (all segments empty) at ~10.8 ms
REGARDLESS of tile size (th16/32/64) — so the cost is not per-grid-step
scaffolding.  Candidates, each isolated here:

  pad        jnp.pad [E,24] -> [E,128] (604 MB of HBM writes at E=1.18M),
             executed INSIDE the timed jit every frame in the standalone
             harness (the fused frame fuses it into the binning gather)
  empty_full the exp_visibility `empty` case verbatim (pad + kernel)
  empty_tiny same kernel, entry table truncated to 128 rows (pad ~free):
             whatever remains is true kernel scaffolding cost
  outs1      empty_tiny with a single output tensor instead of 7: isolates
             per-grid-step output-DMA cost

    python tools/exp_fixedcost.py
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

from tyleri_tpu.ops import setup as S

FB_W, FB_H = 1920, 1080
TILE_W, TILE_H = 128, 16
GRID_W = -(-FB_W // TILE_W)
GRID_H = -(-FB_H // TILE_H)
CHUNK = 128


def _kernel(tile_start_ref, entries_ref, depth_init_ref, *rest, n_out):
    outs, (ebuf, sem) = rest[:n_out], rest[n_out:]
    gy = pl.program_id(0)
    gx = pl.program_id(1)
    t = gy * GRID_W + gx
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]

    state = [depth_init_ref[:]] + [
        jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(n_out - 1)
    ]

    base = start - jax.lax.rem(start, CHUNK)
    nchunks = jnp.where(end > start, pl.cdiv(end - base, CHUNK), 0)

    def chunk_body(k, carry):
        slot = jax.lax.rem(k, 2)
        pltpu.make_async_copy(
            entries_ref.at[pl.ds(pl.multiple_of(base, CHUNK), CHUNK), :],
            ebuf.at[slot], sem.at[slot],
        ).start()
        pltpu.make_async_copy(
            entries_ref.at[pl.ds(pl.multiple_of(base, CHUNK), CHUNK), :],
            ebuf.at[slot], sem.at[slot],
        ).wait()
        return [c + ebuf[slot, 0, 0] for c in carry]

    state = jax.lax.fori_loop(0, nchunks, chunk_body, state)
    for i in range(n_out):
        outs[i][...] = state[i]


@functools.partial(jax.jit, static_argnames=("n_out", "do_pad"))
def run(table, tile_start, depth0, *, n_out, do_pad):
    if do_pad:
        table = jnp.pad(table, ((0, 0), (0, 128 - table.shape[1])))
    pad_h, pad_w = GRID_H * TILE_H, GRID_W * TILE_W
    depth0 = jnp.pad(depth0, ((0, pad_h - FB_H), (0, pad_w - FB_W)))
    kernel = functools.partial(_kernel, n_out=n_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(GRID_H, GRID_W),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        scratch_shapes=[
            pltpu.SMEM((2, CHUNK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32)
                   for _ in range(n_out)],
    )(tile_start, table, depth0)
    return outs


@jax.jit
def pad_only(table):
    return jnp.pad(table, ((0, 0), (0, 128 - table.shape[1])))


def main():
    frames = int(os.environ.get("FRAMES", "8"))
    print("device:", jax.devices()[0].device_kind, flush=True)
    E = 1_179_648  # 1.18M, matches sponza entry_cap scale
    key = jax.random.PRNGKey(0)
    table_narrow = jax.random.uniform(key, (E, S.NUM_CHANNELS), jnp.float32)
    table_tiny = table_narrow[:CHUNK]
    depth0 = jnp.ones((FB_H, FB_W), jnp.float32)
    nt = GRID_W * GRID_H
    ts_empty = jnp.zeros((nt + 1,), jnp.int32)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *args, **kw):
        sync(fn(*args, **kw))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:28s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    timeit("pad_only", pad_only, table_narrow)
    timeit("empty_full", run, table_narrow, ts_empty, depth0,
           n_out=7, do_pad=True)
    timeit("empty_nopad", run, jnp.pad(
        table_narrow, ((0, 0), (0, 128 - S.NUM_CHANNELS))), ts_empty, depth0,
        n_out=7, do_pad=False)
    timeit("empty_tiny", run, table_tiny, ts_empty, depth0,
           n_out=7, do_pad=True)
    timeit("outs1_tiny", run, table_tiny, ts_empty, depth0,
           n_out=1, do_pad=True)
    timeit("outs3_tiny", run, table_tiny, ts_empty, depth0,
           n_out=3, do_pad=True)


if __name__ == "__main__":
    main()


def probe_launch():
    """Separate per-launch vs per-grid-step vs per-pixel cost."""
    import jax
    import jax.numpy as jnp

    def mk(grid_h, grid_w, tile_h, tile_w):
        def k(o_ref):
            o_ref[...] = jnp.full((tile_h, tile_w), 1.0, jnp.float32)

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k,
                grid=(grid_h, grid_w),
                out_specs=pl.BlockSpec((tile_h, tile_w),
                                       lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct(
                    (grid_h * tile_h, grid_w * tile_w), jnp.float32),
            )() + x
        return f

    frames = int(os.environ.get("FRAMES", "16"))

    def timeit(name, fn, *args):
        import numpy as np
        np.asarray(jax.device_get(fn(*args).ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        np.asarray(jax.device_get(out.ravel()[:1]))
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:28s} {dt * 1000:9.3f} ms", flush=True)

    x = jnp.zeros((), jnp.float32)
    timeit("launch_1x1_8x128", mk(1, 1, 8, 128), x)      # 1 step, 4 KB
    timeit("launch_68x15_16x128", mk(68, 15, 16, 128), x)  # 1020 steps, full px
    timeit("launch_17x15_64x128", mk(17, 15, 64, 128), x)  # 255 steps, full px
    timeit("launch_1020x1_8x128", mk(1020, 1, 8, 128), x)  # 1020 steps, tiny px
    timeit("launch_68x15_8x128", mk(68, 15, 8, 128), x)   # 1020 steps, half px


if __name__ == "__main__" and os.environ.get("PROBE"):
    probe_launch()


def gather_variants():
    """Price the binning gather's output-pad: row gather to [E,24] vs the
    lane-padded [E,128] the kernel consumes vs a 5-entries-per-row packed
    [E/5,128] built from 5 interleaved gathers (all lanes live, no pad)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    E = 1_179_648
    T = 1_114_112
    key = jax.random.PRNGKey(1)
    table = jax.random.uniform(key, (T, S.NUM_CHANNELS), jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (E,), 0, T, jnp.int32)

    @jax.jit
    def g_narrow(t, i):
        return t[i]

    @jax.jit
    def g_pad(t, i):
        return jnp.pad(t[i], ((0, 0), (0, 128 - S.NUM_CHANNELS)))

    @jax.jit
    def g_packed5(t, i):
        cols = [t[i[u::5]] for u in range(5)]
        out = jnp.concatenate(cols, axis=1)          # [E/5, 120]
        return jnp.pad(out, ((0, 0), (0, 8)))        # [E/5, 128]

    frames = int(os.environ.get("FRAMES", "8"))

    def timeit(name, fn, *args):
        np.asarray(jax.device_get(fn(*args).ravel()[:1]))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        np.asarray(jax.device_get(out.ravel()[:1]))
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:28s} {dt * 1000:9.3f} ms", flush=True)

    timeit("gather_narrow[E,24]", g_narrow, table, ids)
    timeit("gather_pad[E,128]", g_pad, table, ids)
    timeit("gather_packed5[E/5,128]", g_packed5, table, ids)
