"""Round-3: decompose the visibility kernel's per-TILE fixed cost.

The empty-segment ablation (exp_visibility empty) measured ~10.8 ms for a
1020-program grid doing no entry work — ~10 us per program.  If that is
per-PROGRAM overhead (Mosaic prologue, scalar setup, output pipeline)
rather than per-PIXEL work, merging several tiles into one program divides
it.  This tool times a stripped kernel (init + 7 outputs, no entries) at
1/2/4/8 tiles per program, plus variants isolating the output count and
the init DMA.

    python tools/exp_fixed_grid.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FB_W, FB_H = 1920, 1080
TILE_W = 128


def _kernel(depth_ref, *out_refs, nouts, zmax_reduce):
    z = depth_ref[:]
    if zmax_reduce:
        m = jnp.max(z)  # the per-tile vector->scalar threshold seed
        z = z + jnp.where(m > 2.0, 1.0, 0.0)
    for i, o in enumerate(out_refs):
        if o.dtype == jnp.int32:
            o[:] = jnp.full(o.shape, -1, jnp.int32)
        else:
            o[:] = z if i == 0 else jnp.zeros(o.shape, jnp.float32)


def build(rows_per_prog, nouts=7, zmax_reduce=True):
    grid_h = -(-FB_H // rows_per_prog)
    grid_w = -(-FB_W // TILE_W)
    pad_h, pad_w = grid_h * rows_per_prog, grid_w * TILE_W

    kernel = functools.partial(_kernel, nouts=nouts, zmax_reduce=zmax_reduce)
    outs = [jax.ShapeDtypeStruct((pad_h, pad_w),
                                 jnp.int32 if i in (1, 6) else jnp.float32)
            for i in range(nouts)]

    @jax.jit
    def run(depth):
        depth = jnp.pad(depth, ((0, pad_h - FB_H), (0, pad_w - FB_W)))
        return pl.pallas_call(
            kernel,
            grid=(grid_h, grid_w),
            in_specs=[pl.BlockSpec((rows_per_prog, TILE_W),
                                   lambda i, j: (i, j))],
            out_specs=[pl.BlockSpec((rows_per_prog, TILE_W),
                                    lambda i, j: (i, j))] * nouts,
            out_shape=outs,
        )(depth)

    return run


def timeit(name, fn, *args, frames=32):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / frames * 1e3
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    print("device:", jax.devices()[0], flush=True)
    depth = jnp.ones((FB_H, FB_W), jnp.float32)
    for rows in (16, 32, 64, 128):
        timeit(f"fixed kernel rows/prog={rows:3d} (7 outs, zmax)",
               build(rows), depth)
    timeit("fixed kernel rows/prog= 16, 3 outs", build(16, nouts=3), depth)
    timeit("fixed kernel rows/prog= 16, 7 outs no-zmax",
           build(16, zmax_reduce=False), depth)
    timeit("fixed kernel rows/prog= 16, 1 out", build(16, nouts=1), depth)


if __name__ == "__main__":
    main()
