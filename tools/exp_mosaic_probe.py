"""Probe Mosaic capabilities needed by the fused setup kernel:
1. in-kernel rank-2 transpose [24, B] -> [B, 24]
2. output block with lane dim = full 24-wide minor dim
3. cost of the transpose at scale (N=1M rows)

    python tools/exp_mosaic_probe.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def transpose_kernel(x_ref, o_ref):
    # x block [24, B]; o block [B, 24]
    o_ref[...] = jnp.transpose(x_ref[...], (1, 0))


def run_transpose(N=1 << 20, B=1024):
    x = jnp.arange(24 * N, dtype=jnp.float32).reshape(24, N) % 1000
    f = pl.pallas_call(
        transpose_kernel,
        grid=(N // B,),
        in_specs=[pl.BlockSpec((24, B), lambda i: (0, i))],
        out_specs=pl.BlockSpec((B, 24), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 24), jnp.float32),
    )
    f = jax.jit(f)
    out = f(x)
    np.testing.assert_array_equal(np.asarray(out[:2048]),
                                  np.asarray(x[:, :2048]).T)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(16):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 16
    print(f"in-kernel [24,{B}]->[{B},24] transpose over N={N}: {dt*1000:.2f} ms")


def compute_kernel(x_ref, o_ref):
    # x block [16, 8, 128] field-major; compute 24 values on [8,128] then
    # emit row-major [1024, 24] via stack + transpose
    vals = []
    for c in range(24):
        a = x_ref[c % 16]          # [8, 128]
        vals.append(a * 2.0 + c)
    stacked = jnp.stack(vals, axis=0)          # [24, 8, 128]
    flat = stacked.reshape(24, 8 * 128)        # tiling-friendly? probe it
    o_ref[...] = jnp.transpose(flat, (1, 0))


def run_compute(N=1 << 20):
    B = 1024
    x = jnp.ones((16, N // 128, 128), jnp.float32)
    f = pl.pallas_call(
        compute_kernel,
        grid=(N // B,),
        in_specs=[pl.BlockSpec((16, 8, 128), lambda i: (0, i, 0))],
        out_specs=pl.BlockSpec((B, 24), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 24), jnp.float32),
    )
    f = jax.jit(f)
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(16):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 16
    print(f"field-major compute + [24,1024] transpose emit: {dt*1000:.2f} ms")
    assert float(out[5, 3]) == 1.0 * 2.0 + 3


if __name__ == "__main__":
    for name, fn in (("transpose", run_transpose), ("compute", run_compute)):
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}")
