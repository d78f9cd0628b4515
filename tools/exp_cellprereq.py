"""Round-3 prerequisites for a cell-granularity visibility formulation.

Measures, on TPU, the pieces whose cost/feasibility decide the design:
  1. binning big-sort scaling with row count (1.2M -> 2.6M) — cell
     binning emits ~1.6-2.2x the rows of (128,16) tiles
  2. channel row-gather scaling with row count
  3. Pallas one-hot f32 dot replication: bit-exactness (the cell kernel
     selects entry rows with an MXU one-hot instead of SMEM scalar loads;
     any rounding breaks pixel parity) and throughput per round
  4. Mosaic support probes: dynamic sublane slicing of a VMEM ref,
     lax.while_loop in-kernel, per-lane-group reductions

    python tools/exp_cellprereq.py [sections...]
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


def timeit(name, fn, *args, frames=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(frames):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / frames * 1e3
    print(f"{name:52s} {dt:8.2f} ms")
    return dt


def bench_sort_gather():
    rng = np.random.default_rng(0)
    for rows in (1_228_800, 1_638_400, 2_097_152, 2_621_440):
        keys = jnp.asarray(rng.integers(0, 1 << 31, rows, dtype=np.int64)
                           .astype(np.uint32))
        vals = jnp.asarray(rng.integers(0, rows, rows).astype(np.int32))
        timeit(f"sort u32 key+i32 payload rows={rows/1e6:.2f}M",
               jax.jit(lambda k, v: jax.lax.sort(
                   (k, v), dimension=0, num_keys=1, is_stable=False)),
               keys, vals)
    table = jnp.asarray(rng.standard_normal((1_100_000, 24), np.float32))
    for rows in (1_228_800, 1_638_400, 2_097_152, 2_621_440):
        idx = jnp.asarray(rng.integers(0, table.shape[0], rows)
                          .astype(np.int32))
        timeit(f"row gather [E,24] E={rows/1e6:.2f}M",
               jax.jit(lambda t, i: t[i]), table, idx)


def _onehot_kernel(tab_ref, pos_ref, out_ref, *, rounds):
    """One chunk resident in VMEM; each round selects 16 rows (one per
    lane-group) via an MXU one-hot dot and accumulates, modelling the
    cell-walk inner loop's replication cost."""
    tab = tab_ref[:]          # [128, 128] f32 rows=entries, lanes=channels

    def body(r, acc):
        pos = pos_ref[r]      # [128] i32: row wanted per lane
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        onehot = (rows == pos[None, :]).astype(jnp.float32)
        # G[c, l] = tab[pos[l], c]  (channels in sublanes after the dot)
        g = jax.lax.dot_general(
            tab, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                      # [128ch, 128lanes]
        return acc + g[:8, :]

    out_ref[:] = jax.lax.fori_loop(
        0, rounds, body, jnp.zeros((8, 128), jnp.float32))


def bench_onehot(rounds=512):
    rng = np.random.default_rng(1)
    tab = rng.standard_normal((128, 128)).astype(np.float32)
    # adversarial values: denormals, tiny, huge, negatives
    tab[0, :] = np.float32(1e-42)
    tab[1, :] = np.float32(-1e-42)
    tab[2, :] = np.float32(3.4e38)
    tab[3, :] = np.float32(1.0 + 2**-23)
    pos = rng.integers(0, 128, (rounds, 128)).astype(np.int32)

    fn = jax.jit(functools.partial(
        pl.pallas_call,
        functools.partial(_onehot_kernel, rounds=rounds),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )())
    out = np.asarray(jax.device_get(fn(tab, pos)))
    # exactness: accumulate in f64 on host; every selected value must be
    # exact for the float sum over rounds to match bit-for-bit in f32
    ref = np.zeros((8, 128), np.float32)
    for r in range(rounds):
        ref = ref + tab[pos[r], :8].T
    exact = np.array_equal(out, ref)
    print(f"one-hot dot replication exact over {rounds} rounds: {exact}")
    if not exact:
        bad = np.abs(out - ref)
        print("  max deviation:", bad.max(), "at", np.unravel_index(
            bad.argmax(), bad.shape))
    dt = timeit(f"one-hot dot x{rounds} rounds (1 chunk)", fn, tab, pos)
    print(f"  -> {dt * 1e6 / rounds:.0f} ns/round, "
          f"{dt * 1e6 / rounds / 16:.1f} ns/selected-entry at 16/round")


def _probe_kernel(tab_ref, n_ref, out_ref):
    """Dynamic sublane slice + in-kernel while_loop + lane-group max."""
    b = n_ref[0]
    sl = tab_ref[pl.ds(pl.multiple_of(b * 16, 16), 16), :]   # dyn sublane
    x = sl[:8, :] + sl[8:, :]

    def cond(c):
        i, acc = c
        return i < n_ref[1]

    def body(c):
        i, acc = c
        return i + 1, acc + x

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0),
                                             jnp.zeros((8, 128), jnp.float32)))
    # lane-group (16 groups of 8) max via 3 masked roll steps
    g = acc
    for sh in (1, 2, 4):
        g = jnp.maximum(g, pltpu.roll(g, -sh, 1))
    out_ref[:] = g


def bench_probe():
    rng = np.random.default_rng(2)
    tab = jnp.asarray(rng.standard_normal((128, 128)).astype(np.float32))
    n = jnp.asarray([3, 5], np.int32)
    fn = jax.jit(functools.partial(
        pl.pallas_call, _probe_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )())
    out = np.asarray(jax.device_get(fn(tab, n)))
    t = np.asarray(tab)
    x = (t[48:56] + t[56:64]) * 5
    # rolled max emulation: g[l] = max over window l..l+4 strides... just
    # check the kernel compiled and ran; numeric spot check on lane 0
    print("probe kernel compiled+ran, out[0,0]:", out[0, 0],
          "expect >=", x[0, 0])


if __name__ == "__main__":
    which = sys.argv[1:] or ["probe", "onehot", "sortgather"]
    print("device:", jax.devices()[0])
    if "probe" in which:
        bench_probe()
    if "onehot" in which:
        bench_onehot()
    if "sortgather" in which:
        bench_sort_gather()
