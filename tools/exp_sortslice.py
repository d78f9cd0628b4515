"""Probe the big-sort + slice + gather cost structure in isolation (TPU).

exp_spill showed a 34 ms cliff between (rows == entry_cap, no slice) and
(rows > entry_cap, sliced).  This times each suspect alone:
  sort at both row counts, with/without slice, gather at entry_cap rows
with a fused sum consumer mimicking the prefix jit.

    python tools/exp_sortslice.py
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


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    E_CAP = 1245184
    ROWS = 1376512
    T = 1114368
    key = np.random.default_rng(0).integers(
        0, 1 << 26, size=ROWS, dtype=np.uint32)
    tri = np.random.default_rng(1).integers(0, T, size=ROWS, dtype=np.int32)
    channels = np.random.default_rng(2).random((T, 24), np.float32)
    dkey = jax.device_put(jnp.asarray(key))
    dtri = jax.device_put(jnp.asarray(tri))
    dch = jax.device_put(jnp.asarray(channels))

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, *args):
        sync(fn(*args)); t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:34s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    def sort_only(k, t, n):
        k2, t2 = jax.lax.sort((k[:n], t[:n]), dimension=0, num_keys=1,
                              is_stable=False)
        return jnp.sum(k2), jnp.sum(t2)

    def sort_slice(k, t, n, cap):
        k2, t2 = jax.lax.sort((k[:n], t[:n]), dimension=0, num_keys=1,
                              is_stable=False)
        return jnp.sum(k2[:cap]), jnp.sum(t2[:cap])

    def sort_gather(k, t, ch, n, cap):
        k2, t2 = jax.lax.sort((k[:n], t[:n]), dimension=0, num_keys=1,
                              is_stable=False)
        ec = ch[t2[:cap]]
        return jnp.sum(ec), jnp.sum(k2[:cap])

    for n in (E_CAP, ROWS):
        timeit(f"sort {n}", jax.jit(functools.partial(sort_only, n=n)),
               dkey, dtri)
    timeit(f"sort {ROWS} + slice {E_CAP}",
           jax.jit(functools.partial(sort_slice, n=ROWS, cap=E_CAP)),
           dkey, dtri)
    for n in (E_CAP, ROWS):
        timeit(f"sort {n} + gather {E_CAP}",
               jax.jit(functools.partial(sort_gather, n=n, cap=E_CAP)),
               dkey, dtri, dch)
    # gather alone (unsorted indices -> worst-case; sorted -> best)
    def gather_only(t, ch, cap):
        return (jnp.sum(ch[t[:cap]]),)
    timeit(f"gather {E_CAP} random", jax.jit(
        functools.partial(gather_only, cap=E_CAP)), dtri, dch)
    dsorted = jax.device_put(jnp.sort(dtri)[:E_CAP])
    timeit(f"gather {E_CAP} sorted-idx", jax.jit(
        functools.partial(gather_only, cap=E_CAP)), dsorted, dch)


if __name__ == "__main__":
    main()
