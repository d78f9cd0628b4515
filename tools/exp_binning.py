"""Experiments for the round-2 binning restructure (run on TPU):

(a) expansion: jnp.repeat (gather-bound) vs merge searchsorted
(b) vertex transform: batched einsum vs broadcast-elementwise
(c) per-entry row-DMA Pallas gather kernel: ns/entry streaming [1, 32]
    rows from a [T, 32] HBM table indexed by a sorted id list
"""

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


def timeit(name, fn, *args, frames=8):
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(frames):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / frames
    print(f"{name:40s} {dt * 1000:9.2f} ms")
    return dt


T = 1 << 20
E = T + (T >> 2)  # 1.25x occupancy
NCH = 32
rng = np.random.default_rng(0)
print(f"T={T} E={E} backend={jax.default_backend()}")

counts = jnp.asarray(rng.integers(0, 3, T, dtype=np.int32))


@jax.jit
def exp_repeat(counts):
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    return jnp.repeat(tri_ids, counts, total_repeat_length=E)


@jax.jit
def exp_merge(counts):
    cum = jnp.cumsum(counts)
    return jnp.searchsorted(
        cum, jnp.arange(E, dtype=jnp.int32), side="right", method="sort"
    ).astype(jnp.int32)


timeit("expansion: jnp.repeat", exp_repeat, counts)
timeit("expansion: merge searchsorted", exp_merge, counts)
a = np.asarray(exp_repeat(counts))
b = np.asarray(exp_merge(counts))
total = int(np.asarray(jnp.sum(counts)))
n = min(total, E)
print("agree:", (a[:n] == b[:n]).all(), "(live prefix)")

# (b) transform
corner = jnp.asarray(rng.random((T, 3, 5), np.float32))
draw = jnp.asarray(rng.integers(0, 16, T, dtype=np.int32))
mvps = jnp.asarray(rng.random((16, 4, 4), np.float32))

from tyleri_tpu.ops.setup import transform_corner_table

timeit("transform: current (einsum)", jax.jit(transform_corner_table),
       corner, draw, mvps)


@jax.jit
def transform_elem(corner, draw, mvps):
    D = mvps.shape[0]
    corner_pos = corner[..., :3]
    onehot = (draw[:, None] == jnp.arange(D, dtype=jnp.int32)[None, :]).astype(
        jnp.float32)
    tri_mvp = jnp.dot(onehot, mvps.reshape(D, 16),
                      precision=jax.lax.Precision.HIGHEST).reshape(T, 4, 4)
    h = jnp.concatenate(
        [corner_pos, jnp.ones(corner_pos.shape[:-1] + (1,), jnp.float32)],
        axis=-1)
    # clip[t,k,i] = sum_j mvp[t,i,j] h[t,k,j] as broadcast-mul + reduce
    clip = jnp.sum(tri_mvp[:, None, :, :] * h[:, :, None, :], axis=-1)
    return clip, corner[..., 3:5]


timeit("transform: broadcast elementwise", transform_elem, corner, draw, mvps)

# (c) per-entry row-DMA gather kernel
ids_np = np.sort(rng.integers(0, T, E).astype(np.int32))
ids = jnp.asarray(ids_np)
table = jnp.asarray(rng.random((T, NCH), np.float32))

CHUNK = 1024
RING = int(__import__("os").environ.get("RING", 8))


def gather_kernel(ids_ref, table_ref, out_ref, idbuf, ring, sem_id, sem_row):
    """ids [nchunks, 8, 128] i32; table [T/8, 8, 32] f32 — dynamic size-1
    slices are only legal on LEADING UNTILED dims, hence the 3D shapes."""
    k = pl.program_id(0)
    cp = pltpu.make_async_copy(ids_ref.at[pl.ds(k, 1)], idbuf, sem_id)
    cp.start()
    cp.wait()

    def row_dma(j, slot):
        tri = idbuf[0, (j // 128) % 8, j % 128]
        # table packed [T/32, 8, 128]: block = 32 consecutive triangles
        # (sublane s holds tris 4s..4s+3, 32 lanes of channels each) —
        # lane dim must be a full 128 for HBM->SMEM DMA
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(tri // 32, 1)],
            ring.at[slot],
            sem_row.at[slot],
        )

    # prime the ring
    for r in range(RING):
        row_dma(r, r).start()

    acc0 = jnp.zeros((8, 128), jnp.float32)

    def body(j, acc):
        slot = jax.lax.rem(j, RING)
        row_dma(j, slot).wait()
        tri = idbuf[0, (j // 128) % 8, j % 128]
        v = ring[slot, 0, (tri % 32) // 4, (tri % 4) * 32]  # touch (scalar)
        nxt = j + RING

        @pl.when(nxt < CHUNK)
        def _():
            row_dma(nxt, slot).start()

        return acc + v

    acc = jax.lax.fori_loop(0, CHUNK, body, acc0)
    out_ref[:] = acc


@jax.jit
def run_gather(ids, table):
    return pl.pallas_call(
        gather_kernel,
        grid=(E // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1, 8, 128), jnp.int32),
            pltpu.SMEM((RING, 1, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((RING,)),
        ],
    )(ids.reshape(E // CHUNK, 8, 128), table.reshape(T // 32, 8, 128))


dt = timeit("pallas per-entry row DMA stream", run_gather, ids, table)
print(f"  -> {dt / E * 1e9:.1f} ns/entry")


# ---- spill expansion variants (dense-first-tile binning, round 2) ----
def spill_variants():
    Ts = 1114112
    S = 327680
    r2 = np.random.default_rng(1)
    # ~13% of triangles have 1-3 extra tiles (sponza-at-32-row-tiles shape)
    extra = np.where(r2.random(Ts) < 0.13, r2.integers(1, 4, Ts), 0)
    cnt = jnp.asarray(extra.astype(np.int32))

    @jax.jit
    def v_repeat(cnt):
        tri_ids = jnp.arange(Ts, dtype=jnp.int32)
        return jnp.repeat(tri_ids, cnt, total_repeat_length=S)

    @jax.jit
    def v_ss_sort(cnt):
        cum = jnp.cumsum(cnt)
        return jnp.searchsorted(
            cum, jnp.arange(S, dtype=jnp.int32), side="right", method="sort"
        ).astype(jnp.int32)

    @jax.jit
    def v_ss_default(cnt):
        cum = jnp.cumsum(cnt)
        return jnp.searchsorted(
            cum, jnp.arange(S, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)

    a = np.asarray(v_repeat(cnt))
    b = np.asarray(v_ss_sort(cnt))
    c = np.asarray(v_ss_default(cnt))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
    timeit("spill repeat", v_repeat, cnt)
    timeit("spill searchsorted(sort)", v_ss_sort, cnt)
    timeit("spill searchsorted(default)", v_ss_default, cnt)


if __name__ == "__main__" and "spill" in sys.argv:
    spill_variants()
