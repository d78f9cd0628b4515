"""Micro-timing of the raster pipeline's internal pieces at config5 scale,
to direct round-2 kernel optimization.  Run on TPU:

    python tools/microbench.py [T] [frames]

Times each suspect in isolation: the binning sort, the per-entry channel
gather, the transpose twin, the expansion arithmetic, the clip-cond body,
the setup channel stack, and the vertex-stage einsum.
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
    print(f"{name:34s} {dt * 1000:9.2f} ms")
    return dt


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    E = 2 * T
    NCH = 32
    ntiles = 1020  # 1080p at 128x16 tiles
    rng = np.random.default_rng(0)

    print(f"T={T} E={E} backend={jax.default_backend()}")

    keys = jnp.asarray(rng.integers(0, ntiles + 1, E, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, T, E, dtype=np.int32))
    channels = jnp.asarray(rng.random((T, NCH), np.float32))
    entry_tri = vals

    timeit("sort (key+1 payload)",
           jax.jit(lambda k, v: jax.lax.sort((k, v), dimension=0, num_keys=1,
                                             is_stable=True)), keys, vals,
           frames=frames)
    timeit("gather channels [E,32]",
           jax.jit(lambda c, t: c[t]), channels, entry_tri, frames=frames)
    timeit("gather+mask+transpose (as binning)",
           jax.jit(lambda c, t, k: (
               lambda ec: (jnp.where((k < ntiles)[:, None], ec, 0.0),
                           jnp.transpose(jnp.where((k < ntiles)[:, None], ec, 0.0)))
           )(c[t])), channels, entry_tri, keys, frames=frames)
    timeit("transpose only [E,32]->[32,E]",
           jax.jit(lambda c: jnp.transpose(c)),
           jnp.asarray(rng.random((E, NCH), np.float32)), frames=frames)

    counts = jnp.asarray(rng.integers(0, 3, T, dtype=np.int32))

    @jax.jit
    def expansion(counts):
        tri_ids = jnp.arange(T, dtype=jnp.int32)
        entry_tri = jnp.repeat(tri_ids, counts, total_repeat_length=E)
        eidx = jnp.arange(E, dtype=jnp.int32)
        boundary = jnp.concatenate(
            [jnp.ones((1,), bool), entry_tri[1:] != entry_tri[:-1]])
        seg_start = jax.lax.cummax(jnp.where(boundary, eidx, 0))
        return entry_tri, eidx - seg_start

    timeit("expansion repeat+cummax", expansion, counts, frames=frames)

    timeit("searchsorted tile_start",
           jax.jit(lambda k: jnp.searchsorted(
               k, jnp.arange(ntiles + 1, dtype=jnp.int32), side="left")),
           jnp.sort(keys), frames=frames)

    # clip: the full do_clip body vs the mask-only fast path
    from tyleri_tpu.ops.clip import near_clip_triangles
    clip = jnp.asarray(rng.random((T, 3, 4), np.float32) + 0.1)
    uv = jnp.asarray(rng.random((T, 3, 2), np.float32))
    tex = jnp.zeros((T,), jnp.int32)
    valid = jnp.ones((T,), bool)
    timeit("near_clip (nothing crosses)",
           jax.jit(lambda c, u, t, v: near_clip_triangles(
               c, u, t, v, extra_cap=256)), clip, uv, tex, valid,
           frames=frames)

    # setup: channel stack alone vs full setup_triangles
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    vp = jnp.asarray([0, 0, 1920, 1080, 0, 1], jnp.float32)
    sc = jnp.asarray([0, 0, 1920, 1080], jnp.int32)
    timeit("setup_triangles full",
           jax.jit(lambda c, u, t, v: setup_triangles(
               c, u, t, v, vp, sc, tile_w=128, tile_h=16,
               grid_w=15, grid_h=68)), clip, uv, tex, valid, frames=frames)

    corner = jnp.asarray(rng.random((T, 3, 5), np.float32))
    draw = jnp.asarray(rng.integers(0, 16, T, dtype=np.int32))
    mvps = jnp.asarray(rng.random((16, 4, 4), np.float32))
    timeit("transform_corner_table",
           jax.jit(transform_corner_table), corner, draw, mvps, frames=frames)

    # full binning for reference
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.setup import TriangleSetup

    su = setup_triangles(clip, uv, tex, valid, vp, sc,
                         tile_w=128, tile_h=16, grid_w=15, grid_h=68)
    su = jax.block_until_ready(su)
    timeit("bin_triangles full",
           jax.jit(lambda s: bin_triangles(
               s, grid_w=15, grid_h=68, entry_cap=E,
               max_tiles_per_tri=32, broad_cap=256)), su, frames=frames)


if __name__ == "__main__":
    main()
