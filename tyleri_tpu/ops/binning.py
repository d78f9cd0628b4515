"""Tile binning: expand triangles to (tile, triangle) entries, sort by tile,
and build the sorted entry table the per-tile rasterizer streams.

This is the TPU-native replacement for the reference's draw-call-level
parallelism (rayon round-robin over secondary command buffers, ref:
src/render_objects/mod.rs:5-30, forward_rendering/mod.rs:297-313): instead of
threads recording draws, the screen is a tile grid and every (tile, triangle)
overlap becomes one work item.  The expand→stable-sort→segment pattern keeps
everything static-shaped for XLA:

  1. each valid triangle whose bbox covers at most ``max_tiles_per_tri``
     tiles contributes one entry per covered tile; bigger ("broad")
     triangles go to a small dense side list that every covered tile scans —
     huge triangles are rare, and each already costs many tiles of work, so
     the side list adds negligible overhead while keeping the expansion
     static-shaped.  Draw-order ties between the two lists are resolved by
     the per-entry CH_ORDER channel in the visibility resolve.
  2. entries are stable-sorted by tile id, preserving draw order within a
     tile (Vulkan primitive order — required by LESS_OR_EQUAL + blending).
  3. per-tile segment boundaries come from searchsorted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tyleri_tpu.ops.setup import TriangleSetup


class BinnedEntries(NamedTuple):
    entry_channels: jax.Array  # f32 [NUM_CHANNELS, E_cap] sorted by tile
    entry_tile: jax.Array      # i32 [E_cap] tile id per sorted entry (ntiles = dead)
    tile_start: jax.Array      # i32 [ntiles + 1] segment offsets into entries
    num_entries: jax.Array     # i32 [] total live entries
    overflow: jax.Array        # i32 [] entries dropped (capacity exceeded)
    broad_channels: jax.Array  # f32 [NUM_CHANNELS, B_cap] huge-triangle list
    broad_tiles: jax.Array     # i32 [B_cap, 4] tile bbox (tx0, ty0, tx1, ty1)
    num_broad: jax.Array       # i32 [] live broad entries


@functools.partial(
    jax.jit,
    static_argnames=("grid_w", "grid_h", "entry_cap", "max_tiles_per_tri", "broad_cap"),
)
def bin_triangles(
    setup: TriangleSetup,
    *,
    grid_w: int,
    grid_h: int,
    entry_cap: int,
    max_tiles_per_tri: int = 32,
    broad_cap: int = 256,
) -> BinnedEntries:
    T = setup.valid.shape[0]
    ntiles = grid_w * grid_h
    K = max_tiles_per_tri

    tx0 = setup.tile_lo[:, 0]
    ty0 = setup.tile_lo[:, 1]
    tx1 = setup.tile_hi[:, 0]
    ty1 = setup.tile_hi[:, 1]
    tw = jnp.maximum(tx1 - tx0 + 1, 0)
    th = jnp.maximum(ty1 - ty0 + 1, 0)
    ncover = jnp.where(setup.valid, tw * th, 0)

    is_broad = setup.valid & (ncover > K)
    is_narrow = setup.valid & (ncover <= K) & (ncover > 0)

    counts = jnp.where(is_narrow, ncover, 0)
    offsets = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
    total = offsets[-1]
    offsets = offsets[:-1]
    overflow = jnp.maximum(total - entry_cap, 0)

    # Expansion: candidate j of triangle t covers tile
    # (tx0 + j % tw, ty0 + j // tw); scatter to slot offsets[t] + j.
    j = jnp.arange(K, dtype=jnp.int32)[None, :]            # [1, K]
    cand_live = j < counts[:, None]                        # [T, K]
    ctx = tx0[:, None] + jnp.where(tw[:, None] > 0, j % jnp.maximum(tw[:, None], 1), 0)
    cty = ty0[:, None] + jnp.where(tw[:, None] > 0, j // jnp.maximum(tw[:, None], 1), 0)
    tile_id = cty * grid_w + ctx                           # [T, K]
    slot = offsets[:, None] + j                            # [T, K]
    slot = jnp.where(cand_live, slot, entry_cap)           # dropped by mode="drop"

    flat_slot = slot.reshape(-1)
    flat_tile = tile_id.reshape(-1).astype(jnp.int32)
    flat_tri = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None], (T, K)
    ).reshape(-1)

    entry_tile = jnp.full((entry_cap,), jnp.int32(ntiles), jnp.int32)
    entry_tri = jnp.zeros((entry_cap,), jnp.int32)
    entry_live = jnp.zeros((entry_cap,), jnp.int32)
    entry_tile = entry_tile.at[flat_slot].set(flat_tile, mode="drop")
    entry_tri = entry_tri.at[flat_slot].set(flat_tri, mode="drop")
    entry_live = entry_live.at[flat_slot].set(1, mode="drop")
    # Padding slots (beyond `total`) keep tile id = ntiles and sort last.

    # Stable sort by tile id preserves draw order within each tile.
    entry_tile, entry_tri, entry_live = jax.lax.sort(
        (entry_tile, entry_tri, entry_live), dimension=0, num_keys=1, is_stable=True
    )

    tile_start = jnp.searchsorted(
        entry_tile, jnp.arange(ntiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # Gather the per-entry channel table in sorted order (channel-major so the
    # raster kernel reads [NUM_CHANNELS, chunk] blocks with 128-lane last dim).
    entry_channels = setup.channels[:, entry_tri]
    entry_channels = jnp.where(entry_live[None, :] > 0, entry_channels, 0.0)

    # Broad (huge) triangles: dense side list, every covered tile scans it.
    num_broad = jnp.sum(is_broad.astype(jnp.int32))
    broad_rank = jnp.cumsum(is_broad.astype(jnp.int32)) - 1
    broad_slot = jnp.where(is_broad, broad_rank, broad_cap)
    broad_src = jnp.full((broad_cap,), 0, jnp.int32)
    broad_live = jnp.zeros((broad_cap,), jnp.int32)
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    broad_src = broad_src.at[broad_slot].set(tri_ids, mode="drop")
    broad_live = broad_live.at[broad_slot].set(1, mode="drop")
    broad_channels = setup.channels[:, broad_src]
    broad_channels = jnp.where(broad_live[None, :] > 0, broad_channels, 0.0)
    bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=1)
    broad_tiles = jnp.where(
        broad_live[:, None] > 0,
        bbox[broad_src],
        jnp.array([[1, 1, 0, 0]], jnp.int32),  # empty bbox for dead slots
    )
    overflow = overflow + jnp.maximum(num_broad - broad_cap, 0)

    return BinnedEntries(
        entry_channels=entry_channels,
        entry_tile=entry_tile,
        tile_start=tile_start,
        num_entries=jnp.minimum(total, entry_cap).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        broad_channels=broad_channels,
        broad_tiles=broad_tiles,
        num_broad=jnp.minimum(num_broad, broad_cap).astype(jnp.int32),
    )
