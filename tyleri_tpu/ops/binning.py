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
  2. entries are sorted by (tile id, conservative triangle z-min in D16
     quanta — CH_ZMIN) as one packed u32 key when the bit budget allows.
     The visibility resolve is an associative per-pixel lexicographic min
     over (quantized z, CH_ORDER draw order), so any in-tile processing
     order is exact; FRONT-TO-BACK order lets the rasterizer stop a tile's
     stream as soon as every pixel's depth is below the next entry's z-min
     bound (measured ~60% of sponza-1M entries are skippable that way).
     Draw-order depth ties are arbitrated per entry by the CH_ORDER channel
     in both backends.
  3. per-tile segment boundaries come from searchsorted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tyleri_tpu.ops import setup as S
from tyleri_tpu.ops.setup import TriangleSetup


class BinnedEntries(NamedTuple):
    entry_channels: jax.Array  # f32 [E_cap, NUM_CHANNELS] sorted by tile
                               # (row-major is the ONLY layout: a
                               # channel-major twin makes XLA's layout
                               # assignment fuse the transpose INTO the
                               # gather — strided row writes, measured 3.5x
                               # slower than the row gather + the Pallas
                               # kernel's leading-dim chunk DMA)
    entry_tile: jax.Array      # i32 [E_cap] tile id per sorted entry (ntiles = dead)
    tile_start: jax.Array      # i32 [ntiles + 1] segment offsets into entries
    num_entries: jax.Array     # i32 [] total live entries
    overflow: jax.Array        # i32 [] entries dropped (capacity exceeded)
    broad_channels: jax.Array  # f32 [B_cap, NUM_CHANNELS] huge-triangle list
    broad_channels_cm: jax.Array  # f32 [NUM_CHANNELS, B_cap] kernel layout
    broad_tiles: jax.Array     # i32 [B_cap, 4] tile bbox (tx0, ty0, tx1, ty1)
    num_broad: jax.Array       # i32 [] live broad entries
    # optional extra per-entry attribute rows (lit path: world-normal/w
    # interpolation planes) gathered with the same permutations
    entry_extra: jax.Array = None     # f32 [E_cap, K]
    broad_extra: jax.Array = None     # f32 [B_cap, K]


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_w", "grid_h", "entry_cap", "max_tiles_per_tri", "broad_cap",
        "spill_cap",
    ),
)
def bin_triangles(
    setup: TriangleSetup,
    extra=None,   # f32 [T, K] optional per-triangle rows to gather alongside
    *,
    grid_w: int,
    grid_h: int,
    entry_cap: int,
    max_tiles_per_tri: int = 32,
    broad_cap: int = 256,
    spill_cap: int = 1 << 16,
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

    dense_live = jnp.sum(is_narrow.astype(jnp.int32))

    # Expansion: dense first tile + spill repeat for the remainder.  On
    # 16-row tiles ~90% of small-triangle entries are a triangle's FIRST
    # covered tile (measured ~1.1 tiles/tri at sponza scale), so that slot
    # is dense — one slot per setup row, tile id computed elementwise, no
    # expansion gather at all.  Only the (ncover - 1) remainder rides the
    # repeat + rank-arithmetic path, bounded by the occupancy-grown
    # ``spill_cap`` (overflow is reported, never dropped silently).
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    zmin_q = setup.channels[:, S.CH_ZMIN].astype(jnp.int32)  # 0..65535 exact
    dense_tile = jnp.where(is_narrow, ty0 * grid_w + tx0, jnp.int32(ntiles))

    counts = jnp.where(is_narrow, ncover - 1, 0)
    total_spill = jnp.sum(counts)
    # Live entries actually placed (post spill truncation); the two overflow
    # terms are disjoint: spill-cap drops, then entry-cap drops of the rest.
    live_placed = dense_live + jnp.minimum(total_spill, spill_cap)
    overflow = (
        jnp.maximum(total_spill - spill_cap, 0)
        + jnp.maximum(live_placed - entry_cap, 0)
    )
    spill_tri = jnp.repeat(
        tri_ids, counts, total_repeat_length=spill_cap
    ).astype(jnp.int32)
    sidx = jnp.arange(spill_cap, dtype=jnp.int32)
    spill_live = sidx < jnp.minimum(total_spill, spill_cap)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), spill_tri[1:] != spill_tri[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
    rank = sidx - seg_start
    bbox_tbl = jnp.concatenate(
        [tx0[:, None], ty0[:, None], jnp.maximum(tw, 1)[:, None],
         zmin_q[:, None]], axis=1
    ).astype(jnp.int32)                       # [T, 4]
    ebox = bbox_tbl[spill_tri]                # ONE small row gather [spill, 4]
    twr = ebox[:, 2]
    cidx = rank + 1                           # cover index 1.. (0 is dense)
    ctx = ebox[:, 0] + cidx % twr
    cty = ebox[:, 1] + cidx // twr
    spill_tile = jnp.where(
        spill_live, cty * grid_w + ctx, jnp.int32(ntiles)
    ).astype(jnp.int32)
    spill_zmin = ebox[:, 3]

    rows = T + spill_cap
    pad = max(entry_cap - rows, 0)
    all_tile = jnp.concatenate([dense_tile, spill_tile])
    all_zmin = jnp.concatenate([zmin_q, spill_zmin])
    all_tri = jnp.concatenate([tri_ids, spill_tri])
    if pad:
        all_tile = jnp.concatenate(
            [all_tile, jnp.full((pad,), ntiles, jnp.int32)]
        )
        all_zmin = jnp.concatenate([all_zmin, jnp.zeros((pad,), jnp.int32)])
        all_tri = jnp.concatenate([all_tri, jnp.zeros((pad,), jnp.int32)])

    # Sort by (tile id, conservative z-min): within a tile the rasterizer
    # streams entries FRONT TO BACK, which powers its early exit — once
    # every pixel's depth beats the next entry's z-min bound the rest of the
    # segment cannot contribute (ops/raster_pallas.py).  The per-pixel
    # resolve is an associative lexicographic (z, order) min, so any in-tile
    # order — including the unstable sort's arbitrary order among equal
    # (tile, zmin) keys — produces identical pixels; CH_ORDER arbitrates
    # draw-order ties exactly.  Dead entries carry the ntiles sentinel and
    # sort last, so slicing the first entry_cap sorted rows keeps every live
    # entry (any truncation is counted in ``overflow`` above).
    tile_bits = int(ntiles).bit_length()
    if tile_bits + 16 <= 32:
        key = (
            all_tile.astype(jnp.uint32) << 16
        ) | jnp.clip(all_zmin, 0, 65535).astype(jnp.uint32)
        key, entry_tri = jax.lax.sort(
            (key, all_tri), dimension=0, num_keys=1, is_stable=False
        )
        entry_tile = (key[:entry_cap] >> 16).astype(jnp.int32)
    else:  # huge tile grids: fall back to a two-key sort
        entry_tile, _, entry_tri = jax.lax.sort(
            (all_tile, all_zmin, all_tri),
            dimension=0, num_keys=2, is_stable=False,
        )
        entry_tile = entry_tile[:entry_cap]
    entry_tri = entry_tri[:entry_cap]

    tile_start = jnp.searchsorted(
        entry_tile, jnp.arange(ntiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    # Gather the per-entry channel table in sorted order (entry-major rows:
    # one contiguous row gather per entry).  Dead/padding rows are NOT
    # zeroed: every consumer masks by liveness (the Pallas kernel by the
    # [start, end) window, the XLA path by its tile lists), and the masking
    # pass would cost a full extra read+write of the table.
    entry_channels = setup.channels[entry_tri]
    entry_extra = extra[entry_tri] if extra is not None else None

    # Broad (huge) triangles: dense side list, every covered tile scans it.
    # Compacted by inverse lookup (searchsorted over B queries) — a [T]
    # scatter would cost per-source-row latency at millions of triangles.
    num_broad = jnp.sum(is_broad.astype(jnp.int32))
    bcum = jnp.cumsum(is_broad.astype(jnp.int32))
    broad_src = jnp.searchsorted(
        bcum, jnp.arange(1, broad_cap + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    broad_live = (broad_src < T).astype(jnp.int32)
    broad_src = jnp.clip(broad_src, 0, T - 1)
    # dead rows carry garbage channels; consumers mask by the bbox test
    # against the empty-bbox sentinel below
    broad_channels = setup.channels[broad_src]
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
        num_entries=jnp.minimum(live_placed, entry_cap).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        broad_channels=broad_channels,
        broad_channels_cm=jnp.transpose(broad_channels),
        broad_tiles=broad_tiles,
        num_broad=jnp.minimum(num_broad, broad_cap).astype(jnp.int32),
        entry_extra=entry_extra,
        broad_extra=extra[broad_src] if extra is not None else None,
    )
