"""Sublane-batched Pallas visibility kernel: entries in SUBLANES, tile
pixels in LANES — the serial kernel's tiles and binning with the cells
kernel's coefficient access.

The serial kernel (ops/raster_pallas.py) resolves one entry at a time
against the whole (tile_h, 128) tile and pays ~23 SMEM scalar loads per
entry — measured ~70% of its runtime at sponza-1M density.  The cells
formulation (ops/raster_cells.py) removed the scalar loads but had to
re-bin at cell granularity (1.7x entries, a bigger two-key sort) and
place winners through 6-pass HIGHEST MXU dots.  This kernel takes the
middle path, changing ONLY the in-kernel schedule:

* identical inputs to the serial kernel — the (tile, zmin)-sorted
  [E, 128] row-major entry table, tile_start segments, SMEM broad list —
  so binning, capacities, and occupancy feedback are untouched
* a chunk of 128 entries is DMA'd to VMEM and processed with entries
  along SUBLANES and the tile row's 128 pixels along LANES: plane
  coefficients are [128, 1] lane slices (zero scalar loads), evaluated
  against one [1, 128] pixel-row at a time over the tile's rows
* the per-pixel winner inside a chunk is found by three sublane
  reductions — min quantized z, then best CH_ORDER among z-ties, then
  best stream index among (z, order)-ties — the exact lexicographic
  resolve of the sequential semantics (LESS_OR_EQUAL keeps the latest,
  LESS the earliest; ops/visibility.py::_resolve_chunk is the spec)
* the winner's shading attributes are extracted through a one-hot mask
  with an i32 BIT-PATTERN max (jnp.where(onehot, bitcast(v), INT32_MIN)
  reduced over sublanes): with at most one selected sublane per pixel
  the reduction returns the winner's exact f32 bits — no MXU, no
  precision cases, NaN/denormal-safe by construction
* the front-to-back early exit is the serial kernel's: entries arrive
  sorted ascending by the conservative CH_ZMIN bound, a per-tile
  threshold = max(zbuf) gates each chunk (the gate scalar is staged to
  SMEM alongside the VMEM chunk DMA, as in the serial kernel's dynroll
  variant), and a dead chunk runs zero vector iterations via a
  dynamic-trip fori_loop

Depth semantics: LESS / LESS_OR_EQUAL with depth test+write (the
reference pipelines' configuration, ref:
src/pipeline/common_pipeline.rs:107-116); D16 and D32 both supported.
Broad (huge-triangle) entries reuse the serial kernel's SMEM scalar
sweep — they are rare, and any stream order is exact under the
associative resolve.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tyleri_tpu.ops import setup as S
from tyleri_tpu.ops.binning import BinnedEntries
from tyleri_tpu.ops.raster_pallas import _check_broad_smem
from tyleri_tpu.ops.visibility import VisibilityBuffer
from tyleri_tpu.pipeline.state import CompareOp, DepthFormat, DepthState

INT_MIN = -(1 << 31)  # python int: a module-level jnp scalar would be
                      # captured as a traced constant by the kernel


def _bitmax(onehot, val_f32):
    """Winner extraction: reduce a one-hot sublane selection to [1, W].

    i32 bit-pattern max over {winner's bits} ∪ {INT32_MIN identity}: with
    at most one selected sublane the result is the winner's exact bits
    (if the winner's value is -0.0 — bits == INT32_MIN — the max is still
    those bits).  Works for any f32 payload including NaN/inf.
    """
    bits = jax.lax.bitcast_convert_type(val_f32, jnp.int32)
    sel = jnp.where(onehot, bits, INT_MIN)
    return jax.lax.bitcast_convert_type(
        jnp.max(sel, axis=0, keepdims=True), jnp.float32)


def _sublane_kernel(
    # scalar prefetch
    tile_start_ref,   # i32 [ntiles + 1] (SMEM)
    scissor_ref,      # i32 [4] (SMEM)
    nbroad_ref,       # i32 [1] (SMEM)
    # inputs
    entries_ref,      # f32 [E, 128] (HBM/ANY) row-major, lane-padded
    broad_ch_ref,     # f32 [NUM_CHANNELS, B] (SMEM)
    broad_bbox_ref,   # f32 [4, B] (SMEM; entry-minor)
    depth_init_ref,   # f32 [th * tpp, tw] (VMEM block)
    # outputs
    owner_ref, z_ref, order_ref, uw_ref, vw_ref, iw_ref, tex_ref,
    # scratch
    ebuf,             # f32 [2, chunk, 128] VMEM chunk staging
    gsm,              # f32 [2, 1, 128] SMEM exit-gate row
    sem, gsem,        # DMA semaphores [2] each
    *,
    tile_w: int,
    tile_h: int,
    grid_w: int,
    chunk: int,
    e_cap: int,
    owner_base: int,
    le: bool,
    d16: bool,
    tiles_per_prog: int = 1,
):
    gy0 = pl.program_id(0)
    gx = pl.program_id(1)
    inv_q = jnp.float32(1.0 / 65535.0)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    for _ts in range(tiles_per_prog):
        gy = gy0 * tiles_per_prog + _ts
        t = gy * grid_w + gx
        start = tile_start_ref[t]
        end = tile_start_ref[t + 1]

        # ---- pixel coordinate maps -------------------------------------
        xcb = gx * tile_w + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 1)
        ycb = gy * tile_h + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 0)
        xfb = xcb.astype(jnp.float32) + 0.5
        yfb = ycb.astype(jnp.float32) + 0.5
        in_scissor = (
            (xcb >= scissor_ref[0]) & (xcb < scissor_ref[0] + scissor_ref[2])
            & (ycb >= scissor_ref[1]) & (ycb < scissor_ref[1] + scissor_ref[3])
        )
        # [1, tile_w] pixel-row x centers; per-row y is folded via a
        # [chunk, tile_h] table of per-entry B*y products (lane slices)
        xf_row = xfb[:1, :]
        yrow = yfb[:, :1].reshape(1, tile_h)  # [1, th] row y centers

        state0 = (
            depth_init_ref[_ts * tile_h:(_ts + 1) * tile_h, :],
            jnp.full((tile_h, tile_w), -1, jnp.int32),
            jnp.full((tile_h, tile_w), -1.0, jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.float32),
            jnp.ones((tile_h, tile_w), jnp.float32),
            jnp.zeros((tile_h, tile_w), jnp.int32),
        )

        nchunks = jnp.where(end > start, pl.cdiv(end - start, chunk), 0)

        def chunk_slice(k):
            return jnp.minimum(start + k * chunk, e_cap - chunk)

        def dma(slot, k):
            # chunk rows to VMEM + the first unprocessed entry's row to
            # SMEM (the exit gate needs one scalar; dynamic sublane
            # indexing of VMEM is not a supported Mosaic access)
            grow = jnp.maximum(start, chunk_slice(k))
            return (
                pltpu.make_async_copy(
                    entries_ref.at[pl.ds(chunk_slice(k), chunk), :],
                    ebuf.at[slot], sem.at[slot]),
                pltpu.make_async_copy(
                    entries_ref.at[pl.ds(grow, 1), :],
                    gsm.at[slot], gsem.at[slot]),
            )

        @pl.when(nchunks > 0)
        def _():
            for c in dma(0, 0):
                c.start()

        def chunk_vector_body(k, state):
            """The whole chunk's vector work (runs only when the exit gate
            passes — wrapped in a dynamic-trip fori by the caller)."""
            slot = jax.lax.rem(k, 2)
            s = chunk_slice(k)
            ch = ebuf[slot]                    # [chunk, 128] entry rows
            rows = s + sub_i                   # [chunk, 1] global entry ids
            live = (rows >= start) & (rows < end)

            def coef(j):
                return ch[:, j:j + 1]          # [chunk, 1] lane slice

            meta = coef(S.CH_META).astype(jnp.int32)
            tl = meta >> S.META_TEX_BITS
            tl0 = (tl & 1) > 0
            tl1 = (tl & 2) > 0
            tl2 = (tl & 4) > 0
            meta_f = coef(S.CH_META)           # exact integer-valued f32
            order_c = coef(S.CH_ORDER)         # [chunk, 1]

            # Per-plane row decomposition: e(x, y) = (A*x + B*y) + C with
            # A*x shared by every pixel row and B*y a [chunk, tile_h]
            # lane-table — identical products and addition order to the
            # XLA path's plane evaluation (bit-exact).
            PLANES = (S.CH_E0, S.CH_E1, S.CH_E2, S.CH_Z,
                      S.CH_UW, S.CH_VW, S.CH_INVW)
            ax = {p: coef(p) * xf_row for p in PLANES}        # [chunk, tw]
            by = {p: coef(p + 1) * yrow for p in PLANES}      # [chunk, th]
            cc = {p: coef(p + 2) for p in PLANES}             # [chunk, 1]

            def plane(p, r):
                return (ax[p] + by[p][:, r:r + 1]) + cc[p]

            out_rows = []   # per pixel row: (hit, zmin, obest, own, uw, vw, iw, tex)
            for r in range(tile_h):
                e0 = plane(S.CH_E0, r)
                e1 = plane(S.CH_E1, r)
                e2 = plane(S.CH_E2, r)
                cov = (
                    ((e0 > 0) | ((e0 == 0) & tl0))
                    & ((e1 > 0) | ((e1 == 0) & tl1))
                    & ((e2 > 0) | ((e2 == 0) & tl2))
                )
                z = plane(S.CH_Z, r)
                zc = jnp.clip(z, 0.0, 1.0)
                zq = jnp.round(zc * 65535.0) * inv_q if d16 else zc
                frag = cov & (z == zc) & in_scissor[r:r + 1, :] & live

                zsel = jnp.where(frag, zq, jnp.inf)
                zmin = jnp.min(zsel, axis=0, keepdims=True)   # [1, tw]
                cand = frag & (zq == zmin)
                if le:
                    osel = jnp.where(cand, order_c, -jnp.inf)
                    obest = jnp.max(osel, axis=0, keepdims=True)
                else:
                    osel = jnp.where(cand, order_c, jnp.inf)
                    obest = jnp.min(osel, axis=0, keepdims=True)
                win = cand & (order_c == obest)
                if le:
                    isel = jnp.where(win, sub_i, -1)
                    ibest = jnp.max(isel, axis=0, keepdims=True)
                else:
                    isel = jnp.where(win, sub_i, chunk)
                    ibest = jnp.min(isel, axis=0, keepdims=True)
                onehot = win & (sub_i == ibest)

                uw = _bitmax(onehot, plane(S.CH_UW, r))
                vw = _bitmax(onehot, plane(S.CH_VW, r))
                iw = _bitmax(onehot, plane(S.CH_INVW, r))
                # meta bits are non-negative ints: INT_MIN identity is safe
                # as a value max too
                tex = jnp.max(jnp.where(onehot, meta, INT_MIN),
                              axis=0, keepdims=True) & S.META_TEX_MASK
                out_rows.append((zmin, obest, s + ibest, uw, vw, iw, tex))

            def stack(i):
                # (f32/i32 only: a sublane concat of i1 rows trips an
                # invalid i1->i32 vreg bitcast in Mosaic on real TPU)
                return jnp.concatenate([rr[i] for rr in out_rows], axis=0)

            zmin16 = stack(0)
            ord16 = stack(1)
            own16 = stack(2)
            hit16 = zmin16 < jnp.inf
            zbuf, owner, obuf, uwb, vwb, iwb, texb = state
            if le:
                beats = hit16 & (
                    (zmin16 < zbuf) | ((zmin16 == zbuf) & (ord16 >= obuf)))
            else:
                beats = hit16 & (
                    (zmin16 < zbuf) | ((zmin16 == zbuf) & (ord16 < obuf)))
            return (
                jnp.where(beats, zmin16, zbuf),
                jnp.where(beats, own16, owner),
                jnp.where(beats, ord16, obuf),
                jnp.where(beats, stack(3), uwb),
                jnp.where(beats, stack(4), vwb),
                jnp.where(beats, stack(5), iwb),
                jnp.where(beats, stack(6), texb),
            )

        def chunk_body(k, carry):
            state, thresh, alive = carry
            slot = jax.lax.rem(k, 2)

            @pl.when(alive)
            def _():
                for c in dma(slot, k):
                    c.wait()

            zmin0 = gsm[slot, 0, S.CH_ZMIN] * inv_q
            proceed = alive & (zmin0 <= thresh)

            @pl.when(proceed & (k + 1 < nchunks))
            def _():
                for c in dma(jax.lax.rem(k + 1, 2), k + 1):
                    c.start()

            # dead chunks (early exit) run zero vector iterations
            state = jax.lax.fori_loop(
                0, jnp.where(proceed, 1, 0),
                lambda _, st: chunk_vector_body(k, st), state)
            thresh = jnp.where(proceed, jnp.max(state[0]), thresh)
            return state, thresh, proceed & (k + 1 < nchunks)

        state, _, _ = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (state0, jnp.max(state0[0]), nchunks > 0))

        # ---- broad entries: SMEM scalar sweep (serial kernel's path) ----
        B = broad_ch_ref.shape[1]
        if B > 0:
            def resolve_entry(coeff, eid, live, st):
                zbuf, owner, obuf, uwb, vwb, iwb, texb = st

                def bplane(row):
                    return (coeff(row) * xfb + coeff(row + 1) * yfb
                            + coeff(row + 2))

                meta = coeff(S.CH_META).astype(jnp.int32)
                tl = meta >> S.META_TEX_BITS
                e0 = bplane(S.CH_E0)
                e1 = bplane(S.CH_E1)
                e2 = bplane(S.CH_E2)
                cov = (
                    ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
                    & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
                    & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
                )
                z = bplane(S.CH_Z)
                zc = jnp.clip(z, 0.0, 1.0)
                zq = jnp.round(zc * 65535.0) * inv_q if d16 else zc
                order = coeff(S.CH_ORDER)
                frag = cov & (z == zc) & in_scissor & live
                if le:
                    passing = frag & (
                        (zq < zbuf) | ((zq == zbuf) & (order >= obuf)))
                else:
                    passing = frag & (
                        (zq < zbuf) | ((zq == zbuf) & (order < obuf)))
                return (
                    jnp.where(passing, zq, zbuf),
                    jnp.where(passing, eid, owner),
                    jnp.where(passing, order, obuf),
                    jnp.where(passing, bplane(S.CH_UW), uwb),
                    jnp.where(passing, bplane(S.CH_VW), vwb),
                    jnp.where(passing, bplane(S.CH_INVW), iwb),
                    jnp.where(passing, meta & S.META_TEX_MASK, texb),
                )

            gxf = gx.astype(jnp.float32)
            gyf = gy.astype(jnp.float32)

            def broad_body(j, carry):
                live = (
                    (gxf >= broad_bbox_ref[0, j])
                    & (gxf <= broad_bbox_ref[2, j])
                    & (gyf >= broad_bbox_ref[1, j])
                    & (gyf <= broad_bbox_ref[3, j])
                )
                coeff = lambda row: broad_ch_ref[row, j]  # noqa: E731
                return resolve_entry(coeff, owner_base + j, live, carry)

            state = jax.lax.fori_loop(
                0, jnp.minimum(nbroad_ref[0], B), broad_body, state)

        zbuf, owner, obuf, uwb, vwb, iwb, texb = state
        sl = slice(_ts * tile_h, (_ts + 1) * tile_h)
        owner_ref[sl, :] = owner
        z_ref[sl, :] = zbuf
        order_ref[sl, :] = obuf
        uw_ref[sl, :] = uwb
        vw_ref[sl, :] = vwb
        iw_ref[sl, :] = iwb
        tex_ref[sl, :] = texb


@functools.partial(
    jax.jit,
    static_argnames=(
        "fb_w", "fb_h", "tile_w", "tile_h", "grid_w", "grid_h",
        "chunk", "depth_state", "interpret", "tiles_per_prog",
    ),
)
def rasterize_visibility_sublane(
    binned: BinnedEntries,
    init_depth,   # f32 [fb_h, fb_w]
    scissor,      # i32 [4]
    *,
    fb_w: int,
    fb_h: int,
    tile_w: int,
    tile_h: int,
    grid_w: int,
    grid_h: int,
    chunk: int = 128,
    depth_state: DepthState,
    interpret: bool = False,
    tiles_per_prog: int = 1,
):
    """Sublane-batched visibility resolve.  Returns (VisibilityBuffer,
    overflow=0).  Same contract and owner-id space as
    rasterize_visibility_pallas (narrow rows then owner_base + broads)."""
    if depth_state.compare_op not in (CompareOp.LESS, CompareOp.LESS_OR_EQUAL):
        raise NotImplementedError(
            "sublane visibility supports LESS/LESS_OR_EQUAL; use exact mode")
    if not (depth_state.test_enable and depth_state.write_enable):
        raise NotImplementedError("sublane visibility needs depth test+write")
    if tile_w != 128:
        raise ValueError("sublane kernel puts the tile row's pixels in "
                         "lanes: tile_w must be 128")
    e_cap = binned.entry_channels.shape[0]
    if e_cap % chunk != 0:
        raise ValueError(f"entry_cap {e_cap} must be a multiple of {chunk}")
    if e_cap < chunk:
        raise ValueError("entry table smaller than one chunk window")
    if grid_h % tiles_per_prog != 0:
        raise ValueError("tiles_per_prog must divide grid_h")
    _check_broad_smem(binned.broad_channels_cm.shape[1],
                      "rasterize_visibility_sublane")

    pad_h = grid_h * tile_h
    pad_w = grid_w * tile_w
    depth0 = jnp.pad(
        init_depth.astype(jnp.float32),
        ((0, pad_h - fb_h), (0, pad_w - fb_w)),
        constant_values=jnp.float32(-jnp.inf),
    )

    kernel = functools.partial(
        _sublane_kernel,
        tile_w=tile_w, tile_h=tile_h, grid_w=grid_w,
        chunk=chunk, e_cap=e_cap,
        owner_base=binned.entry_tile.shape[0],
        le=depth_state.compare_op == CompareOp.LESS_OR_EQUAL,
        d16=depth_state.format == DepthFormat.D16_UNORM,
        tiles_per_prog=tiles_per_prog,
    )

    tpp = tiles_per_prog
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_h // tpp, grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # entries stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),   # broad channels
            pl.BlockSpec(memory_space=pltpu.SMEM),   # broad bboxes
            pl.BlockSpec((tile_h * tpp, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h * tpp, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.SMEM((2, 1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    entries_padded = jnp.pad(
        binned.entry_channels, ((0, 0), (0, 128 - S.NUM_CHANNELS)))

    owner, z, order, uw, vw, iw, tex = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
        ],
        interpret=interpret,
    )(
        binned.tile_start,
        scissor,
        binned.num_broad.reshape(1),
        entries_padded,
        binned.broad_channels_cm,
        binned.broad_tiles.astype(jnp.float32).T,
        depth0,
    )

    vis = VisibilityBuffer(
        owner=owner[:fb_h, :fb_w],
        depth=z[:fb_h, :fb_w],
        order=order[:fb_h, :fb_w],
        uw=uw[:fb_h, :fb_w],
        vw=vw[:fb_h, :fb_w],
        iw=iw[:fb_h, :fb_w],
        tex=tex[:fb_h, :fb_w],
    )
    return vis, jnp.zeros((), jnp.int32)
