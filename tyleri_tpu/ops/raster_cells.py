"""Fragment-centric (cell-granularity) Pallas visibility kernel.

The serial per-entry kernel (ops/raster_pallas.py) evaluates every entry
against its whole (16, 128) tile and pays ~23 SMEM scalar loads per entry —
measured ~70% of its runtime at sponza-1M density, where the median
triangle covers ~2 px.  This kernel replaces both costs for SMALL
triangles:

* binning expands narrow triangles at CELL granularity — an (8, 16)-px
  cell is one native 128-lane vector — so each entry is evaluated on 128
  pixels instead of 2048
* a chunk of 128 entries is processed with entries along SUBLANES and the
  cell's pixels along LANES: plane coefficients are [128, 1] lane slices of
  the DMA'd row block (zero scalar loads), and pixel coordinates stay
  bit-exact with the XLA path because cell-origin + offset sums of
  half-integer pixel centers below 2^12 are exact in f32
* per-pixel resolution inside a chunk is an UNSEGMENTED min-scan over a
  packed i32 key (inverted-local-cell | quantized z | stream index):
  entries are sorted by (cell, draw order), so the inverted cell id in the
  top bits confines each prefix-min to its own cell run, and the stream
  index breaks equal-quantized-z ties in draw order — exactly the
  associative lexicographic (z, order) min of the serial kernel
* chunk winners land in the tile framebuffer through one-hot MXU matmuls
  (the only Mosaic-legal data-dependent placement): with exactly one
  nonzero term per output, a HIGHEST-precision f32 dot reproduces the
  placed value bit-exactly
* the framebuffer lives CELL-MAJOR ([16 cells, 128 cell-px] per tile) for
  the whole kernel — medium/broad streams evaluate at cell-major pixel
  coordinate maps, which are just differently-shaped iotas — and the
  wrapper un-permutes once in XLA

Medium triangles (> max_cells_per_tri covered cells) arrive as a second,
small (tile, zmin)-sorted stream and run the serial per-entry resolve with
the front-to-back early exit, sharing the framebuffer registers; huge ones
ride the SMEM broad list.  Any stream order is exact (associative resolve).

Depth: D16_UNORM with LESS/LESS_OR_EQUAL test+write (the reference
pipelines' configuration, ref: src/pipeline/common_pipeline.rs:107-116);
other configs route to the serial kernel or the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tyleri_tpu.ops import setup as S
from tyleri_tpu.ops.binning import BinnedEntries, CellBinned
from tyleri_tpu.ops.visibility import VisibilityBuffer
from tyleri_tpu.pipeline.state import CompareOp, DepthFormat, DepthState

MAXKEY = 1 << 29  # > any packed (cellinv | zq | idx) key


def _cells_kernel(
    # scalar prefetch
    n_start_ref,      # i32 [ntiles + 1] narrow (cell) segment offsets
    m_start_ref,      # i32 [ntiles + 1] medium segment offsets
    scissor_ref,      # i32 [4]
    nbroad_ref,       # i32 [1]
    # inputs
    nentries_ref,     # f32 [En, 128] narrow rows (CH_ZMIN col = local cell)
    ncell_ref,        # i32 [En/128, 128] local cell ids, lane-major
    mentries_ref,     # f32 [Em, 128] medium rows, (tile, zmin)-sorted
    broad_ch_ref,     # f32 [NUM_CHANNELS, B] (SMEM)
    broad_bbox_ref,   # f32 [4, B] (SMEM; entry-minor — a [B, 4]
                      #   SMEM window pads the minor dim to 128 lanes: 2 MB
                      #   at B=4096, over the ~1 MB SMEM budget)
    depth_init_ref,   # f32 [16, tile_w] CELL-MAJOR block
    # outputs (cell-major blocks)
    owner_ref, z_ref, order_ref, uw_ref, vw_ref, iw_ref, tex_ref,
    # scratch
    nbuf, ncell_buf, nsem, csem, mbuf, msem,
    *,
    tile_w: int,
    tile_h: int,
    cell_w: int,
    cell_h: int,
    grid_w: int,
    chunk: int,
    m_chunk: int,
    en_cap: int,
    em_cap: int,
    le: bool,
    tiles_per_prog: int = 1,
):
    cpt_x = tile_w // cell_w
    cpt_y = tile_h // cell_h
    cpt = cpt_x * cpt_y            # cells per tile (= rows of the fb block)
    cpx = cell_w * cell_h          # pixels per cell (= 128 lanes)
    assert cpx == 128 and chunk == 128

    gy0 = pl.program_id(0)
    gx = pl.program_id(1)
    # sub-tile loop: each grid program resolves tiles_per_prog
    # vertically-adjacent tiles end-to-end (static python loop)
    for _ts in range(tiles_per_prog):
        gy = gy0 * tiles_per_prog + _ts
        t = gy * grid_w + gx

        # ---- cell-major pixel coordinate maps --------------------------------
        # lane l of cell row c is pixel (x, y) = (gx*tile_w + (c % cpt_x)*cell_w
        # + l % cell_w, gy*tile_h + (c // cpt_x)*cell_h + l // cell_w).  All
        # sums of integers < 2^12 plus 0.5: exact in f32, so plane evaluation
        # A*xf + B*yf + C matches the XLA path bit-for-bit.
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (cpt, cpx), 1)
        cidx16 = jax.lax.broadcasted_iota(jnp.int32, (cpt, cpx), 0)
        xcb = gx * tile_w + (cidx16 % cpt_x) * cell_w + lane16 % cell_w
        ycb = gy * tile_h + (cidx16 // cpt_x) * cell_h + lane16 // cell_w
        xfb = xcb.astype(jnp.float32) + 0.5
        yfb = ycb.astype(jnp.float32) + 0.5
        in_scissor_t = (
            (xcb >= scissor_ref[0]) & (xcb < scissor_ref[0] + scissor_ref[2])
            & (ycb >= scissor_ref[1]) & (ycb < scissor_ref[1] + scissor_ref[3])
        )

        inv_q = jnp.float32(1.0 / 65535.0)

        # ---- fb state (cell-major [cpt, cpx] per channel) --------------------
        blk = slice(_ts * cpt, (_ts + 1) * cpt)
        state0 = (
            depth_init_ref[blk, :],                       # zbuf
            jnp.full((cpt, cpx), -1, jnp.int32),          # owner
            jnp.full((cpt, cpx), -1.0, jnp.float32),      # obuf
            jnp.zeros((cpt, cpx), jnp.float32),           # uw
            jnp.zeros((cpt, cpx), jnp.float32),           # vw
            jnp.ones((cpt, cpx), jnp.float32),            # iw
            jnp.zeros((cpt, cpx), jnp.int32),             # tex
        )

        # ================= narrow stream: cell-batched chunks =================
        ns = n_start_ref[t]
        ne = n_start_ref[t + 1]
        ra0 = (ns // chunk) * chunk    # 128-aligned windows: lead/tail entries
                                       # belong to NEIGHBOR tiles — masked out
        nchunks = jnp.where(ne > ns, pl.cdiv(ne - ra0, chunk), 0)

        def n_dma(slot, k):
            ra = ra0 + k * chunk
            return (
                pltpu.make_async_copy(
                    nentries_ref.at[pl.ds(ra, chunk), :], nbuf.at[slot],
                    nsem.at[slot]),
                pltpu.make_async_copy(
                    ncell_ref.at[pl.ds(ra // chunk, 1), :], ncell_buf.at[slot],
                    csem.at[slot]),
            )

        @pl.when(nchunks > 0)
        def _():
            for c in n_dma(0, 0):
                c.start()

        sub_i = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        # in-cell pixel offsets, shared by every entry (lanes = cell pixels)
        dxf = (lane16[:1, :] % cell_w).astype(jnp.float32)   # [1, 128]
        dyf = (lane16[:1, :] // cell_w).astype(jnp.float32)

        def n_chunk(k, state):
            slot = jax.lax.rem(k, 2)
            for c in n_dma(slot, k):
                c.wait()

            @pl.when(k + 1 < nchunks)
            def _():
                for c in n_dma(jax.lax.rem(k + 1, 2), k + 1):
                    c.start()

            ra = ra0 + k * chunk
            ch = nbuf[slot]                      # [128 entries, 128 channels]
            rows = ra + sub_i                    # [128, 1] global rows
            live_s = (rows >= ns) & (rows < ne)
            cell_s = jnp.clip(ch[:, S.CH_ZMIN:S.CH_ZMIN + 1].astype(jnp.int32),
                              0, cpt - 1)        # [128, 1]
            cell_l = jnp.clip(ncell_buf[slot], 0, cpt - 1)   # [1, 128]
            live_l = (ra + lane_i >= ns) & (ra + lane_i < ne)

            def coef(row):
                return ch[:, row:row + 1]        # [128, 1] lane slice

            x0 = (gx * tile_w + (cell_s % cpt_x) * cell_w).astype(jnp.float32)
            y0 = (gy * tile_h + (cell_s // cpt_x) * cell_h).astype(jnp.float32)
            xf = (x0 + dxf) + 0.5                # [128e, 128px], exact sums
            yf = (y0 + dyf) + 0.5

            def plane(row):
                return coef(row) * xf + coef(row + 1) * yf + coef(row + 2)

            meta = coef(S.CH_META).astype(jnp.int32)
            tl = meta >> S.META_TEX_BITS
            e0 = plane(S.CH_E0)
            e1 = plane(S.CH_E1)
            e2 = plane(S.CH_E2)
            cov = (
                ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
                & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
                & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
            )
            z = plane(S.CH_Z)
            zc = jnp.clip(z, 0.0, 1.0)
            zqf = jnp.round(zc * 65535.0)        # integer-valued f32, 16 bits
            xi = xf.astype(jnp.int32)            # == xcb at the entry's window
            yi = yf.astype(jnp.int32)
            in_sc = (
                (xi >= scissor_ref[0]) & (xi < scissor_ref[0] + scissor_ref[2])
                & (yi >= scissor_ref[1]) & (yi < scissor_ref[1] + scissor_ref[3])
            )
            frag = cov & (z == zc) & in_sc & live_s

            # packed resolve key: inverted cell run | quantized z | stream idx.
            # Entries are (cell, order)-sorted, so ascending idx == ascending
            # draw order; LESS keeps the earliest order on z-ties (min idx),
            # LESS_OR_EQUAL the latest (min inverted idx).
            idx_dir = sub_i if not le else (chunk - 1) - sub_i
            bias = ((cpt - 1 - cell_s) << 23) | idx_dir      # [128, 1]
            key = (zqf.astype(jnp.int32) << 7) | bias
            key = jnp.where(frag, key, MAXKEY)

            # unsegmented prefix-min over sublanes: earlier cells carry larger
            # inverted-cell top bits, so each entry's running min stays within
            # its own cell run (its own key is always a candidate)
            for s in (1, 2, 4, 8, 16, 32, 64):
                shifted = jnp.concatenate(
                    [jnp.full((s, chunk), MAXKEY, jnp.int32), key[:-s, :]],
                    axis=0,
                )
                key = jnp.minimum(key, shifted)

            # packed chunk-winner id: zq*128 + idx < 2^23, exact in f32 (and in
            # a one-nonzero-term HIGHEST dot), so ONE placed channel carries the
            # whole (quantized z, stream idx) winner identity
            key_w = (key & ((1 << 23) - 1)).astype(jnp.float32)  # [128, 128]

            # one-hot placement operands (f32 0/1; HIGHEST-precision dots with
            # a single nonzero term per output are exact)
            cell_next = jnp.concatenate(
                [cell_l[:, 1:], jnp.full((1, 1), -1, jnp.int32)], axis=1)
            # live at lane l+1, computed arithmetically: a lane-dim concat of
            # i1 vectors trips an invalid i1->i32 vreg bitcast in Mosaic
            live_next = (ra + lane_i + 1 >= ns) & (ra + lane_i + 1 < ne)
            is_last = live_l & ((cell_l != cell_next) | ~live_next)
            crow_iota = jax.lax.broadcasted_iota(jnp.int32, (cpt, chunk), 0)
            sel_last = ((crow_iota == cell_l) & is_last).astype(jnp.float32)
            sel_all = ((crow_iota == cell_l) & live_l).astype(jnp.float32)
            lane_cell = jax.lax.broadcasted_iota(jnp.int32, (chunk, cpt), 1)
            sel_back = (lane_cell == cell_s).astype(jnp.float32)  # [128, cpt]

            def place(sel, val):   # [cpt, chunk] @ [chunk, N] -> [cpt, N]
                return jax.lax.dot(
                    sel, val, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            wk_c = place(sel_last, key_w)         # cell-winner ids, per pixel
            bk = place(sel_back, wk_c)            # broadcast back per entry

            own_key = (zqf * 128.0) + idx_dir.astype(jnp.float32)
            winner = frag & (own_key == bk)       # one entry per (cell, px)
            wf = winner.astype(jnp.float32)

            ordv = coef(S.CH_ORDER)
            texf = (meta & S.META_TEX_MASK).astype(jnp.float32)
            ownf = rows.astype(jnp.float32)      # global narrow row id

            # ONE wide dot places all 8 channels (validity, z, order, uw, vw,
            # 1/w, tex, owner): N-stacked rhs keeps the MXU busy instead of 8
            # matmul setups.  where() (not *wf) for the plane values: a dead
            # lane's plane can be NaN and NaN * 0 != 0.
            bundle = jnp.concatenate([
                wf,
                jnp.where(winner, zqf, 0.0),
                ordv * wf,
                jnp.where(winner, plane(S.CH_UW), 0.0),
                jnp.where(winner, plane(S.CH_VW), 0.0),
                jnp.where(winner, plane(S.CH_INVW), 0.0),
                texf * wf,
                ownf * wf,
            ], axis=1)                            # [chunk, 8 * cpx]
            p = place(sel_all, bundle)            # [cpt, 8 * cpx]
            (p_val, p_zq, p_ord, p_uw, p_vw, p_iw, p_tex, p_own) = (
                p[:, k * cpx:(k + 1) * cpx] for k in range(8))

            zbuf, owner, obuf, uwb, vwb, iwb, texb = state
            zp = p_zq * inv_q
            if le:
                passing = (p_val > 0) & (
                    (zp < zbuf) | ((zp == zbuf) & (p_ord >= obuf)))
            else:
                passing = (p_val > 0) & (
                    (zp < zbuf) | ((zp == zbuf) & (p_ord < obuf)))
            return (
                jnp.where(passing, zp, zbuf),
                jnp.where(passing, p_own.astype(jnp.int32), owner),
                jnp.where(passing, p_ord, obuf),
                jnp.where(passing, p_uw, uwb),
                jnp.where(passing, p_vw, vwb),
                jnp.where(passing, p_iw, iwb),
                jnp.where(passing, p_tex.astype(jnp.int32), texb),
            )

        state = jax.lax.fori_loop(0, nchunks, n_chunk, state0)

        # ================= medium stream: serial per-entry sweep ==============
        # Identical structure to ops/raster_pallas.py (SMEM coefficient loads,
        # front-to-back early exit on the CH_ZMIN bound), evaluating at the
        # CELL-MAJOR coordinate maps — the resolve is pixel-set identical.
        def resolve_entry(coeff, eid, live, st):
            zbuf, owner, obuf, uwb, vwb, iwb, texb = st

            def plane(row):
                return coeff(row) * xfb + coeff(row + 1) * yfb + coeff(row + 2)

            meta = coeff(S.CH_META).astype(jnp.int32)
            tl = meta >> S.META_TEX_BITS
            e0 = plane(S.CH_E0)
            e1 = plane(S.CH_E1)
            e2 = plane(S.CH_E2)
            cov = (
                ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
                & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
                & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
            )
            z = plane(S.CH_Z)
            zc = jnp.clip(z, 0.0, 1.0)
            zq = jnp.round(zc * 65535.0) * inv_q
            order = coeff(S.CH_ORDER)
            frag = cov & (z == zc) & in_scissor_t & live
            if le:
                passing = frag & ((zq < zbuf) | ((zq == zbuf) & (order >= obuf)))
            else:
                passing = frag & ((zq < zbuf) | ((zq == zbuf) & (order < obuf)))
            return (
                jnp.where(passing, zq, zbuf),
                jnp.where(passing, eid, owner),
                jnp.where(passing, order, obuf),
                jnp.where(passing, plane(S.CH_UW), uwb),
                jnp.where(passing, plane(S.CH_VW), vwb),
                jnp.where(passing, plane(S.CH_INVW), iwb),
                jnp.where(passing, meta & S.META_TEX_MASK, texb),
            )

        ms = m_start_ref[t]
        me = m_start_ref[t + 1]
        if em_cap > 0:
            def m_dma(slot, k):
                s = jnp.minimum(ms + k * m_chunk, em_cap - m_chunk)
                return pltpu.make_async_copy(
                    mentries_ref.at[pl.ds(s, m_chunk), :], mbuf.at[slot],
                    msem.at[slot])

            mchunks = jnp.where(me > ms, pl.cdiv(me - ms, m_chunk), 0)

            @pl.when(mchunks > 0)
            def _():
                m_dma(0, 0).start()

            def m_chunk_body(k, carry):
                st, thresh, alive = carry
                slot = jax.lax.rem(k, 2)

                @pl.when(alive)
                def _():
                    m_dma(slot, k).wait()

                s = jnp.minimum(ms + k * m_chunk, em_cap - m_chunk)
                idx0 = jnp.maximum(ms - s, 0)
                zmin0 = mbuf[slot, idx0, S.CH_ZMIN] * inv_q
                proceed = alive & (zmin0 <= thresh)

                @pl.when(proceed & (k + 1 < mchunks))
                def _():
                    m_dma(jax.lax.rem(k + 1, 2), k + 1).start()

                n_here = jnp.where(proceed, jnp.clip(me - s, 0, m_chunk), 0)

                # 4-entry unroll: later entries' SMEM scalar loads overlap
                # earlier entries' vector work (the serial kernel's measured
                # optimum, ops/raster_pallas.py)
                UNROLL = 4
                assert m_chunk % UNROLL == 0

                def entry_body(jj, inner):
                    j = jj * UNROLL
                    for u in range(UNROLL):
                        idx = s + j + u
                        live = (idx >= ms) & (idx < me)
                        c_u = lambda row, ju=j + u: mbuf[slot, ju, row]  # noqa: E731
                        inner = resolve_entry(c_u, en_cap + idx, live, inner)
                    return inner

                st = jax.lax.fori_loop(
                    0, (n_here + UNROLL - 1) // UNROLL, entry_body, st)
                thresh = jnp.where(proceed, jnp.max(st[0]), thresh)
                return st, thresh, proceed & (k + 1 < mchunks)

            state, _, _ = jax.lax.fori_loop(
                0, mchunks, m_chunk_body,
                (state, jnp.max(state[0]), mchunks > 0))

        # ================= broad list (SMEM, scalar bbox gate) ================
        B = broad_ch_ref.shape[1]
        if B > 0:
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
                return resolve_entry(coeff, en_cap + em_cap + j, live, carry)

            state = jax.lax.fori_loop(
                0, jnp.minimum(nbroad_ref[0], B), broad_body, state)

        zbuf, owner, obuf, uwb, vwb, iwb, texb = state
        owner_ref[blk, :] = owner
        z_ref[blk, :] = zbuf
        order_ref[blk, :] = obuf
        uw_ref[blk, :] = uwb
        vw_ref[blk, :] = vwb
        iw_ref[blk, :] = iwb
        tex_ref[blk, :] = texb


def _permute(a, grid_h, grid_w, tile_h, tile_w, cell_h, cell_w):
    """Self-inverse px-major <-> cell-major permutation of [gh*th, gw*tw]."""
    cpt_x = tile_w // cell_w
    cpt_y = tile_h // cell_h
    a6 = a.reshape(grid_h, cpt_y, cell_h, grid_w, cpt_x, cell_w)
    return jnp.transpose(a6, (0, 1, 4, 3, 2, 5)).reshape(
        grid_h * tile_h, grid_w * tile_w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "fb_w", "fb_h", "tile_w", "tile_h", "cell_w", "cell_h",
        "grid_w", "grid_h", "m_chunk", "depth_state", "interpret",
        "tiles_per_prog",
    ),
)
def rasterize_visibility_cells(
    cells: CellBinned,
    medium: BinnedEntries,
    init_depth,   # f32 [fb_h, fb_w]
    scissor,      # i32 [4]
    *,
    fb_w: int,
    fb_h: int,
    tile_w: int,
    tile_h: int,
    cell_w: int = 16,
    cell_h: int = 8,
    grid_w: int,
    grid_h: int,
    m_chunk: int = 128,
    depth_state: DepthState,
    interpret: bool = False,
    tiles_per_prog: int = 1,
):
    """Cell-granularity visibility resolve.  Returns (VisibilityBuffer,
    overflow=0).  Owner id spaces: narrow rows, then en_cap + medium rows,
    then en_cap + em_cap + broad slots."""
    if depth_state.compare_op not in (CompareOp.LESS, CompareOp.LESS_OR_EQUAL):
        raise NotImplementedError("cells kernel: LESS/LESS_OR_EQUAL only")
    if not (depth_state.test_enable and depth_state.write_enable):
        raise NotImplementedError("cells kernel needs depth test+write")
    if depth_state.format != DepthFormat.D16_UNORM:
        raise NotImplementedError("cells kernel packs D16 z in its scan key")
    if cell_w * cell_h != 128:
        raise ValueError("cell must be one 128-lane vector")
    if tile_w != 128:
        raise ValueError("cells kernel assumes one 128-lane tile column "
                         "per grid step (tile_w == 128)")
    if (tile_w * tile_h) // (cell_w * cell_h) > 64:
        # the packed scan key is (cellinv << 23) | (zq << 7) | idx with a
        # 6-bit cell budget under MAXKEY (1 << 29): cpt > 64 would push live
        # keys past the dead-lane sentinel and corrupt the prefix-min
        raise ValueError("cells kernel supports at most 64 cells per tile "
                         f"(got {(tile_w * tile_h) // (cell_w * cell_h)})")
    if grid_h % tiles_per_prog != 0:
        raise ValueError("tiles_per_prog must divide grid_h")

    en_cap = cells.entry_channels.shape[0]
    em_cap = medium.entry_channels.shape[0]
    if en_cap % 128 != 0 or em_cap % m_chunk != 0:
        raise ValueError("caps must tile into chunks")
    from tyleri_tpu.ops.raster_pallas import _check_broad_smem
    _check_broad_smem(medium.broad_channels_cm.shape[1],
                      "rasterize_visibility_cells")

    pad_h = grid_h * tile_h
    pad_w = grid_w * tile_w
    depth0 = jnp.pad(
        init_depth.astype(jnp.float32),
        ((0, pad_h - fb_h), (0, pad_w - fb_w)),
        constant_values=jnp.float32(-jnp.inf),
    )
    depth0 = _permute(depth0, grid_h, grid_w, tile_h, tile_w, cell_h, cell_w)

    kernel = functools.partial(
        _cells_kernel,
        tile_w=tile_w, tile_h=tile_h, cell_w=cell_w, cell_h=cell_h,
        grid_w=grid_w, chunk=128, m_chunk=m_chunk,
        en_cap=en_cap, em_cap=em_cap,
        le=depth_state.compare_op == CompareOp.LESS_OR_EQUAL,
        tiles_per_prog=tiles_per_prog,
    )
    cpt = (tile_w // cell_w) * (tile_h // cell_h)
    tpp = tiles_per_prog

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid_h // tpp, grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # narrow entries (HBM)
            pl.BlockSpec(memory_space=pl.ANY),       # narrow cell rows
            pl.BlockSpec(memory_space=pl.ANY),       # medium entries
            pl.BlockSpec(memory_space=pltpu.SMEM),   # broad channels
            pl.BlockSpec(memory_space=pltpu.SMEM),   # broad bboxes
            pl.BlockSpec((cpt * tpp, cell_w * cell_h),
                         lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),   # cell-major depth init
        ],
        out_specs=[
            pl.BlockSpec((cpt * tpp, cell_w * cell_h),
                         lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 128, 128), jnp.float32),   # narrow chunk rows
            pltpu.VMEM((2, 1, 128), jnp.int32),       # narrow cell ids
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2, m_chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    n_padded = jnp.pad(
        cells.entry_channels, ((0, 0), (0, 128 - S.NUM_CHANNELS)))
    m_padded = jnp.pad(
        medium.entry_channels, ((0, 0), (0, 128 - S.NUM_CHANNELS)))

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
        cells.tile_start,
        medium.tile_start,
        scissor,
        medium.num_broad.reshape(1),
        n_padded,
        cells.entry_cellrow,
        m_padded,
        medium.broad_channels_cm,
        medium.broad_tiles.astype(jnp.float32).T,
        depth0,
    )

    def unperm(a):
        return _permute(a, grid_h, grid_w, tile_h, tile_w, cell_h, cell_w)[
            :fb_h, :fb_w]

    vis = VisibilityBuffer(
        owner=unperm(owner), depth=unperm(z), order=unperm(order),
        uw=unperm(uw), vw=unperm(vw), iw=unperm(iw), tex=unperm(tex),
    )
    return vis, jnp.zeros((), jnp.int32)
