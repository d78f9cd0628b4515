"""Price the MXU plane-evaluation visibility formulation (round 4).

The production kernel (ops/raster_pallas.py) spends ~70% of its time on
~23 SMEM scalar coefficient loads per entry (round-2 hoist ablation).
Every previous fix (dynroll, sublane, packed, cells) replaced the loads
with something that cost more.  This probe prices the LAST candidate:
evaluate plane equations for a 128-entry chunk against the whole tile
with MXU matmuls — entries in sublanes, tile pixels in lanes:

    e_p[entry, px] = ct[:, :32] @ RHS_p          # [chunk,32] @ [32, PX]

where RHS_p is zero except rows (3p..3p+2) = (xf, yf, 1).  Zero scalar
loads, zero per-entry loop.

Round-1 findings (seg=256, 261K visited entries, v5e):
  mm4_hst 21.0 ms / mm4_def 14.2 / mm7_hst 33.6 — the MATMULS dominate;
  elementwise (+0.2) and the 3-pass reduction (+0.3) ride along free;
  HIGH precision is unsupported by Mosaic; per-matmul issue cost, not
  FLOPs, sets the price (6x passes only 1.5x slower).
Hence round 2: ONE fat matmul with the planes packed along N
(RHS [32, nplanes*PX]), plus a coef-masked-sum attribute path that
avoids attr plane matmuls entirely.

    python tools/exp_mxu.py [variants...] [seg=256] [frames=8]
        [chunk=128] [tile_h=16]

Timing-only: outputs are consumed to prevent DCE but not validated.
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

TILE_W = 128
K = 32                # LHS lane slice: covers coef rows 0..20 + meta/order


def _mxu_kernel(
    tile_start_ref,    # i32 [T+1] SMEM
    entries_ref,       # f32 [E, 128] HBM row-major lane-padded
    out_ref,           # f32 [8, PX] block per program
    ebuf, sem,         # VMEM [2, chunk, 128] + DMA sems
    *, chunk, e_cap, grid_w, precision, nplanes, tile_h,
    fat, do_ew, do_red, do_attr, do_attrc, split, exit_cross,
):
    PX = tile_h * TILE_W
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    gy = t // grid_w
    gx = jax.lax.rem(t, grid_w)

    # pixel coordinate rows [1, PX]: px = y*TILE_W + x
    pxi = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    xf = (gx * TILE_W + (pxi & (TILE_W - 1))).astype(jnp.float32) + 0.5
    yf = (gy * tile_h + (pxi >> 7)).astype(jnp.float32) + 0.5

    if fat:
        # ONE matmul: planes packed along N.  RHS [KF, nplanes*PX]: within
        # plane block p, rows 3p..3p+2 = (xf, yf, 1).
        # split: the exact-in-bf16 decomposition — every coefficient is
        # pre-split into 3 bf16 parts (stored in the row table's pad
        # lanes at binning time; here the synthetic table stands in) and
        # the pixel coordinates into 2 bf16 parts (xf <= 1919.5 is 12
        # bits = 8+4, exact), so a DEFAULT-precision (single-pass bf16)
        # matmul accumulates only EXACT products in f32: per plane
        # 3*2 + 3*2 + 3 = 15 K-rows, 4 planes = 60 <= one 128-lane issue.
        KF = 64 if split else K
        rows_per = 15 if split else 3
        NF = nplanes * PX
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, NF), 1)
        pxl = lane & (PX - 1)
        xff = (gx * TILE_W + (pxl & (TILE_W - 1))).astype(jnp.float32) + 0.5
        yff = (gy * tile_h + (pxl >> 7)).astype(jnp.float32) + 0.5
        r0 = rows_per * (lane >> (PX - 1).bit_length())   # PX = 2^k
        srow = jax.lax.broadcasted_iota(jnp.int32, (KF, NF), 0)
        r0b = jnp.broadcast_to(r0, (KF, NF))
        if split:
            # rows r0+0..5 = x parts (hi/lo alternating), +6..11 = y
            # parts, +12..14 = ones; hi/lo split of the coords is exact
            rr = srow - r0b
            xhi = (xff * 0.0625).astype(jnp.bfloat16).astype(
                jnp.float32) * 16.0
            xlo = xff - xhi
            yhi = (yff * 0.0625).astype(jnp.bfloat16).astype(
                jnp.float32) * 16.0
            ylo = yff - yhi
            pick = jnp.where(
                (rr >= 0) & (rr < 6),
                jnp.where(rr % 2 == 0, jnp.broadcast_to(xhi, (KF, NF)),
                          jnp.broadcast_to(xlo, (KF, NF))),
                jnp.where(
                    (rr >= 6) & (rr < 12),
                    jnp.where(rr % 2 == 0,
                              jnp.broadcast_to(yhi, (KF, NF)),
                              jnp.broadcast_to(ylo, (KF, NF))),
                    jnp.where((rr >= 12) & (rr < 15), jnp.float32(1.0),
                              jnp.float32(0.0))))
            rhs_fat = pick.astype(jnp.bfloat16)
        else:
            rhs_fat = jnp.where(
                srow == r0b, jnp.broadcast_to(xff, (KF, NF)),
                jnp.where(srow == r0b + 1, jnp.broadcast_to(yff, (KF, NF)),
                          jnp.where(srow == r0b + 2, jnp.float32(1.0),
                                    jnp.float32(0.0))))
    else:
        srow = jax.lax.broadcasted_iota(jnp.int32, (K, PX), 0)
        xfb = jnp.broadcast_to(xf, (K, PX))
        yfb = jnp.broadcast_to(yf, (K, PX))

        def rhs_for(p):
            r = 3 * p
            return jnp.where(
                srow == r, xfb,
                jnp.where(srow == r + 1, yfb,
                          jnp.where(srow == r + 2, jnp.float32(1.0),
                                    jnp.float32(0.0))))

        rhs = [rhs_for(p) for p in range(nplanes)]

    nchunks = jnp.where(end > start, pl.cdiv(end - start, chunk), 0)

    def chunk_slice(kc):
        return jnp.minimum(start + kc * chunk, e_cap - chunk)

    def mk_dma(slot, kc):
        return pltpu.make_async_copy(
            entries_ref.at[pl.ds(chunk_slice(kc), chunk), :],
            ebuf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        mk_dma(0, 0).start()

    BIG = jnp.float32(3.0e38)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def chunk_body(kc, carry):
        zbuf, obuf, owner, attrs, acc, thresh, alive = carry
        slot = jax.lax.rem(kc, 2)

        @pl.when(alive)
        def _():
            mk_dma(slot, kc).wait()

        ct = ebuf[slot]            # [chunk, 128] f32
        if exit_cross:
            # price the production exit structure: a per-chunk scalar
            # gate read from the staged chunk, the gated DMA chain, and
            # the per-chunk vector->scalar zbuf-max crossing.  The
            # synthetic threshold never fires (thresh starts at +BIG)
            # but is data-dependent so nothing folds away.
            zmin0 = jnp.max(ct[0:1, 23:24]) * jnp.float32(1e-30)
            proceed = alive & (zmin0 <= thresh)
        else:
            proceed = alive

        @pl.when(proceed & (kc + 1 < nchunks))
        def _():
            mk_dma(jax.lax.rem(kc + 1, 2), kc + 1).start()

        if split:
            lhs = ct[:, :64].astype(jnp.bfloat16)   # pre-split bf16 parts
        else:
            lhs = ct[:, :K]        # [chunk, K] static lane slice

        if fat:
            ev_fat = dot(lhs, rhs_fat)            # [chunk, nplanes*PX]
            ev = [ev_fat[:, p * PX:(p + 1) * PX] for p in range(nplanes)]
        else:
            ev = [dot(lhs, r) for r in rhs]

        if not do_ew:
            s = ev[0]
            for e in ev[1:]:
                s = jnp.minimum(s, e)
            return (zbuf, obuf, owner, attrs,
                    acc + jnp.min(s, axis=0, keepdims=True),
                    thresh, proceed)

        # per-entry scalar columns -> [chunk, 1] -> lane-broadcast
        meta = ct[:, 21:22].astype(jnp.int32)
        tl = meta >> 18
        order_c = ct[:, 22:23]
        e0, e1, e2, z = ev[0], ev[1], ev[2], ev[3]
        cov = (
            ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
            & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
            & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
        )
        zc = jnp.clip(z, 0.0, 1.0)
        zq = jnp.round(zc * 65535.0) * jnp.float32(1.0 / 65535.0)
        frag = cov & (z == zc)
        zmask = jnp.where(frag, zq, BIG)

        if not do_red:
            return (zbuf, obuf, owner, attrs,
                    acc + jnp.min(zmask, axis=0, keepdims=True)
                    + jnp.min(order_c, axis=0, keepdims=True)
                    * jnp.float32(1e-9), thresh, proceed)

        # 3-pass lexicographic (z asc, order desc=LE, idx desc) winner
        zwin = jnp.min(zmask, axis=0, keepdims=True)            # [1, PX]
        at_z = frag & (zq == jnp.broadcast_to(zwin, zq.shape))
        order_b = jnp.broadcast_to(order_c, zq.shape)
        owin = jnp.max(jnp.where(at_z, order_b, -BIG), axis=0,
                       keepdims=True)
        at_zo = at_z & (order_b == jnp.broadcast_to(owin, zq.shape))
        idx_c = (chunk_slice(kc)
                 + jax.lax.broadcasted_iota(jnp.int32, (chunk, PX), 0))
        iwin = jnp.max(jnp.where(at_zo, idx_c, -1), axis=0, keepdims=True)

        # merge with the carried winner (LE tie keeps the later chunk)
        beats = (zwin < zbuf) | ((zwin == zbuf) & (owin >= obuf))
        has = zwin < BIG
        upd = beats & has
        if exit_cross:
            upd = upd & proceed
        zbuf = jnp.where(upd, zwin, zbuf)
        obuf = jnp.where(upd, owin, obuf)
        owner = jnp.where(upd, iwin, owner)

        if do_attr:
            # winner attribute planes: matmul-evaluated, masked-sum select
            uw, vw, iw = ev[4], ev[5], ev[6]
            sel = at_zo.astype(jnp.float32)
            new_attrs = []
            for i, v in enumerate((uw, vw, iw)):
                s = jnp.sum(v * sel, axis=0, keepdims=True)
                new_attrs.append(jnp.where(upd, s, attrs[i]))
            texc = jnp.broadcast_to(
                (meta & ((1 << 18) - 1)).astype(jnp.float32), zq.shape)
            texs = jnp.sum(texc * sel, axis=0, keepdims=True)
            new_attrs.append(jnp.where(upd, texs, attrs[3]))
            attrs = tuple(new_attrs) + attrs[4:]
        elif do_attrc:
            # winner attribute COEFFICIENTS via masked sums: no attr
            # matmuls at all; planes evaluated once per tile at the end
            sel = at_zo.astype(jnp.float32)
            new_attrs = []
            for i, r in enumerate(range(12, 21)):       # iw,uw,vw a/b/c
                col = jnp.broadcast_to(ct[:, r:r + 1], zq.shape)
                s = jnp.sum(col * sel, axis=0, keepdims=True)
                new_attrs.append(jnp.where(upd, s, attrs[i]))
            texc = jnp.broadcast_to(
                (meta & ((1 << 18) - 1)).astype(jnp.float32), zq.shape)
            texs = jnp.sum(texc * sel, axis=0, keepdims=True)
            new_attrs.append(jnp.where(upd, texs, attrs[9]))
            attrs = tuple(new_attrs)
        if exit_cross:
            # the per-chunk vector->scalar crossing the production kernel
            # pays to maintain its exit threshold
            thresh = jnp.where(proceed,
                               jnp.minimum(jnp.max(zbuf), thresh), thresh)
        return zbuf, obuf, owner, attrs, acc, thresh, proceed

    row = lambda v, dt=jnp.float32: jnp.full((1, PX), v, dt)  # noqa: E731
    nattr = 10 if do_attrc else 4
    carry0 = (row(BIG), row(-BIG), row(-1, jnp.int32),
              tuple(row(0.0) for _ in range(nattr)), row(0.0),
              jnp.float32(BIG), nchunks > 0)
    zbuf, obuf, owner, attrs, acc, _, _ = jax.lax.fori_loop(
        0, nchunks, chunk_body, carry0)
    if do_attrc:
        # tile-end plane eval from the selected coefficients
        iwv = attrs[0] * xf + attrs[1] * yf + attrs[2]
        uwv = attrs[3] * xf + attrs[4] * yf + attrs[5]
        vwv = attrs[6] * xf + attrs[7] * yf + attrs[8]
        a4 = (uwv, vwv, iwv, attrs[9])
    else:
        a4 = attrs[:4]
    out_ref[0] = jnp.concatenate(
        [zbuf, obuf, owner.astype(jnp.float32), a4[0], a4[1], a4[2], a4[3],
         acc], axis=0)


@functools.partial(jax.jit, static_argnames=(
    "grid", "grid_w", "chunk", "precision", "nplanes", "tile_h",
    "fat", "do_ew", "do_red", "do_attr", "do_attrc", "split",
    "exit_cross"))
def run_mxu(entries, tile_start, *, grid, grid_w, chunk, precision,
            nplanes, tile_h, fat, do_ew, do_red, do_attr, do_attrc,
            split, exit_cross):
    PX = tile_h * TILE_W
    kernel = functools.partial(
        _mxu_kernel, chunk=chunk, e_cap=entries.shape[0], grid_w=grid_w,
        precision=precision, nplanes=nplanes, tile_h=tile_h, fat=fat,
        do_ew=do_ew, do_red=do_red, do_attr=do_attr, do_attrc=do_attrc,
        split=split, exit_cross=exit_cross)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, PX), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        out_shape=jax.ShapeDtypeStruct((grid, 8, PX), jnp.float32),
    )(tile_start, entries)


VARIANTS = {
    # name: dict of kernel options (defaults: highest, 4 planes, bare)
    "mm4_def": dict(precision="default"),
    "mm4_hst": dict(),
    "mm7_hst": dict(nplanes=7),
    "ew": dict(do_ew=True),
    "red": dict(do_ew=True, do_red=True),
    "full": dict(nplanes=7, do_ew=True, do_red=True, do_attr=True),
    # round 2: fat single-matmul variants
    "fat4_hst": dict(fat=True),
    "fat4_def": dict(fat=True, precision="default"),
    "fat7_hst": dict(fat=True, nplanes=7),
    "fatred": dict(fat=True, do_ew=True, do_red=True),
    "fatfull": dict(fat=True, nplanes=7, do_ew=True, do_red=True,
                    do_attr=True),
    "fatfullc": dict(fat=True, do_ew=True, do_red=True, do_attrc=True),
    # round 3: the exact bf16-split trick at DEFAULT precision
    "fatsplit": dict(fat=True, split=True, precision="default"),
    "fatsplitred": dict(fat=True, split=True, precision="default",
                        do_ew=True, do_red=True),
    "fatsplitfullc": dict(fat=True, split=True, precision="default",
                          do_ew=True, do_red=True, do_attrc=True),
    "fatsplit_exit": dict(fat=True, split=True, precision="default",
                          do_ew=True, do_red=True, do_attrc=True,
                          exit_cross=True),
}


def main():
    sel = [a for a in sys.argv[1:] if "=" not in a] or [
        "prodlike", "fat4_hst", "fat4_def", "fat7_hst", "fatred",
        "fatfull", "fatfullc",
    ]
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    seg = int(kv.get("seg", 256))
    frames = int(kv.get("frames", 8))
    chunk = int(kv.get("chunk", 128))
    tile_h = int(kv.get("tile_h", 16))

    fb_w, fb_h = 1920, 1080
    grid_w = -(-fb_w // TILE_W)
    grid_h = -(-fb_h // tile_h)
    grid = grid_w * grid_h
    e_cap = max(1 << 19, ((grid * seg + chunk - 1) // chunk) * chunk)
    print(f"grid={grid_h}x{grid_w}={grid} seg={seg} chunk={chunk} "
          f"tile_h={tile_h} e_cap={e_cap} "
          f"entries_visited={grid * seg}", flush=True)

    rng = np.random.default_rng(0)
    ent = rng.standard_normal((e_cap, 128), dtype=np.float32)
    ent[:, 21] = rng.integers(0, 8, e_cap) << 18
    ent[:, 22] = rng.integers(0, 4096, e_cap)
    ent = jnp.asarray(ent)
    ts_full = jnp.minimum(
        jnp.arange(grid + 1, dtype=jnp.int32) * seg, e_cap)
    ts_tiny = jnp.minimum(
        jnp.arange(grid + 1, dtype=jnp.int32) * chunk, e_cap)

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *args, **kw):
        # tiny-grid compile probe first: catches Mosaic lowering errors in
        # seconds instead of burning a full-scale compile
        try:
            t0 = time.perf_counter()
            sync(fn(*args, **{**kw, "grid": 4}))
            print(f"  [{name}] tiny-compile ok "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:
            print(f"  [{name}] TINY-COMPILE FAIL: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return
        sync(fn(*args, **kw))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        per_entry = dt / (grid * seg) * 1e9
        print(f"{name:14s} {dt * 1000:9.2f} ms   {per_entry:7.2f} ns/entry",
              flush=True)

    for name in sel:
        if name == "prodlike":
            import importlib.util
            spec = importlib.util.spec_from_file_location(
                "exp_visibility",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "exp_visibility.py"))
            ev = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(ev)
            from tyleri_tpu.ops import setup as S
            depth0 = jnp.ones((fb_h, fb_w), jnp.float32)
            scissor = jnp.asarray([0, 0, fb_w, fb_h], jnp.int32)
            nbroad = jnp.zeros((), jnp.int32)
            ent24 = ent[:, :S.NUM_CHANNELS]

            def run_prod(entries, tile_start, *, grid, **_):
                ts = ts_tiny if grid == 4 else tile_start
                return ev.run_variant(
                    entries, ts, nbroad, depth0, scissor,
                    fb_w=fb_w, fb_h=fb_h, tile_w=TILE_W, tile_h=tile_h,
                    grid_w=grid_w, grid_h=grid_h, chunk=chunk, unroll=4,
                    strip_attrs=False, hoist_loads=False, lex=True)

            timeit("prodlike", run_prod, ent24, ts_full, grid=grid)
            continue
        opts = dict(precision="highest", nplanes=4, tile_h=tile_h,
                    fat=False, do_ew=False, do_red=False, do_attr=False,
                    do_attrc=False, split=False, exit_cross=False)
        opts.update(VARIANTS[name])
        opts["tile_h"] = tile_h
        timeit(name, run_mxu, ent, ts_full, grid=grid, grid_w=grid_w,
               chunk=chunk, **opts)


if __name__ == "__main__":
    main()
