"""Visibility-kernel variant experiments on the config5 workload (TPU).

Builds the sponza binned-entry table once, then times kernel variants:
tile geometry (rebinned), DMA chunk, unroll width, and cost-decomposition
ablations (hoisted scalar loads / stripped attribute planes — WRONG results,
timing only). Directs optimization of ops/raster_pallas.py.

    python tools/exp_visibility.py [variants...]
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

from tyleri_tpu.ops import setup as S
from tyleri_tpu.pipeline.state import DepthState


def _variant_kernel(
    tile_start_ref, scissor_ref, nbroad_ref,
    entries_ref, depth_init_ref,
    owner_ref, z_ref, order_ref, uw_ref, vw_ref, iw_ref, tex_ref,
    ebuf, sem,
    *, tile_w, tile_h, grid_w, chunk, e_cap,
    unroll=4, strip_attrs=False, hoist_loads=False,
    lex=False,        # production tie-break compare (order channel)
    zmax_carry=False,  # per-chunk tile-zmax reduce carried as a scalar
    cond_dma=False,    # DMA start/wait gated on the carried alive flag
    exit_test=False,   # full production early exit (implies the other 3)
    exit_while=False,  # early exit via lax.while_loop: dead chunks never
                       # iterate (no scaffolding, no zmax on dead chunks)
    lag2=False,        # gate chunk k with the zmax from chunk k-2: hides
                       # the vector->scalar reduce crossing behind a full
                       # chunk of work (still exact: older zmax >= current)
    dynroll=False,     # coefficients via a dynamic SUBLANE slice of a VMEM
                       # chunk ([unroll, 128] per group) + static [1,1]
                       # element broadcasts, replacing the ~23 SMEM scalar
                       # loads per entry (measured ~70% of kernel time)
    e2_stored=False,   # round-5 A/B baseline: evaluate e2 as a stored
                       # 3-coefficient plane (the pre-round-5 formulation;
                       # the harness refills table cols 6..8 with derived
                       # coefficients) instead of e2 = (|2A| - e0) - e1
):
    if exit_while:
        exit_test = True
        cond_dma = True
    if exit_test:
        # exit needs the lex compare + the carried threshold; the DMA chain
        # may stay unconditional (speculative prefetch of chunks the exit
        # will skip) — pass cond_dma=True for the production gating
        lex = zmax_carry = True
    gy = pl.program_id(0)
    gx = pl.program_id(1)
    t = gy * grid_w + gx
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]

    xcb = gx * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    xf = xcb.astype(jnp.float32) + 0.5
    in_sc = (
        (xcb >= scissor_ref[0]) & (xcb < scissor_ref[0] + scissor_ref[2])
    )
    yc = gy * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    in_sc = in_sc & (yc >= scissor_ref[1]) & (yc < scissor_ref[1] + scissor_ref[3])
    yf = yc.astype(jnp.float32) + 0.5

    def resolve_entry(coeff, eid, live, st):
        zbuf, owner, obuf, uwb, vwb, iwb, texb = st

        def plane(row):
            return coeff(row) * xf + coeff(row + 1) * yf + coeff(row + 2)

        meta = coeff(S.CH_META).astype(jnp.int32)
        tl = meta >> S.META_TEX_BITS
        e0 = plane(S.CH_E0)
        e1 = plane(S.CH_E1)
        if e2_stored:
            e2 = plane(S.CH_TWOA)  # 3-load stored plane (round-4 baseline)
        else:
            e2 = (coeff(S.CH_TWOA) - e0) - e1  # derived (production)
        cov = (
            ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
            & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
            & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
        )
        z = plane(S.CH_Z)
        zc = jnp.clip(z, 0.0, 1.0)
        zq = jnp.round(zc * 65535.0) * (1.0 / 65535.0)
        frag = cov & (z == zc) & in_sc & live
        if lex:
            order = coeff(S.CH_ORDER)
            passing = frag & ((zq < zbuf) | ((zq == zbuf) & (order >= obuf)))
        else:
            passing = frag & (zq <= zbuf)
        zbuf = jnp.where(passing, zq, zbuf)
        owner = jnp.where(passing, eid, owner)
        if not strip_attrs:
            obuf = jnp.where(
                passing, order if lex else coeff(S.CH_ORDER), obuf)
            uwb = jnp.where(passing, plane(S.CH_UW), uwb)
            vwb = jnp.where(passing, plane(S.CH_VW), vwb)
            iwb = jnp.where(passing, plane(S.CH_INVW), iwb)
            texb = jnp.where(
                passing, jnp.full_like(texb, 0) + (meta & S.META_TEX_MASK), texb
            )
        return zbuf, owner, obuf, uwb, vwb, iwb, texb

    state0 = (
        depth_init_ref[:],
        jnp.full((tile_h, tile_w), -1, jnp.int32),
        jnp.full((tile_h, tile_w), -1.0, jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.ones((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.int32),
    )

    base = start - jax.lax.rem(start, chunk)
    nchunks = jnp.where(end > start, pl.cdiv(end - base, chunk), 0)

    def chunk_slice(k):
        s = jnp.minimum(base + k * chunk, e_cap - chunk)
        return pl.multiple_of(s, chunk)

    def start_dma(slot, k):
        return pltpu.make_async_copy(
            entries_ref.at[pl.ds(chunk_slice(k), chunk), :],
            ebuf.at[slot], sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        start_dma(0, 0).start()

    def tile_zmax(st):
        return jnp.max(st[0])

    inv_q = jnp.float32(1.0 / 65535.0)

    def chunk_body(k, carry):
        if zmax_carry and lag2:
            state, thresh, thresh1, alive = carry
        elif zmax_carry:
            state, thresh, alive = carry
        else:
            state, alive = carry, True
        slot = jax.lax.rem(k, 2)

        if cond_dma:
            @pl.when(alive)
            def _():
                start_dma(slot, k).wait()
        else:
            start_dma(slot, k).wait()

        s = chunk_slice(k)
        if exit_test:
            idx0 = jnp.maximum(start - s, 0)
            zmin0 = ebuf[slot, idx0, S.CH_ZMIN] * inv_q
            proceed = alive & (zmin0 <= thresh)
        elif cond_dma:
            # data-dependent but always-true gate: isolates the gating
            # structure's cost without actually skipping work
            proceed = alive & (thresh > -1.0)
        else:
            proceed = alive if zmax_carry else True

        if cond_dma:
            @pl.when(proceed & (k + 1 < nchunks))
            def _():
                start_dma(jax.lax.rem(k + 1, 2), k + 1).start()
        else:
            @pl.when(k + 1 < nchunks)
            def _():
                start_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        n_here = jnp.clip(end - s, 0, chunk)
        if exit_test:
            n_here = jnp.where(proceed, n_here, 0)

        def bc_lane(v):
            # +0.0 forces a real [1, tile_w] vreg (Mosaic NYI: both-axis
            # broadcast; a bare broadcast chain folds back into it)
            return v + jnp.zeros((1, tile_w), jnp.float32)

        def entry_body(jj, inner):
            j = jj * unroll
            idx = s + j
            if dynroll:
                g = ebuf[slot, pl.ds(j, unroll), :]   # [unroll, 128] vregs
            for u in range(unroll):
                live_u = (idx + u >= start) & (idx + u < end)
                if dynroll:
                    c_u = lambda row, u=u: bc_lane(g[u:u + 1, row:row + 1])  # noqa: E731
                elif hoist_loads:
                    c_u = lambda row: ebuf[slot, 0, row]  # noqa: E731
                else:
                    c_u = lambda row, u=u: ebuf[slot, j + u, row]  # noqa: E731
                inner = resolve_entry(c_u, idx + u, live_u, inner)
            return inner

        state = jax.lax.fori_loop(
            0, (n_here + unroll - 1) // unroll, entry_body, state
        )
        if zmax_carry and lag2:
            new_zm = jnp.where(proceed, tile_zmax(state), thresh1)
            return state, thresh1, new_zm, (proceed if exit_test else alive)
        if zmax_carry:
            thresh = jnp.where(proceed, tile_zmax(state), thresh) \
                if exit_test else tile_zmax(state)
            return state, thresh, (proceed if exit_test else alive)
        return state

    if exit_while:
        # alive(k) implies DMA(k) was started: k=0 by the prologue, k>0 by
        # body k-1 under the same predicate that set alive
        def w_cond(c):
            if lag2:
                k, alive, state, thresh, thresh1 = c
            else:
                k, alive, state, thresh = c
            return alive

        def w_body(c):
            if lag2:
                k, alive, state, thresh, thresh1 = c
            else:
                k, alive, state, thresh = c
            slot = jax.lax.rem(k, 2)
            start_dma(slot, k).wait()
            s = chunk_slice(k)
            idx0 = jnp.maximum(start - s, 0)
            zmin0 = ebuf[slot, idx0, S.CH_ZMIN] * inv_q
            proceed = zmin0 <= thresh

            @pl.when(proceed & (k + 1 < nchunks))
            def _():
                start_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            n_here = jnp.where(proceed, jnp.clip(end - s, 0, chunk), 0)

            def entry_body(jj, inner):
                j = jj * unroll
                idx = s + j
                for u in range(unroll):
                    live_u = (idx + u >= start) & (idx + u < end)
                    c_u = lambda row, u=u: ebuf[slot, j + u, row]  # noqa: E731
                    inner = resolve_entry(c_u, idx + u, live_u, inner)
                return inner

            state = jax.lax.fori_loop(
                0, (n_here + unroll - 1) // unroll, entry_body, state)
            alive2 = proceed & (k + 1 < nchunks)
            if lag2:
                return k + 1, alive2, state, thresh1, tile_zmax(state)
            thresh = jnp.where(proceed, tile_zmax(state), thresh)
            return k + 1, alive2, state, thresh

        if lag2:
            _, _, state, _, _ = jax.lax.while_loop(
                w_cond, w_body, (jnp.int32(0), nchunks > 0, state0,
                                 tile_zmax(state0), tile_zmax(state0)))
        else:
            _, _, state, _ = jax.lax.while_loop(
                w_cond, w_body, (jnp.int32(0), nchunks > 0, state0,
                                 tile_zmax(state0)))
    elif zmax_carry and lag2:
        state, _, _, _ = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (state0, tile_zmax(state0), tile_zmax(state0), nchunks > 0))
    elif zmax_carry:
        state, _, _ = jax.lax.fori_loop(
            0, nchunks, chunk_body,
            (state0, tile_zmax(state0), nchunks > 0))
    else:
        state = jax.lax.fori_loop(0, nchunks, chunk_body, state0)

    zbuf, owner, obuf, uwb, vwb, iwb, texb = state
    owner_ref[...] = owner
    z_ref[...] = zbuf
    order_ref[...] = obuf
    uw_ref[...] = uwb
    vw_ref[...] = vwb
    iw_ref[...] = iwb
    tex_ref[...] = texb


@functools.partial(
    jax.jit,
    static_argnames=("fb_w", "fb_h", "tile_w", "tile_h", "grid_w", "grid_h",
                     "chunk", "unroll", "strip_attrs", "hoist_loads",
                     "lex", "zmax_carry", "cond_dma", "exit_test",
                     "exit_while", "lag2", "dynroll", "e2_stored"),
)
def run_variant(binned_rm, tile_start, num_broad, init_depth, scissor, *,
                fb_w, fb_h, tile_w, tile_h, grid_w, grid_h, chunk,
                unroll, strip_attrs, hoist_loads,
                lex=False, zmax_carry=False, cond_dma=False,
                exit_test=False, exit_while=False, lag2=False,
                dynroll=False, e2_stored=False):
    e_cap = binned_rm.shape[0]
    pad_h = grid_h * tile_h
    pad_w = grid_w * tile_w
    depth0 = jnp.pad(
        init_depth.astype(jnp.float32),
        ((0, pad_h - fb_h), (0, pad_w - fb_w)),
        constant_values=jnp.float32(-jnp.inf),
    )
    kernel = functools.partial(
        _variant_kernel,
        tile_w=tile_w, tile_h=tile_h, grid_w=grid_w, chunk=chunk, e_cap=e_cap,
        unroll=unroll, strip_attrs=strip_attrs, hoist_loads=hoist_loads,
        lex=lex, zmax_carry=zmax_carry, cond_dma=cond_dma, exit_test=exit_test,
        exit_while=exit_while, lag2=lag2, dynroll=dynroll,
        e2_stored=e2_stored,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_h, grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ],
        scratch_shapes=[
            (pltpu.VMEM if dynroll else pltpu.SMEM)(
                (2, chunk, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    binned_rm = jnp.pad(binned_rm, ((0, 0), (0, 128 - S.NUM_CHANNELS)))
    outs = pl.pallas_call(
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
    )(tile_start, scissor, num_broad.reshape(1), binned_rm, depth0)
    return outs


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.binning import bin_triangles
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    frames = int(os.environ.get("FRAMES", "4"))
    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device)
    rig = scenelib.config5_sponza(device)
    print("scene:", rig.name, "tris:", rig.triangle_count)

    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0, rig.resolution)
    )
    (texels, toff, tw, th, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex, *_rest) = arrays
    r = rf.plan.raster
    fb_w, fb_h = r.fb_w, r.fb_h

    mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                      precision=jax.lax.Precision.HIGHEST)
    clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
    ct = near_clip_triangles(clip, uv3, tri_tex[0],
                             tri_valid0[0] & cam_valid[0], extra_cap=r.clip_cap)

    depth0 = jnp.ones((fb_h, fb_w), jnp.float32)

    def bin_for(tile_h, tile_w=128):
        grid_w = -(-fb_w // tile_w)
        grid_h = -(-fb_h // tile_h)
        su = setup_triangles(ct.clip, ct.uv, ct.tex_id, ct.valid,
                             viewports[0], scissors[0],
                             tile_w=tile_w, tile_h=tile_h,
                             grid_w=grid_w, grid_h=grid_h, order=ct.order)
        b = bin_triangles(su, grid_w=grid_w, grid_h=grid_h,
                          entry_cap=r.entry_cap,
                          max_tiles_per_tri=r.max_tiles_per_tri,
                          broad_cap=r.broad_cap, spill_cap=r.spill_cap)
        return jax.block_until_ready(b), grid_w, grid_h

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

    def timeit(name, fn, *args, **kw):
        sync(fn(*args, **kw))
        t0 = time.perf_counter()
        for _ in range(frames):
            out = fn(*args, **kw)
        sync(out)
        dt = (time.perf_counter() - t0) / frames
        print(f"{name:44s} {dt * 1000:9.2f} ms", flush=True)
        return dt

    cache = {}

    def prod(name, tile_h=16, chunk=128):
        """Time the PRODUCTION kernel (with its front-to-back early exit)."""
        from tyleri_tpu.ops.raster_pallas import rasterize_visibility_pallas
        from tyleri_tpu.pipeline.state import MESH_PIPELINE_STATE
        if tile_h not in cache:
            cache[tile_h] = bin_for(tile_h)
        b, grid_w, grid_h = cache[tile_h]
        print(f"[{name}] entries={int(b.num_entries)}", flush=True)
        _, _, nvis = rasterize_visibility_pallas(
            b, depth0, scissors[0],
            fb_w=fb_w, fb_h=fb_h, tile_w=128, tile_h=tile_h,
            grid_w=grid_w, grid_h=grid_h, chunk=chunk,
            depth_state=MESH_PIPELINE_STATE.depth, debug_counts=True)
        print(f"[{name}] visited={int(jnp.sum(nvis))} "
              f"(incl. chunk-align lead slots)", flush=True)
        timeit(name, rasterize_visibility_pallas, b, depth0, scissors[0],
               fb_w=fb_w, fb_h=fb_h, tile_w=128, tile_h=tile_h,
               grid_w=grid_w, grid_h=grid_h, chunk=chunk,
               depth_state=MESH_PIPELINE_STATE.depth)

    def variant(name, tile_h=16, chunk=128, unroll=4,
                strip_attrs=False, hoist_loads=False, empty=False,
                seg=0, lex=False, zmax_carry=False, cond_dma=False,
                exit_test=False, exit_while=False, lag2=False,
                dynroll=False, e2_stored=False):
        if tile_h not in cache:
            cache[tile_h] = bin_for(tile_h)
        b, grid_w, grid_h = cache[tile_h]
        table = b.entry_channels
        if e2_stored:
            # refill the freed CH_TWOA rows with the stored-plane e2
            # coefficients (a2 = -(a0+a1), b2 = -(b0+b1), c2 = 2A-c0-c1)
            # so the baseline kernel's 3-load plane eval is load-faithful
            a2 = -(table[:, 0] + table[:, 3])
            b2 = -(table[:, 1] + table[:, 4])
            c2 = table[:, 6] - table[:, 2] - table[:, 5]
            table = table.at[:, 6].set(a2).at[:, 7].set(b2).at[:, 8].set(c2)
            table = jax.block_until_ready(table)
        tile_start = b.tile_start
        nbroad = b.num_broad
        if empty:
            # all segments empty: measures the pure per-grid-step cost
            # (state init, output writes, loop scaffolding)
            tile_start = jnp.zeros_like(b.tile_start)
            nbroad = jnp.zeros_like(b.num_broad)
        elif seg:
            # exactly `seg` live entries per tile: per-entry cost at a
            # uniform load with no early-exit variance
            tile_start = jnp.minimum(
                jnp.arange(grid_w * grid_h + 1, dtype=jnp.int32) * seg,
                b.entry_channels.shape[0])
            nbroad = jnp.zeros_like(b.num_broad)
        print(f"[{name}] entries={int(b.num_entries)}", flush=True)
        timeit(name, run_variant, table, tile_start,
               nbroad, depth0, scissors[0],
               fb_w=fb_w, fb_h=fb_h, tile_w=128, tile_h=tile_h,
               grid_w=grid_w, grid_h=grid_h, chunk=chunk, unroll=unroll,
               strip_attrs=strip_attrs, hoist_loads=hoist_loads,
               lex=lex, zmax_carry=zmax_carry, cond_dma=cond_dma,
               exit_test=exit_test, exit_while=exit_while, lag2=lag2,
               dynroll=dynroll, e2_stored=e2_stored)

    sel = sys.argv[1:] or [
        "base", "th8", "th32", "chunk256", "unroll8",
        "strip_attrs", "hoist", "hoist_strip",
    ]
    runs = {
        "base": dict(),
        "lex": dict(lex=True),
        "zmax": dict(zmax_carry=True),
        "zmaxdma": dict(zmax_carry=True, cond_dma=True),
        "exit": dict(exit_test=True, cond_dma=True),
        "exitspec": dict(exit_test=True),
        "exit2": dict(exit_test=True, cond_dma=True, lag2=True),
        "exitw2": dict(exit_while=True, lag2=True),
        "exitw": dict(exit_while=True),
        "e2stored": dict(exit_test=True, cond_dma=True, e2_stored=True),
        "e2derived": dict(exit_test=True, cond_dma=True),
        "th8": dict(tile_h=8),
        "th32": dict(tile_h=32),
        "chunk256": dict(chunk=256),
        "unroll8": dict(unroll=8),
        "unroll2": dict(unroll=2),
        "strip_attrs": dict(strip_attrs=True),
        "hoist": dict(hoist_loads=True),
        "hoist_strip": dict(hoist_loads=True, strip_attrs=True),
        # (dynroll + exit runs through PRODUCTION via ab_flags: the exit
        # gate needs the SMEM-staged zmin row the production kernel has)
        "dynroll": dict(dynroll=True),
        "dynroll8": dict(dynroll=True, unroll=8),
        "th32c256": dict(tile_h=32, chunk=256),
        "th32c512": dict(tile_h=32, chunk=512),
        "th32c256u2": dict(tile_h=32, chunk=256, unroll=2),
        "th32c256u8": dict(tile_h=32, chunk=256, unroll=8),
        "th32c128u8": dict(tile_h=32, chunk=128, unroll=8),
        "th16c128u8": dict(tile_h=16, chunk=128, unroll=8),
        "th16c256u4": dict(tile_h=16, chunk=256, unroll=4),
        "th8c128u4": dict(tile_h=8, chunk=128, unroll=4),
        "th8c128u8": dict(tile_h=8, chunk=128, unroll=8),
        "th16c128u2": dict(tile_h=16, chunk=128, unroll=2),
        "th64c256": dict(tile_h=64, chunk=256),
        "c512": dict(chunk=512),
        "th32hoist": dict(tile_h=32, chunk=256, hoist_loads=True),
        "empty": dict(empty=True),
        "empty_th32": dict(empty=True, tile_h=32),
        "empty_th64": dict(empty=True, tile_h=64),
        "seg32": dict(seg=32),
        "seg64": dict(seg=64),
        "seg128": dict(seg=128),
        "seg256": dict(seg=256),
    }
    for name in sel:
        if name.startswith("packed5"):
            b, grid_w, grid_h = cache.setdefault(16, bin_for(16))
            packed = jax.block_until_ready(jax.jit(pack5)(b.entry_channels))
            print(f"[{name}] entries={int(b.num_entries)} "
                  f"packed_rows={packed.shape[0]}", flush=True)
            timeit(name, run_packed, packed, b.tile_start, b.num_broad,
                   depth0, scissors[0], fb_w=fb_w, fb_h=fb_h,
                   tile_w=128, tile_h=16, grid_w=grid_w, grid_h=grid_h,
                   exit_test="noexit" not in name, lag2="lag2" in name)
            continue
        if name.startswith("prod"):
            kw = {}
            if "c64" in name:
                kw["chunk"] = 64
            if "c32" in name:
                kw["chunk"] = 32
            prod(name, **kw)
        else:
            variant(name, **runs[name])


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Packed-5 table variant: 5 entries per 128-lane row (24 channels each, lanes
# 0..119 live).  The binning gather builds it from 5 interleaved gathers +
# lane concat — writes [E/5,128] (~121 MB at 1.18M entries) instead of the
# lane-padded [E,128] (~604 MB), and the kernel DMAs 5x fewer bytes.  DMA
# windows cover whole packed rows (ROWS_PER_WIN), so with UNROLL=5 every
# entry's lane offset is STATIC; up to 4 dead lead entries mask out.
# ---------------------------------------------------------------------------
PACK = 5
ROWS_PER_WIN = 26          # 130 entries per window
ENT_PER_WIN = PACK * ROWS_PER_WIN


def _packed_kernel(
    tile_start_ref, scissor_ref, nbroad_ref,
    entries_ref,    # f32 [Ep, 128] packed rows
    depth_init_ref,
    owner_ref, z_ref, order_ref, uw_ref, vw_ref, iw_ref, tex_ref,
    ebuf, sem,
    *, tile_w, tile_h, grid_w, e_rows,
    exit_test=True, lag2=False,
):
    gy = pl.program_id(0)
    gx = pl.program_id(1)
    t = gy * grid_w + gx
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]

    xcb = gx * tile_w + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    xf = xcb.astype(jnp.float32) + 0.5
    in_sc = (xcb >= scissor_ref[0]) & (xcb < scissor_ref[0] + scissor_ref[2])
    yc = gy * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    in_sc = in_sc & (yc >= scissor_ref[1]) & (yc < scissor_ref[1] + scissor_ref[3])
    yf = yc.astype(jnp.float32) + 0.5

    def resolve_entry(coeff, eid, live, st):
        zbuf, owner, obuf, uwb, vwb, iwb, texb = st

        def plane(row):
            return coeff(row) * xf + coeff(row + 1) * yf + coeff(row + 2)

        meta = coeff(S.CH_META).astype(jnp.int32)
        tl = meta >> S.META_TEX_BITS
        e0 = plane(S.CH_E0)
        e1 = plane(S.CH_E1)
        if e2_stored:
            e2 = plane(S.CH_TWOA)  # 3-load stored plane (round-4 baseline)
        else:
            e2 = (coeff(S.CH_TWOA) - e0) - e1  # derived (production)
        cov = (
            ((e0 > 0) | ((e0 == 0) & ((tl & 1) > 0)))
            & ((e1 > 0) | ((e1 == 0) & ((tl & 2) > 0)))
            & ((e2 > 0) | ((e2 == 0) & ((tl & 4) > 0)))
        )
        z = plane(S.CH_Z)
        zc = jnp.clip(z, 0.0, 1.0)
        zq = jnp.round(zc * 65535.0) * (1.0 / 65535.0)
        frag = cov & (z == zc) & in_sc & live
        order = coeff(S.CH_ORDER)
        passing = frag & ((zq < zbuf) | ((zq == zbuf) & (order >= obuf)))
        zbuf = jnp.where(passing, zq, zbuf)
        owner = jnp.where(passing, eid, owner)
        obuf = jnp.where(passing, order, obuf)
        uwb = jnp.where(passing, plane(S.CH_UW), uwb)
        vwb = jnp.where(passing, plane(S.CH_VW), vwb)
        iwb = jnp.where(passing, plane(S.CH_INVW), iwb)
        texb = jnp.where(
            passing, jnp.full_like(texb, 0) + (meta & S.META_TEX_MASK), texb)
        return zbuf, owner, obuf, uwb, vwb, iwb, texb

    state0 = (
        depth_init_ref[:],
        jnp.full((tile_h, tile_w), -1, jnp.int32),
        jnp.full((tile_h, tile_w), -1.0, jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.float32),
        jnp.ones((tile_h, tile_w), jnp.float32),
        jnp.zeros((tile_h, tile_w), jnp.int32),
    )

    r0 = start // PACK            # first packed row
    e_base = r0 * PACK            # first entry covered by window 0
    nwin = jnp.where(end > start, pl.cdiv(end - e_base, ENT_PER_WIN), 0)

    def win_rows(k):
        return jnp.minimum(r0 + k * ROWS_PER_WIN, e_rows - ROWS_PER_WIN)

    def start_dma(slot, k):
        return pltpu.make_async_copy(
            entries_ref.at[pl.ds(win_rows(k), ROWS_PER_WIN), :],
            ebuf.at[slot], sem.at[slot],
        )

    @pl.when(nwin > 0)
    def _():
        start_dma(0, 0).start()

    def tile_zmax(st):
        return jnp.max(st[0])

    inv_q = jnp.float32(1.0 / 65535.0)

    def win_body(k, carry):
        if lag2:
            state, thresh, thresh1, alive = carry
        else:
            state, thresh, alive = carry
        slot = jax.lax.rem(k, 2)

        @pl.when(alive)
        def _():
            start_dma(slot, k).wait()

        ew0 = win_rows(k) * PACK           # first entry in the buffer
        j0 = jnp.maximum(start - ew0, 0)   # first live entry's buffer index
        zmin0 = ebuf[slot, j0 // PACK,
                     24 * jax.lax.rem(j0, PACK) + S.CH_ZMIN] * inv_q
        proceed = alive & (zmin0 <= thresh) if exit_test else alive

        @pl.when(proceed & (k + 1 < nwin))
        def _():
            start_dma(jax.lax.rem(k + 1, 2), k + 1).start()

        n_here = jnp.clip(end - ew0, 0, ENT_PER_WIN)
        if exit_test:
            n_here = jnp.where(proceed, n_here, 0)

        def entry_body(jj, inner):
            idx = ew0 + jj * PACK
            for u in range(PACK):
                live_u = (idx + u >= start) & (idx + u < end)
                c_u = lambda row, u=u: ebuf[slot, jj, 24 * u + row]  # noqa: E731
                inner = resolve_entry(c_u, idx + u, live_u, inner)
            return inner

        state = jax.lax.fori_loop(
            0, (n_here + PACK - 1) // PACK, entry_body, state)
        if lag2:
            new_zm = jnp.where(proceed, tile_zmax(state), thresh1)
            return state, thresh1, new_zm, proceed
        thresh = jnp.where(proceed, tile_zmax(state), thresh)
        return state, thresh, proceed

    if lag2:
        state, _, _, _ = jax.lax.fori_loop(
            0, nwin, win_body,
            (state0, tile_zmax(state0), tile_zmax(state0), nwin > 0))
    else:
        state, _, _ = jax.lax.fori_loop(
            0, nwin, win_body, (state0, tile_zmax(state0), nwin > 0))

    zbuf, owner, obuf, uwb, vwb, iwb, texb = state
    owner_ref[...] = owner
    z_ref[...] = zbuf
    order_ref[...] = obuf
    uw_ref[...] = uwb
    vw_ref[...] = vwb
    iw_ref[...] = iwb
    tex_ref[...] = texb


def pack5(entry_channels):
    """[E,24] -> packed [ceil(E/5)+pad, 128] (5 interleaved gathers' layout,
    built here by reshape for the harness; the fused frame would emit it
    straight from the binning gather)."""
    E = entry_channels.shape[0]
    Ep = -(-E // PACK)
    pad_e = Ep * PACK - E
    t = jnp.pad(entry_channels, ((0, pad_e), (0, 0)))
    t = t.reshape(Ep, PACK * S.NUM_CHANNELS)
    t = jnp.pad(t, ((0, 0), (0, 128 - PACK * S.NUM_CHANNELS)))
    # window DMA clamp needs ROWS_PER_WIN slack
    return jnp.pad(t, ((0, ROWS_PER_WIN), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=("fb_w", "fb_h", "tile_w", "tile_h", "grid_w", "grid_h",
                     "exit_test", "lag2"),
)
def run_packed(packed, tile_start, num_broad, init_depth, scissor, *,
               fb_w, fb_h, tile_w, tile_h, grid_w, grid_h,
               exit_test=True, lag2=False):
    e_rows = packed.shape[0]
    pad_h = grid_h * tile_h
    pad_w = grid_w * tile_w
    depth0 = jnp.pad(
        init_depth.astype(jnp.float32),
        ((0, pad_h - fb_h), (0, pad_w - fb_w)),
        constant_values=jnp.float32(-jnp.inf),
    )
    kernel = functools.partial(
        _packed_kernel, tile_w=tile_w, tile_h=tile_h, grid_w=grid_w,
        e_rows=e_rows, exit_test=exit_test, lag2=lag2,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_h, grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM)
            for _ in range(7)
        ],
        scratch_shapes=[
            pltpu.SMEM((2, ROWS_PER_WIN, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.float32),
            jax.ShapeDtypeStruct((pad_h, pad_w), jnp.int32),
        ],
    )(tile_start, scissor, num_broad.reshape(1), packed, depth0)
    return outs
