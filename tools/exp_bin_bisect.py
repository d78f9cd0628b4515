"""Bisect the bin_triangles composition penalty on config5 (TPU).

Variants of the full pipeline with single blocks removed/stubbed, to find
which interaction costs ~35 ms over the piecewise sum.
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

from tyleri_tpu.ops import setup as S


def build_su():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0, rig.resolution)
    )
    (texels, toff, tw_, th_, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex, *_rest) = arrays
    r = rf.plan.raster
    mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                      precision=jax.lax.Precision.HIGHEST)
    clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
    ct = near_clip_triangles(clip, uv3, tri_tex[0],
                             tri_valid0[0] & cam_valid[0], extra_cap=r.clip_cap)
    su = jax.block_until_ready(setup_triangles(
        ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0], scissors[0],
        tile_w=r.tile_w, tile_h=r.tile_h, grid_w=r.grid_w, grid_h=r.grid_h,
        order=ct.order))
    return su, r


def variant(su, *, grid_w, grid_h, entry_cap, K, spill_cap, broad_cap,
            with_broad=True, with_stats=True, with_gather=True,
            with_sort=True, real_tri_operand=True):
    T = su.valid.shape[0]
    ntiles = grid_w * grid_h
    tx0 = su.tile_lo[:, 0]; ty0 = su.tile_lo[:, 1]
    tx1 = su.tile_hi[:, 0]; ty1 = su.tile_hi[:, 1]
    tw = jnp.maximum(tx1 - tx0 + 1, 0)
    th = jnp.maximum(ty1 - ty0 + 1, 0)
    ncover = jnp.where(su.valid, tw * th, 0)
    is_broad = su.valid & (ncover > K)
    is_narrow = su.valid & (ncover <= K) & (ncover > 0)

    out = []
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    order_int = su.channels[:, S.CH_ORDER].astype(jnp.int32)
    dense_tile = jnp.where(is_narrow, ty0 * grid_w + tx0, jnp.int32(ntiles))
    counts = jnp.where(is_narrow, ncover - 1, 0)
    total_spill = jnp.sum(counts)
    spill_tri = jnp.repeat(tri_ids, counts,
                           total_repeat_length=spill_cap).astype(jnp.int32)
    sidx = jnp.arange(spill_cap, dtype=jnp.int32)
    spill_live = sidx < jnp.minimum(total_spill, spill_cap)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), spill_tri[1:] != spill_tri[:-1]])
    seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
    rank = sidx - seg_start
    bbox_tbl = jnp.concatenate(
        [tx0[:, None], ty0[:, None], jnp.maximum(tw, 1)[:, None],
         order_int[:, None]], axis=1).astype(jnp.int32)
    ebox = bbox_tbl[spill_tri]
    twr = ebox[:, 2]
    cidx = rank + 1
    ctx = ebox[:, 0] + cidx % twr
    cty = ebox[:, 1] + cidx // twr
    spill_tile = jnp.where(spill_live, cty * grid_w + ctx,
                           jnp.int32(ntiles)).astype(jnp.int32)
    spill_order = ebox[:, 3]

    all_tile = jnp.concatenate([dense_tile, spill_tile])
    all_order = jnp.concatenate([order_int, spill_order])
    if real_tri_operand:
        all_tri = jnp.concatenate([tri_ids, spill_tri])
    else:
        all_tri = jnp.concatenate([tri_ids, sidx])

    if with_sort:
        order_bits = int(max(T - 1, 1)).bit_length()
        key = (all_tile.astype(jnp.uint32) << order_bits) | jnp.clip(
            all_order, 0, T - 1).astype(jnp.uint32)
        key, entry_tri = jax.lax.sort((key, all_tri), dimension=0,
                                      num_keys=1, is_stable=True)
        entry_tile = (key[:entry_cap] >> order_bits).astype(jnp.int32)
        entry_tri = entry_tri[:entry_cap]
    else:
        entry_tile = all_tile[:entry_cap]
        entry_tri = all_tri[:entry_cap]
    out.append(entry_tile)

    tile_start = jnp.searchsorted(
        entry_tile, jnp.arange(ntiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    out.append(tile_start)

    if with_gather:
        ec = su.channels[entry_tri]
        out.append(jnp.transpose(ec))

    if with_stats:
        total = jnp.sum(jnp.where(is_narrow, ncover, 0))
        overflow = (jnp.maximum(total - entry_cap, 0)
                    + jnp.maximum(total_spill - spill_cap, 0))
        out.append(overflow)

    if with_broad:
        num_broad = jnp.sum(is_broad.astype(jnp.int32))
        bcum = jnp.cumsum(is_broad.astype(jnp.int32))
        broad_src = jnp.searchsorted(
            bcum, jnp.arange(1, broad_cap + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        broad_live = (broad_src < T).astype(jnp.int32)
        broad_src = jnp.clip(broad_src, 0, T - 1)
        bc = su.channels[broad_src]
        bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=1)
        bt = jnp.where(broad_live[:, None] > 0, bbox[broad_src],
                       jnp.array([[1, 1, 0, 0]], jnp.int32))
        out += [jnp.transpose(bc), bt, num_broad]
    return tuple(out)


def main():
    su, r = build_su()
    kw = dict(grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=r.entry_cap,
              K=r.max_tiles_per_tri, spill_cap=r.spill_cap,
              broad_cap=r.broad_cap)

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, frames=6):
        sync(fn(su)); t0 = time.perf_counter()
        for _ in range(frames): out = fn(su)
        sync(out)
        print(f"{name:28s} {(time.perf_counter()-t0)/frames*1000:9.2f} ms",
              flush=True)

    sel = sys.argv[1:] or ["all", "nobroad", "nostats", "fake_tri", "nogather"]
    V = {
        "all": {},
        "nobroad": dict(with_broad=False),
        "nostats": dict(with_stats=False),
        "fake_tri": dict(real_tri_operand=False),
        "nogather": dict(with_gather=False),
        "nosort": dict(with_sort=False),
        "nobroad_nostats": dict(with_broad=False, with_stats=False),
    }
    for name in sel:
        timeit(name, jax.jit(functools.partial(variant, **kw, **V[name])))


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] not in ("barrier", "hlo", "hlo2")):
    main()


def main2():
    """Barrier placement variants around the channels gather+transpose."""
    su, r = build_su()
    kw = dict(grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=r.entry_cap,
              K=r.max_tiles_per_tri, spill_cap=r.spill_cap,
              broad_cap=r.broad_cap)

    def piped(su, *, b_before, b_after):
        outs = variant(su, **kw, with_gather=False)
        entry_tri_src = outs[0]  # entry_tile; need entry_tri — recompute
        # redo minimal: reuse variant internals by calling with gather but
        # barriers: simplest is to copy the gather block here.
        return outs

    # simpler: parameterize via globals in variant — instead inline:
    import functools

    def var_barrier(su, mode):
        T = su.valid.shape[0]
        outs = variant(su, **kw, with_gather=False, with_broad=True,
                       with_stats=True)
        return outs

    def make(mode):
        def f(su):
            T = su.valid.shape[0]
            ntiles = kw["grid_w"] * kw["grid_h"]
            # rebuild expansion+sort (same as variant with_gather=False),
            # then gather with chosen barriers
            outs = variant(su, **kw, with_gather=False)
            entry_tile, tile_start = outs[0], outs[1]
            # variant() doesn't return entry_tri; rebuild it cheaply here by
            # re-running the sort (XLA CSEs the duplicate work away)
            tx0 = su.tile_lo[:, 0]; ty0 = su.tile_lo[:, 1]
            tx1 = su.tile_hi[:, 0]; ty1 = su.tile_hi[:, 1]
            tw = jnp.maximum(tx1 - tx0 + 1, 0)
            th = jnp.maximum(ty1 - ty0 + 1, 0)
            ncover = jnp.where(su.valid, tw * th, 0)
            is_narrow = su.valid & (ncover <= kw["K"]) & (ncover > 0)
            tri_ids = jnp.arange(T, dtype=jnp.int32)
            order_int = su.channels[:, S.CH_ORDER].astype(jnp.int32)
            dense_tile = jnp.where(is_narrow, ty0 * kw["grid_w"] + tx0,
                                   jnp.int32(ntiles))
            counts = jnp.where(is_narrow, ncover - 1, 0)
            spill_tri = jnp.repeat(tri_ids, counts,
                                   total_repeat_length=kw["spill_cap"]).astype(jnp.int32)
            sidx = jnp.arange(kw["spill_cap"], dtype=jnp.int32)
            spill_live = sidx < jnp.minimum(jnp.sum(counts), kw["spill_cap"])
            boundary = jnp.concatenate(
                [jnp.ones((1,), bool), spill_tri[1:] != spill_tri[:-1]])
            seg_start = jax.lax.cummax(jnp.where(boundary, sidx, 0))
            rank = sidx - seg_start
            bbox_tbl = jnp.concatenate(
                [tx0[:, None], ty0[:, None], jnp.maximum(tw, 1)[:, None],
                 order_int[:, None]], axis=1).astype(jnp.int32)
            ebox = bbox_tbl[spill_tri]
            cidx = rank + 1
            ctx = ebox[:, 0] + cidx % ebox[:, 2]
            cty = ebox[:, 1] + cidx // ebox[:, 2]
            spill_tile = jnp.where(spill_live,
                                   cty * kw["grid_w"] + ctx,
                                   jnp.int32(ntiles)).astype(jnp.int32)
            all_tile = jnp.concatenate([dense_tile, spill_tile])
            all_order = jnp.concatenate([order_int, ebox[:, 3]])
            all_tri = jnp.concatenate([tri_ids, spill_tri])
            order_bits = int(max(T - 1, 1)).bit_length()
            key = (all_tile.astype(jnp.uint32) << order_bits) | jnp.clip(
                all_order, 0, T - 1).astype(jnp.uint32)
            key, entry_tri = jax.lax.sort((key, all_tri), dimension=0,
                                          num_keys=1, is_stable=True)
            entry_tri = entry_tri[:kw["entry_cap"]]
            if mode in ("before", "both"):
                entry_tri = jax.lax.optimization_barrier(entry_tri)
            ec = su.channels[entry_tri]
            if mode in ("after", "both"):
                ec = jax.lax.optimization_barrier(ec)
            return outs + (jnp.transpose(ec),)
        return f

    def sync(out):
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))

    def timeit(name, fn, frames=6):
        sync(fn(su)); t0 = time.perf_counter()
        for _ in range(frames): out = fn(su)
        sync(out)
        print(f"{name:28s} {(time.perf_counter()-t0)/frames*1000:9.2f} ms",
              flush=True)

    for mode in sys.argv[2:] or ["none", "before", "after", "both"]:
        timeit(f"barrier={mode}", jax.jit(make(mode)))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "barrier":
    main2()


def main3():
    """Dump HLO: composed 'all' variant vs standalone gather."""
    su, r = build_su()
    kw = dict(grid_w=r.grid_w, grid_h=r.grid_h, entry_cap=r.entry_cap,
              K=r.max_tiles_per_tri, spill_cap=r.spill_cap,
              broad_cap=r.broad_cap)
    comp = jax.jit(functools.partial(variant, **kw)).lower(su).compile()
    txt = comp.as_text()
    import re
    with open("/tmp/bin_all_hlo.txt", "w") as f:
        f.write(txt)
    for line in txt.splitlines():
        if re.search(r"gather|transpose|sort|copy|fusion.kind", line):
            print(line.strip()[:220])


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "hlo":
    main3()


def main4():
    """HLO of the real (current) bin_triangles on config5."""
    su, r = build_su()
    from tyleri_tpu.ops.binning import bin_triangles

    f = jax.jit(functools.partial(
        bin_triangles, grid_w=r.grid_w, grid_h=r.grid_h,
        entry_cap=r.entry_cap, max_tiles_per_tri=r.max_tiles_per_tri,
        broad_cap=r.broad_cap, spill_cap=r.spill_cap))
    txt = f.lower(su).compile().as_text()
    with open("/tmp/bin_now_hlo.txt", "w") as fh:
        fh.write(txt)
    import re
    for line in txt.splitlines():
        if re.search(r"= f32\[1376256|gather\(|sort\(|kCustom", line):
            print(line.strip()[:240])


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "hlo2":
    main4()
