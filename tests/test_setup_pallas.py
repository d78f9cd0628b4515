"""Fused transform+cull+setup kernel (interpret mode) vs the XLA
formulation: channels, validity, bboxes and crossing telemetry must agree
(the TPU raster backends consume the fused output; golden tests anchor both
to the oracle)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tyleri_tpu.ops.clip import near_cull_triangles
from tyleri_tpu.ops.setup import setup_triangles
from tyleri_tpu.ops.setup_pallas import BLOCK, build_corner18, fused_setup
from tyleri_tpu.rendering.passes import RasterPlan, use_fused_setup


def rand_scene(rng, T, D, behind_frac=0.0):
    corner = rng.uniform(-1.5, 1.5, (T, 3, 5)).astype(np.float32)
    corner[..., 2] = rng.uniform(-0.5, 3.0, (T, 3))  # z spread
    if behind_frac:
        k = int(T * behind_frac)
        corner[:k, :, 2] = rng.uniform(-4.0, -2.5, (k, 3))  # fully behind
        corner[k:2 * k, 0, 2] = -3.0                        # crossing
    draw = rng.integers(0, D, T).astype(np.int32)
    tex = rng.integers(0, 3, T).astype(np.int32)
    valid = rng.random(T) > 0.15
    mvps = np.stack([
        np.asarray(np.eye(4), np.float32) + 0.01 * d for d in range(D)
    ])
    # a mildly perspective-ish matrix so w varies
    for d in range(D):
        mvps[d][3, 2] = -0.4
        mvps[d][3, 3] = 2.0
    return corner, draw, tex, valid, mvps


def reference_setup(corner, draw, tex, valid, mvps, viewport, scissor,
                    plan, Np):
    h = np.concatenate([corner[..., :3], np.ones((len(corner), 3, 1),
                                                 np.float32)], axis=-1)
    clip = np.einsum("dij,tcj->tcid", mvps, h)[
        np.arange(len(corner)), :, :, 0] * 0  # placeholder
    # per-triangle mvp
    clip = np.einsum("tij,tcj->tci", mvps[draw], h)
    ct = near_cull_triangles(
        jnp.asarray(clip), jnp.asarray(corner[..., 3:5]),
        jnp.asarray(tex), jnp.asarray(valid), extra_cap=0)
    su = setup_triangles(
        ct.clip, ct.uv, ct.tex_id, ct.valid, viewport, scissor,
        tile_w=plan.tile_w, tile_h=plan.tile_h,
        grid_w=plan.grid_w, grid_h=plan.grid_h, order=ct.order)
    return su, ct


def test_fused_setup_matches_xla_formulation():
    rng = np.random.default_rng(7)
    T, D = 700, 5
    corner, draw, tex, valid, mvps = rand_scene(rng, T, D, behind_frac=0.1)
    plan = RasterPlan(fb_w=256, fb_h=128, tile_w=64, tile_h=16,
                      near_clip=False)
    viewport = jnp.asarray([0, 0, 256, 128, 0, 1], jnp.float32)
    scissor = jnp.asarray([0, 0, 256, 128], jnp.int32)

    corner18 = build_corner18(
        jnp.asarray(corner), jnp.asarray(draw), jnp.asarray(tex),
        jnp.asarray(valid))
    su_f, crossings, _ = fused_setup(
        corner18, jnp.asarray(mvps.reshape(D, 16)), jnp.asarray(True),
        viewport, scissor,
        tile_w=plan.tile_w, tile_h=plan.tile_h,
        grid_w=plan.grid_w, grid_h=plan.grid_h, draw_cap=D, interpret=True)

    su_r, ct = reference_setup(corner, draw, tex, valid, mvps, viewport,
                               scissor, plan, corner18.shape[1] * 128)

    vf = np.asarray(su_f.valid)[:T]
    vr = np.asarray(su_r.valid)[:T]
    np.testing.assert_array_equal(vf, vr)
    assert not np.asarray(su_f.valid)[T:].any()  # padding rows dead
    assert int(crossings) == int(ct.crossings)

    chf = np.asarray(su_f.channels)[:T]
    chr_ = np.asarray(su_r.channels)[:T]
    live = vr
    # channel formulas are identical expressions; tolerate only fma-level
    # reassociation differences (the transform contraction order differs
    # between the kernel's sequential FMA and the XLA reduce)
    np.testing.assert_allclose(chf[live], chr_[live], rtol=3e-4, atol=3e-3)
    np.testing.assert_array_equal(np.asarray(su_f.tile_lo)[:T][live],
                                  np.asarray(su_r.tile_lo)[live])
    np.testing.assert_array_equal(np.asarray(su_f.tile_hi)[:T][live],
                                  np.asarray(su_r.tile_hi)[live])


def test_fused_setup_draw_mod_mask():
    rng = np.random.default_rng(8)
    T, D = 300, 4
    corner, draw, tex, valid, mvps = rand_scene(rng, T, D)
    plan = RasterPlan(fb_w=128, fb_h=128, tile_w=32, tile_h=16,
                      near_clip=False)
    viewport = jnp.asarray([0, 0, 128, 128, 0, 1], jnp.float32)
    scissor = jnp.asarray([0, 0, 128, 128], jnp.int32)
    corner18 = build_corner18(
        jnp.asarray(corner), jnp.asarray(draw), jnp.asarray(tex),
        jnp.asarray(valid))

    def run(dm):
        su, _, _ = fused_setup(
            corner18, jnp.asarray(mvps.reshape(D, 16)), jnp.asarray(True),
            viewport, scissor, dm,
            tile_w=plan.tile_w, tile_h=plan.tile_h,
            grid_w=plan.grid_w, grid_h=plan.grid_h, draw_cap=D,
            interpret=True)
        return np.asarray(su.valid)[:T]

    full = run(None)
    part0 = run((jnp.int32(2), jnp.int32(0)))
    part1 = run((jnp.int32(2), jnp.int32(1)))
    np.testing.assert_array_equal(part0 | part1, full)
    assert not (part0 & part1).any()
    np.testing.assert_array_equal(part0, full & (draw % 2 == 0))

def test_use_fused_setup_gating():
    good = RasterPlan(fb_w=256, fb_h=128, tile_w=64, tile_h=16,
                      near_clip=False, fused_setup=True)
    assert use_fused_setup(good, 8)
    # near_clip on -> cull semantics unavailable
    clip_on = dataclasses.replace(good, near_clip=True, fused_setup="auto")
    assert not use_fused_setup(clip_on, 8)
    # non-pow2 tile -> unsupported
    odd = dataclasses.replace(good, tile_w=48, fused_setup="auto")
    assert not use_fused_setup(odd, 8)


def test_fused_setup_cull_modes():
    from tyleri_tpu.pipeline.state import CullMode, FrontFace

    rng = np.random.default_rng(9)
    T, D = 400, 3
    corner, draw, tex, valid, mvps = rand_scene(rng, T, D)
    plan = RasterPlan(fb_w=128, fb_h=128, tile_w=32, tile_h=16,
                      near_clip=False)
    viewport = jnp.asarray([0, 0, 128, 128, 0, 1], jnp.float32)
    scissor = jnp.asarray([0, 0, 128, 128], jnp.int32)
    corner18 = build_corner18(
        jnp.asarray(corner), jnp.asarray(draw), jnp.asarray(tex),
        jnp.asarray(valid))

    def run(cm, ff):
        su, _, _ = fused_setup(
            corner18, jnp.asarray(mvps.reshape(D, 16)), jnp.asarray(True),
            viewport, scissor,
            tile_w=plan.tile_w, tile_h=plan.tile_h,
            grid_w=plan.grid_w, grid_h=plan.grid_h, draw_cap=D,
            cull_mode=cm, front_face=ff, interpret=True)
        return np.asarray(su.valid)[:T]

    none = run(CullMode.NONE, FrontFace.COUNTER_CLOCKWISE)
    back = run(CullMode.BACK, FrontFace.COUNTER_CLOCKWISE)
    front = run(CullMode.FRONT, FrontFace.COUNTER_CLOCKWISE)
    both = run(CullMode.FRONT_AND_BACK, FrontFace.COUNTER_CLOCKWISE)
    # BACK and FRONT partition the kept set; FRONT_AND_BACK kills all
    np.testing.assert_array_equal(back | front, none)
    assert not (back & front).any()
    assert not both.any()
    # flipping the winding convention swaps the partitions
    back_cw = run(CullMode.BACK, FrontFace.CLOCKWISE)
    np.testing.assert_array_equal(back_cw, front)


def _hybrid_parts(rng_seed=11, T=700, D=5, X=256):
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.pipeline.state import MESH_PIPELINE_STATE
    from tyleri_tpu.rendering.passes import _fused_clip_subset

    rng = np.random.default_rng(rng_seed)
    corner, draw, tex, valid, mvps = rand_scene(rng, T, D, behind_frac=0.1)
    plan = RasterPlan(fb_w=256, fb_h=128, tile_w=64, tile_h=16,
                      near_clip=True, clip_cap=X)
    viewport = jnp.asarray([0, 0, 256, 128, 0, 1], jnp.float32)
    scissor = jnp.asarray([0, 0, 256, 128], jnp.int32)
    dims = dict(tile_w=plan.tile_w, tile_h=plan.tile_h,
                grid_w=plan.grid_w, grid_h=plan.grid_h)

    corner18 = build_corner18(
        jnp.asarray(corner), jnp.asarray(draw), jnp.asarray(tex),
        jnp.asarray(valid))
    su_f, crossings, crossed = fused_setup(
        corner18, jnp.asarray(mvps.reshape(D, 16)), jnp.asarray(True),
        viewport, scissor, draw_cap=D, interpret=True, **dims)
    su_h, overflow = _fused_clip_subset(
        su_f, crossed, (jnp.asarray(corner), jnp.asarray(draw),
                        jnp.asarray(tex)),
        jnp.asarray(mvps.reshape(D, 16)), viewport, scissor,
        MESH_PIPELINE_STATE, X, dims)

    # XLA near-clip reference
    h = np.concatenate(
        [corner[..., :3], np.ones((T, 3, 1), np.float32)], axis=-1)
    clip = np.einsum("tij,tcj->tci", mvps[draw], h)
    ct = near_clip_triangles(
        jnp.asarray(clip), jnp.asarray(corner[..., 3:5]),
        jnp.asarray(tex), jnp.asarray(valid), extra_cap=X)
    su_r = setup_triangles(
        ct.clip, ct.uv, ct.tex_id, ct.valid, viewport, scissor,
        tile_w=plan.tile_w, tile_h=plan.tile_h,
        grid_w=plan.grid_w, grid_h=plan.grid_h, order=ct.order)
    return T, X, su_h, overflow, crossings, su_r, ct


def test_fused_clip_hybrid_matches_xla_formulation():
    """The hybrid (fused kernel + XLA re-clip of the flagged subset,
    passes.py::_fused_clip_subset) must agree with the pure-XLA near-clip
    path row for row: in-place rewritten halves at the parent slot, extra
    halves in the clip rows, both carrying the parent's draw order."""
    T, X, su_h, overflow, crossings, su_r, ct = _hybrid_parts()
    N = np.asarray(su_h.channels).shape[0] - X

    assert int(crossings) == int(ct.crossings) > 0
    assert int(overflow) == int(ct.overflow) == 0

    vh = np.asarray(su_h.valid)
    vr = np.asarray(su_r.valid)
    np.testing.assert_array_equal(vh[:T], vr[:T])          # main rows
    np.testing.assert_array_equal(vh[N:], vr[T:])          # extra rows
    assert not vh[T:N].any()                               # padding dead
    assert vh[N:].any()                                    # real splits

    from tyleri_tpu.ops import setup as S
    ch_h = np.asarray(su_h.channels)
    ch_r = np.asarray(su_r.channels)
    for rows_h, rows_r in ((ch_h[:T][vr[:T]], ch_r[:T][vr[:T]]),
                           (ch_h[N:][vr[T:]], ch_r[T:][vr[T:]])):
        # transform contraction order differs (kernel FMA chain vs XLA
        # einsum) -> fma-level tolerance, as in the cull-mode test
        np.testing.assert_allclose(rows_h, rows_r, rtol=3e-4, atol=3e-3)
        # draw order (z-tie arbitration) must be EXACT
        np.testing.assert_array_equal(rows_h[:, S.CH_ORDER],
                                      rows_r[:, S.CH_ORDER])
    np.testing.assert_array_equal(
        np.asarray(su_h.tile_lo)[N:][vr[T:]],
        np.asarray(su_r.tile_lo)[T:][vr[T:]])
    np.testing.assert_array_equal(
        np.asarray(su_h.tile_hi)[N:][vr[T:]],
        np.asarray(su_r.tile_hi)[T:][vr[T:]])


def test_fused_clip_hybrid_overflow_reported_not_drawn():
    """Crossings beyond clip_cap are culled + counted (the capacity
    invariant) — never rendered unclipped."""
    T, X, su_h, overflow, crossings, su_r, ct = _hybrid_parts(X=4)
    assert int(crossings) > 4
    assert int(overflow) == int(crossings) - 4 == int(ct.overflow)
    # the hybrid table has no MORE live rows than the reference (overflow
    # rows stay culled in both)
    assert np.asarray(su_h.valid).sum() == np.asarray(su_r.valid).sum()


def test_fused_clip_hybrid_pixels_match_xla_path():
    """End-to-end: mesh_pass_fused with clip_tables (the hybrid) renders
    the same image as the pure-XLA near-clip mesh_pass, up to fma-level
    transform reassociation at triangle edges."""
    from tyleri_tpu.pipeline.state import MESH_PIPELINE_STATE
    from tyleri_tpu.rendering import passes

    rng = np.random.default_rng(23)
    T, D, X = 700, 5, 256
    corner, draw, tex, valid, mvps = rand_scene(rng, T, D, behind_frac=0.1)
    plan = RasterPlan(fb_w=256, fb_h=128, tile_w=64, tile_h=16,
                      near_clip=True, clip_cap=X,
                      entry_cap=1 << 14, cap_per_tile=1024)
    viewport = jnp.asarray([0, 0, 256, 128, 0, 1], jnp.float32)
    scissor = jnp.asarray([0, 0, 256, 128], jnp.int32)
    texels = jnp.ones((4, 16), jnp.float32)
    meta = (jnp.zeros((3,), jnp.int32), jnp.full((3,), 2, jnp.int32),
            jnp.full((3,), 2, jnp.int32))
    color0 = jnp.zeros((128, 256, 4), jnp.float32)
    depth0 = jnp.ones((128, 256), jnp.float32)

    h = np.concatenate(
        [corner[..., :3], np.ones((T, 3, 1), np.float32)], axis=-1)
    clip = np.einsum("tij,tcj->tci", mvps[draw], h)
    c_ref, d_ref, st_ref, _ = passes.mesh_pass(
        plan, MESH_PIPELINE_STATE, color0, depth0,
        jnp.asarray(clip), jnp.asarray(corner[..., 3:5]),
        jnp.asarray(tex), jnp.asarray(valid), viewport, scissor,
        texels, *meta)

    corner18 = build_corner18(
        jnp.asarray(corner), jnp.asarray(draw), jnp.asarray(tex),
        jnp.asarray(valid))
    c_h, d_h, st_h, _ = passes.mesh_pass_fused(
        plan, MESH_PIPELINE_STATE, color0, depth0,
        corner18, jnp.asarray(mvps.reshape(D, 16)), jnp.asarray(True),
        viewport, scissor, texels, *meta,
        clip_tables=(jnp.asarray(corner), jnp.asarray(draw),
                     jnp.asarray(tex)),
        clip_cap=X)

    assert int(st_h.clip_crossings) == int(st_ref.clip_crossings) > 0
    assert int(st_h.clip_overflow) == int(st_ref.clip_overflow) == 0
    diff = np.abs(np.asarray(c_h) - np.asarray(c_ref)).max(axis=-1)
    frac = float((diff > 1.0 / 255.0).mean())
    assert frac < 0.005, f"{frac:.4%} of pixels differ beyond 1 u8"


def test_use_fused_setup_clip_gating():
    from tyleri_tpu.rendering.passes import use_fused_setup_clip

    clip_on = RasterPlan(fb_w=256, fb_h=128, tile_w=64, tile_h=16,
                         near_clip=True, fused_setup=True)
    assert use_fused_setup_clip(clip_on, 8)
    assert not use_fused_setup_clip(clip_on, 65)          # draw_cap
    assert not use_fused_setup_clip(
        dataclasses.replace(clip_on, near_clip=False), 8)  # cull mode
    assert not use_fused_setup_clip(
        dataclasses.replace(clip_on, exact=True), 8)
    assert not use_fused_setup_clip(
        dataclasses.replace(clip_on, tile_w=48), 8)        # non-pow2
    # "auto" requires the TPU backend (CPU runs the XLA path)
    auto = dataclasses.replace(clip_on, fused_setup="auto")
    import jax
    assert use_fused_setup_clip(auto, 8) == (jax.default_backend() == "tpu")
