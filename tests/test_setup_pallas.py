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
    su_f, crossings = fused_setup(
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
        su, _ = fused_setup(
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
        su, _ = fused_setup(
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
