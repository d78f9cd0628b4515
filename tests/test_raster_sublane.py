"""Sublane-batched visibility kernel (ops/raster_sublane.py) vs the XLA
reference implementation (interpret mode on CPU; compiled path on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tyleri_tpu.pipeline.state import (
    BlendState,
    CompareOp,
    DepthFormat,
    DepthState,
    PipelineState,
)
from tyleri_tpu.rendering import passes
from tyleri_tpu.utils.math3d import Rect2D, Viewport

from test_raster_pallas import (
    FB_H,
    FB_W,
    FLAT,
    occlusion_scene,
    random_scene,
    run,
)

LESS = PipelineState(
    blend=BlendState(enable=False),
    depth=DepthState(test_enable=True, write_enable=True,
                     compare_op=CompareOp.LESS,
                     format=DepthFormat.D16_UNORM),
)
D32 = PipelineState(
    blend=BlendState(enable=False),
    depth=DepthState(test_enable=True, write_enable=True,
                     compare_op=CompareOp.LESS_OR_EQUAL,
                     format=DepthFormat.D32_SFLOAT),
)


def run_state(clip, uv, state, pallas, plan_kw=None, tile_h=8):
    T = clip.shape[0]
    kw = dict(entry_cap=1024, cap_per_tile=512, chunk=128)
    kw.update(plan_kw or {})
    plan = passes.RasterPlan(
        fb_w=FB_W, fb_h=FB_H, tile_w=128, tile_h=tile_h, pallas=pallas, **kw)
    texels = jnp.ones((4, 16), jnp.float32)
    meta = (jnp.zeros((1,), jnp.int32), jnp.full((1,), 2, jnp.int32),
            jnp.full((1,), 2, jnp.int32))
    color = jnp.zeros((FB_H, FB_W, 4), jnp.float32)
    depth = jnp.ones((FB_H, FB_W), jnp.float32)
    color, depth, stats, _ = passes.mesh_pass(
        plan, state, color, depth,
        jnp.asarray(clip), jnp.asarray(uv),
        jnp.zeros((T,), jnp.int32), jnp.ones((T,), bool),
        Viewport(0, 0, FB_W, FB_H).as_array(),
        Rect2D(0, 0, FB_W, FB_H).as_array(),
        texels, *meta,
    )
    return np.asarray(color), np.asarray(depth)


@pytest.mark.parametrize("seed,T", [(0, 24), (1, 60), (2, 200)])
def test_sublane_matches_xla(seed, T):
    rng = np.random.default_rng(seed)
    clip, uv = random_scene(rng, T=T)
    c_x, d_x = run(clip, uv, pallas=False)
    c_s, d_s = run(clip, uv, pallas=True, plan_kw=dict(sublane=True))
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)


def test_sublane_broad_triangles_and_ties():
    rng = np.random.default_rng(3)
    clip, uv = random_scene(rng, T=40, grid=2)  # big tris -> broad list
    kw = dict(max_tiles_per_tri=2, broad_cap=64, entry_cap=512, chunk=128)
    c_x, d_x = run(clip, uv, pallas=False, plan_kw=kw)
    c_s, d_s = run(clip, uv, pallas=True, plan_kw={**kw, "sublane": True})
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)


def test_sublane_16row_tiles_and_tpp():
    rng = np.random.default_rng(4)
    clip, uv = random_scene(rng, T=80)
    c_x, d_x = run_state(clip, uv, FLAT, pallas=False, tile_h=16)
    c_s, d_s = run_state(clip, uv, FLAT, pallas=True, tile_h=16,
                         plan_kw=dict(sublane=True))
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)
    c_t, d_t = run_state(clip, uv, FLAT, pallas=True, tile_h=8,
                         plan_kw=dict(sublane=True, tiles_per_prog=2))
    c_x8, d_x8 = run_state(clip, uv, FLAT, pallas=False, tile_h=8)
    np.testing.assert_array_equal(c_x8, c_t)
    np.testing.assert_array_equal(d_x8, d_t)


def test_sublane_early_exit_occlusion():
    rng = np.random.default_rng(5)
    clip, uv = occlusion_scene(rng)
    c_x, d_x = run(clip, uv, pallas=False)
    c_s, d_s = run(clip, uv, pallas=True, plan_kw=dict(sublane=True))
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)


@pytest.mark.parametrize("state", [LESS, FLAT, D32],
                         ids=["less", "le", "d32"])
def test_sublane_tie_semantics(state):
    # duplicated geometry front-to-back and back-to-front: exact z-ties
    # with differing draw orders at every covered pixel
    rng = np.random.default_rng(6)
    clip, uv = random_scene(rng, T=30)
    clip2 = np.concatenate([clip, clip[::-1]])
    uv2 = np.concatenate([uv, uv[::-1]])
    c_x, d_x = run_state(clip2, uv2, state, pallas=False)
    c_s, d_s = run_state(clip2, uv2, state, pallas=True,
                         plan_kw=dict(sublane=True))
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)


def test_sublane_scissor():
    rng = np.random.default_rng(7)
    clip, uv = random_scene(rng, T=50)
    sc = Rect2D(17, 5, 64, 20).as_array()

    def run_sc(pallas):
        T = clip.shape[0]
        plan = passes.RasterPlan(
            fb_w=FB_W, fb_h=FB_H, tile_w=128, tile_h=8, pallas=pallas,
            entry_cap=512, chunk=128, sublane=pallas)
        texels = jnp.ones((4, 16), jnp.float32)
        meta = (jnp.zeros((1,), jnp.int32), jnp.full((1,), 2, jnp.int32),
                jnp.full((1,), 2, jnp.int32))
        color = jnp.zeros((FB_H, FB_W, 4), jnp.float32)
        depth = jnp.ones((FB_H, FB_W), jnp.float32)
        color, depth, *_ = passes.mesh_pass(
            plan, FLAT, color, depth, jnp.asarray(clip), jnp.asarray(uv),
            jnp.zeros((T,), jnp.int32), jnp.ones((T,), bool),
            Viewport(0, 0, FB_W, FB_H).as_array(), sc, texels, *meta)
        return np.asarray(color), np.asarray(depth)

    np.testing.assert_array_equal(run_sc(False)[0], run_sc(True)[0])


def test_sublane_segment_pressing_entry_cap():
    # segments that clamp the last chunk window against the table end:
    # re-covered entries must stay idempotent
    rng = np.random.default_rng(8)
    clip, uv = random_scene(rng, T=120)
    kw = dict(entry_cap=256, spill_cap=256, chunk=128)
    c_x, d_x = run(clip, uv, pallas=False, plan_kw=kw)
    c_s, d_s = run(clip, uv, pallas=True, plan_kw={**kw, "sublane": True})
    np.testing.assert_array_equal(c_x, c_s)
    np.testing.assert_array_equal(d_x, d_s)
