"""Blend-equation tests: jnp implementation vs the independent numpy oracle,
plus hand-computed values for the two reference pipeline states."""

import numpy as np

from tyleri_tpu.ops.blend import apply_blend, apply_compare
from tyleri_tpu.pipeline.state import (
    BlendFactor,
    BlendOp,
    BlendState,
    CompareOp,
    MESH_PIPELINE_STATE,
    UI_PIPELINE_STATE,
)
from tyleri_tpu.testing import oracle


def rand_rgba(rng, n=64):
    return rng.random((n, 4))


def test_mesh_blend_equation_by_hand():
    # rgb = src*src + dst*(1-dst); a = 0
    # (ref: src/pipeline/common_pipeline.rs:117-131)
    src = np.array([[0.5, 1.0, 0.2, 0.7]])
    dst = np.array([[0.25, 0.5, 0.9, 0.3]])
    out = np.asarray(apply_blend(MESH_PIPELINE_STATE.blend, src, dst))
    expect_rgb = src[0, :3] ** 2 + dst[0, :3] * (1 - dst[0, :3])
    np.testing.assert_allclose(out[0, :3], np.clip(expect_rgb, 0, 1), atol=1e-6)
    assert out[0, 3] == 0.0


def test_ui_blend_equation_by_hand():
    # rgb = src + dst*(1-src.a); alpha = 0 — the reference's EFFECTIVE
    # state: its alpha factor lines are commented out, so Vulkan zero
    # defaults apply (ref: src/pipeline/ui_pipeline.rs:115-129)
    src = np.array([[0.2, 0.4, 0.1, 0.5]])
    dst = np.array([[1.0, 0.0, 0.6, 1.0]])
    out = np.asarray(apply_blend(UI_PIPELINE_STATE.blend, src, dst))
    expect = src[0] + dst[0] * (1 - src[0, 3])
    np.testing.assert_allclose(out[0, :3], np.clip(expect, 0, 1)[:3], atol=1e-6)
    assert out[0, 3] == 0.0, "reference UI alpha output is 0 (ZERO/ZERO)"


def test_ui_blend_premultiplied_variant():
    # the opt-in conventional premultiplied-alpha config keeps alpha
    from tyleri_tpu.pipeline.state import UI_PIPELINE_STATE_PREMULTIPLIED_ALPHA

    src = np.array([[0.2, 0.4, 0.1, 0.5]])
    dst = np.array([[1.0, 0.0, 0.6, 1.0]])
    out = np.asarray(apply_blend(
        UI_PIPELINE_STATE_PREMULTIPLIED_ALPHA.blend, src, dst))
    expect = src[0] + dst[0] * (1 - src[0, 3])
    np.testing.assert_allclose(out[0], np.clip(expect, 0, 1), atol=1e-6)


def test_blend_matches_oracle_all_factors():
    rng = np.random.default_rng(0)
    factors = list(BlendFactor)
    ops = list(BlendOp)
    for i, sf in enumerate(factors):
        df = factors[(i + 3) % len(factors)]
        op = ops[i % len(ops)]
        state = BlendState(
            enable=True,
            src_color=sf, dst_color=df, color_op=op,
            src_alpha=df, dst_alpha=sf, alpha_op=ops[(i + 1) % len(ops)],
        )
        src, dst = rand_rgba(rng), rand_rgba(rng)
        got = np.asarray(apply_blend(state, src, dst))
        want = oracle.blend(state, src, dst)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{sf} {df} {op}")


def test_blend_disabled_and_write_mask():
    src = np.array([[0.1, 0.2, 0.3, 0.4]])
    dst = np.array([[0.9, 0.8, 0.7, 0.6]])
    state = BlendState(enable=False, write_mask=(True, False, True, False))
    out = np.asarray(apply_blend(state, src, dst))
    np.testing.assert_allclose(out[0], [0.1, 0.8, 0.3, 0.6], atol=1e-6)


def test_compare_ops():
    new = np.array([0.0, 0.5, 1.0])
    old = np.array([0.5, 0.5, 0.5])
    assert np.array_equal(
        np.asarray(apply_compare(CompareOp.LESS_OR_EQUAL, new, old)), [True, True, False]
    )
    assert np.array_equal(np.asarray(apply_compare(CompareOp.LESS, new, old)), [True, False, False])
    assert np.array_equal(np.asarray(apply_compare(CompareOp.ALWAYS, new, old)), [True] * 3)
    assert np.array_equal(np.asarray(apply_compare(CompareOp.NEVER, new, old)), [False] * 3)
    assert np.array_equal(
        np.asarray(apply_compare(CompareOp.GREATER_OR_EQUAL, new, old)), [False, True, True]
    )
