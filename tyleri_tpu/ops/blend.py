"""Vulkan blend-equation library, vectorized over pixels.

Implements every blend factor/op the framework supports as pure jnp so the
same code path runs inside jit, inside Pallas kernels, and in tests.  The two
states that must match the reference bit-for-bit are
``MESH_PIPELINE_STATE.blend`` (SrcColor/OneMinusDstColor ADD, alpha Zero/Zero —
ref: src/pipeline/common_pipeline.rs:117-131) and ``UI_PIPELINE_STATE.blend``
(One/OneMinusSrcAlpha — ref: src/pipeline/ui_pipeline.rs:115-129).
"""

from __future__ import annotations

import jax.numpy as jnp

from tyleri_tpu.pipeline.state import BlendFactor, BlendOp, BlendState, CompareOp


def _factor(fac: BlendFactor, src, dst, channels: slice):
    """Return the per-channel multiplier for ``channels`` (rgb or alpha).

    ``src``/``dst`` are [..., 4] rgba.  Per the Vulkan spec, color factors
    SRC_COLOR etc. use the matching channel; for the alpha channel the
    *_COLOR factors use alpha.
    """
    s = src[..., channels]
    d = dst[..., channels]
    sa = src[..., 3:4]
    da = dst[..., 3:4]
    one = jnp.ones_like(s)
    table = {
        BlendFactor.ZERO: jnp.zeros_like(s),
        BlendFactor.ONE: one,
        BlendFactor.SRC_COLOR: s,
        BlendFactor.ONE_MINUS_SRC_COLOR: 1.0 - s,
        BlendFactor.DST_COLOR: d,
        BlendFactor.ONE_MINUS_DST_COLOR: 1.0 - d,
        BlendFactor.SRC_ALPHA: sa * one,
        BlendFactor.ONE_MINUS_SRC_ALPHA: (1.0 - sa) * one,
        BlendFactor.DST_ALPHA: da * one,
        BlendFactor.ONE_MINUS_DST_ALPHA: (1.0 - da) * one,
    }
    return table[fac]


def _op(op: BlendOp, a, b):
    if op == BlendOp.ADD:
        return a + b
    if op == BlendOp.SUBTRACT:
        return a - b
    if op == BlendOp.REVERSE_SUBTRACT:
        return b - a
    if op == BlendOp.MIN:
        return jnp.minimum(a, b)
    if op == BlendOp.MAX:
        return jnp.maximum(a, b)
    raise ValueError(f"unknown blend op {op}")


def apply_blend(state: BlendState, src, dst):
    """Blend ``src`` over ``dst`` (both [..., 4] rgba in [0,1]) per ``state``.

    Matches Vulkan semantics: factors/ops applied, result clamped to [0,1]
    (UNORM attachment — the reference renders to the swapchain's surface
    format and R8G8B8A8_UNORM textures, ref: src/resource/mod.rs:74), then
    the write mask selects which channels land.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if not state.enable:
        out = src
    else:
        rgb = _op(
            state.color_op,
            src[..., :3] * _factor(state.src_color, src, dst, slice(0, 3)),
            dst[..., :3] * _factor(state.dst_color, src, dst, slice(0, 3)),
        )
        if state.color_op in (BlendOp.MIN, BlendOp.MAX):
            # MIN/MAX ignore the blend factors per the Vulkan spec.
            rgb = _op(state.color_op, src[..., :3], dst[..., :3])
        a = _op(
            state.alpha_op,
            src[..., 3:4] * _factor(state.src_alpha, src, dst, slice(3, 4)),
            dst[..., 3:4] * _factor(state.dst_alpha, src, dst, slice(3, 4)),
        )
        if state.alpha_op in (BlendOp.MIN, BlendOp.MAX):
            a = _op(state.alpha_op, src[..., 3:4], dst[..., 3:4])
        out = jnp.concatenate([rgb, a], axis=-1)
    out = jnp.clip(out, 0.0, 1.0)
    mask = jnp.array(state.write_mask, bool)
    return jnp.where(mask, out, dst)


def apply_compare(op: CompareOp, new, old):
    """Depth-compare ``new`` against ``old``; returns a boolean pass mask."""
    if op == CompareOp.NEVER:
        return jnp.zeros(jnp.broadcast_shapes(new.shape, old.shape), bool)
    if op == CompareOp.ALWAYS:
        return jnp.ones(jnp.broadcast_shapes(new.shape, old.shape), bool)
    table = {
        CompareOp.LESS: new < old,
        CompareOp.EQUAL: new == old,
        CompareOp.LESS_OR_EQUAL: new <= old,
        CompareOp.GREATER: new > old,
        CompareOp.NOT_EQUAL: new != old,
        CompareOp.GREATER_OR_EQUAL: new >= old,
    }
    return table[op]
