"""Deferred shading of a visibility buffer.

The fragment stage of the mesh pipeline is a plain texture fetch
(ref: src/pipeline/glsl/common_pipeline.frag:11-12 — ``uFragColor = color``)
followed by fixed-function blending.  Shading once per pixel (instead of once
per fragment) turns the hot path into pure vectorized gathers + VPU math over
the full framebuffer — the TPU-friendly shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from tyleri_tpu.ops import setup as S
from tyleri_tpu.ops.blend import apply_blend
from tyleri_tpu.ops.sampling import sample_bilinear
from tyleri_tpu.pipeline.state import BlendState


def shade_visibility(
    vis_owner,      # i32 [H, W] combined-table entry index, -1 = background
    all_channels,   # f32 [E+B, NUM_CHANNELS] (entry-major rows)
    texels,         # f32 [cap, 16] texel-quad arena (ops/sampling.py)
    tex_offset, tex_width, tex_height,  # i32 [slots]
    blend_state: BlendState,
    dst_color,      # f32 [H, W, 4] framebuffer to blend into
):
    H, W = vis_owner.shape
    valid = vis_owner >= 0
    safe = jnp.clip(vis_owner, 0, all_channels.shape[0] - 1)
    # Build a row-major shade table of just the channels shading needs
    # (10 of NUM_CHANNELS), so the per-pixel owner lookup is ONE contiguous
    # row gather instead of 10 strided element gathers — the dominant HBM
    # traffic of this pass.
    rows = jnp.array(
        [S.CH_INVW, S.CH_INVW + 1, S.CH_INVW + 2,
         S.CH_UW, S.CH_UW + 1, S.CH_UW + 2,
         S.CH_VW, S.CH_VW + 1, S.CH_VW + 2,
         S.CH_TEX],
        jnp.int32,
    )
    table = all_channels[:, rows]               # [E, 10] static column slice
    ch = table[safe]                            # [H, W, 10] row gathers

    xc = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
    yc = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]

    def plane(i):
        return ch[..., i] * xc + ch[..., i + 1] * yc + ch[..., i + 2]

    inv_w = plane(0)
    denom = jnp.where(inv_w == 0, 1.0, inv_w)
    u = plane(3) / denom
    v = plane(6) / denom
    tex_id = ch[..., 9].astype(jnp.int32)

    src = sample_bilinear(texels, tex_offset, tex_width, tex_height, tex_id, u, v)
    out = apply_blend(blend_state, src, dst_color)
    return jnp.where(valid[..., None], out, dst_color)
