"""Deferred shading of a visibility buffer.

The fragment stage of the mesh pipeline is a plain texture fetch
(ref: src/pipeline/glsl/common_pipeline.frag:11-12 — ``uFragColor = color``)
followed by fixed-function blending.  The visibility pass already resolved
the winner's shading attributes per pixel (u/w, v/w, 1/w, texture slot), so
shading is one texel-quad gather + blend — no per-pixel table lookups.
"""

from __future__ import annotations

import jax.numpy as jnp

from tyleri_tpu.ops.blend import apply_blend
from tyleri_tpu.ops.sampling import sample_bilinear
from tyleri_tpu.pipeline.state import BlendState


def shade_visibility(
    vis,            # VisibilityBuffer (owner/uw/vw/iw/tex maps)
    texels,         # f32 [cap, 16] texel-quad arena (ops/sampling.py)
    tex_offset, tex_width, tex_height,  # i32 [slots]
    blend_state: BlendState,
    dst_color,      # f32 [H, W, 4] framebuffer to blend into
):
    valid = vis.owner >= 0
    denom = jnp.where(vis.iw == 0, 1.0, vis.iw)
    u = vis.uw / denom
    v = vis.vw / denom
    src = sample_bilinear(texels, tex_offset, tex_width, tex_height,
                          vis.tex, u, v)
    out = apply_blend(blend_state, src, dst_color)
    return jnp.where(valid[..., None], out, dst_color)
