"""Texture sampling from the flat texture arena.

The reference binds one combined-image-sampler descriptor per mesh, all
sharing a single linear / mirrored-repeat sampler
(ref: src/render_device/builders.rs:300-320, src/resource/mod.rs:114-132).
TPU-natively the "descriptor heap" is a flat texel arena in HBM plus per-slot
(offset, width, height) metadata; a descriptor set handle is just the slot id,
so sampling is gather arithmetic and fully vmappable over pixels with
per-pixel texture ids (bindless by construction).
"""

from __future__ import annotations

import jax.numpy as jnp


def mirror_repeat(i, n):
    """MIRRORED_REPEAT addressing of integer texel coords (vectorized)."""
    m = jnp.mod(i, 2 * n)  # non-negative for n > 0
    return jnp.where(m >= n, 2 * n - 1 - m, m)


def make_texel_pairs(texels):
    """[cap, 4] rgba -> [cap, 8] (texel i, texel i+1) pair rows.

    TPU gathers cost fixed latency per ROW, and the mirror function is
    1-Lipschitz (adjacent taps land on neighboring-or-equal texels), so one
    pair-row gather serves both horizontal bilinear taps — half the gathers.
    """
    nxt = jnp.concatenate([texels[1:], texels[-1:]], axis=0)
    return jnp.concatenate([texels, nxt], axis=1)


def sample_bilinear(texel_pairs, tex_offset, tex_width, tex_height, tex_id, u, v):
    """Bilinear mirrored-repeat sample from the PAIR arena.

    texel_pairs: f32 [cap, 8] from make_texel_pairs (row-major per texture)
    tex_offset/width/height: i32 [slots]
    tex_id: i32 [...] per-sample slot; u, v: f32 [...]
    Returns rgba f32 [..., 4].
    """
    tid = jnp.clip(tex_id, 0, tex_offset.shape[0] - 1)
    off = tex_offset[tid]
    w = jnp.maximum(tex_width[tid], 1)
    h = jnp.maximum(tex_height[tid], 1)

    tu = u * w - 0.5
    tv = v * h - 0.5
    iu0 = jnp.floor(tu).astype(jnp.int32)
    iv0 = jnp.floor(tv).astype(jnp.int32)
    fu = (tu - iu0)[..., None]
    fv = (tv - iv0)[..., None]

    iu0m = mirror_repeat(iu0, w)
    iu1m = mirror_repeat(iu0 + 1, w)
    iv0m = mirror_repeat(iv0, h)
    iv1m = mirror_repeat(iv0 + 1, h)

    bx = jnp.minimum(iu0m, iu1m)
    sel0 = (iu0m - bx)[..., None] > 0   # which half of the pair is tap 0
    sel1 = (iu1m - bx)[..., None] > 0

    def taps(yy):
        pair = texel_pairs[off + yy * w + bx]       # [..., 8]
        lo, hi = pair[..., :4], pair[..., 4:]
        return jnp.where(sel0, hi, lo), jnp.where(sel1, hi, lo)

    t00, t01 = taps(iv0m)
    t10, t11 = taps(iv1m)
    top = t00 * (1.0 - fu) + t01 * fu
    bot = t10 * (1.0 - fu) + t11 * fu
    return top * (1.0 - fv) + bot * fv
