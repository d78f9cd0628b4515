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


def sample_bilinear(texels, tex_offset, tex_width, tex_height, tex_id, u, v):
    """Bilinear mirrored-repeat sample.

    texels: f32 [cap, 4] flat rgba arena (row-major per texture)
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

    def tap(yy, xx):
        return texels[off + yy * w + xx]

    t00 = tap(iv0m, iu0m)
    t01 = tap(iv0m, iu1m)
    t10 = tap(iv1m, iu0m)
    t11 = tap(iv1m, iu1m)
    top = t00 * (1.0 - fu) + t01 * fu
    bot = t10 * (1.0 - fu) + t11 * fu
    return top * (1.0 - fv) + bot * fv
