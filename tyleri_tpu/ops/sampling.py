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


def make_texel_quads(texels, offsets, widths, heights):
    """[cap, 4] rgba (numpy) -> [cap, 16] quad rows: the 2x2 texel block
    (i, i+1, i+w, i+w+1), with the next-row half clamped to the same row at
    each texture's last row.

    TPU gathers cost fixed latency per ROW, and the mirror function is
    1-Lipschitz (adjacent taps land on neighboring-or-equal texels), so one
    quad-row gather serves all four bilinear taps.
    """
    import numpy as np

    texels = np.asarray(texels, np.float32)
    n = len(texels)
    nxt = np.concatenate([texels[1:], texels[-1:]], axis=0)
    pairs = np.concatenate([texels, nxt], axis=1)          # [cap, 8]
    row2 = np.arange(n, dtype=np.int64)
    for off, w, h in zip(offsets, widths, heights):
        end = off + w * h
        idx = np.arange(off, min(end, n))
        local_row = (idx - off) // max(w, 1)
        down = np.where(local_row + 1 < h, idx + w, idx)
        row2[off:min(end, n)] = np.minimum(down, n - 1)
    return np.concatenate([pairs, pairs[row2]], axis=1)     # [cap, 16]


def quad_derivatives(f):
    """GPU-style 2x2 fragment-quad derivatives (dFdx, dFdy).

    Within each screen-aligned 2x2 quad all four pixels share the quad's
    forward differences — the Vulkan fragment-quad semantics behind
    implicit-LOD sampling.  Odd framebuffer edges replicate (clamp).
    f: [H, W] -> (dfdx, dfdy), same shape.  Pure elementwise/reshape work:
    the TPU pays no gathers for derivative computation.
    """
    H, W = f.shape[-2:]
    fp = jnp.pad(f, ((0, H % 2), (0, W % 2)), mode="edge")
    Hp, Wp = fp.shape
    q = fp.reshape(Hp // 2, 2, Wp // 2, 2)
    dx = jnp.broadcast_to(q[:, :, :, 1:2] - q[:, :, :, 0:1], q.shape)
    dy = jnp.broadcast_to(q[:, 1:2, :, :] - q[:, 0:1, :, :], q.shape)
    return (dx.reshape(Hp, Wp)[:H, :W], dy.reshape(Hp, Wp)[:H, :W])


def sample_anisotropic(texel_quads, tex_offset, tex_width, tex_height,
                       tex_id, u, v, dudx, dvdx, dudy, dvdy, *, taps: int):
    """Anisotropic mirrored-repeat sample: ``taps`` bilinear taps spread
    along the major footprint axis (the sampler's max_sampler_anisotropy,
    ref: src/render_device/builders.rs:300-320).

    The screen-space UV derivatives define the pixel's footprint in texel
    space; the filter integrates along its longer axis.  There is no mip
    chain, so the spread is clamped to ``taps`` texels (the maxLod-clamp
    analog — bounds smearing from quad-boundary derivative noise exactly
    where a GPU's coarsest mip would).  Magnified pixels have sub-texel
    footprints, so the taps collapse onto the bilinear result.
    """
    tid = jnp.clip(tex_id, 0, tex_offset.shape[0] - 1)
    w = jnp.maximum(tex_width[tid], 1).astype(jnp.float32)
    h = jnp.maximum(tex_height[tid], 1).astype(jnp.float32)
    lx = (dudx * w) ** 2 + (dvdx * h) ** 2
    ly = (dudy * w) ** 2 + (dvdy * h) ** 2
    use_x = lx >= ly
    mu = jnp.where(use_x, dudx, dudy)
    mv = jnp.where(use_x, dvdx, dvdy)
    lmaj = jnp.sqrt(jnp.maximum(lx, ly))
    scale = jnp.where(lmaj > taps, taps / jnp.maximum(lmaj, 1e-30), 1.0)
    mu = mu * scale
    mv = mv * scale
    acc = None
    for i in range(taps):
        t = (i + 0.5) / taps - 0.5
        s = sample_bilinear(texel_quads, tex_offset, tex_width, tex_height,
                            tex_id, u + mu * t, v + mv * t)
        acc = s if acc is None else acc + s
    return acc / taps


def sample_bilinear(texel_quads, tex_offset, tex_width, tex_height, tex_id, u, v):
    """Bilinear mirrored-repeat sample from the QUAD arena.

    texel_quads: f32 [cap, 16] from make_texel_quads (row-major per texture)
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
    by = jnp.minimum(iv0m, iv1m)
    quad = texel_quads[off + by * w + bx]           # [..., 16] ONE gather
    row_lo, row_hi = quad[..., :8], quad[..., 8:]

    def row(yy):
        return jnp.where((yy != by)[..., None], row_hi, row_lo)

    def tap(r, xx):
        return jnp.where((xx != bx)[..., None], r[..., 4:8], r[..., :4])

    r0 = row(iv0m)
    r1 = row(iv1m)
    t00 = tap(r0, iu0m)
    t01 = tap(r0, iu1m)
    t10 = tap(r1, iu0m)
    t11 = tap(r1, iu1m)
    top = t00 * (1.0 - fu) + t01 * fu
    bot = t10 * (1.0 - fu) + t11 * fu
    return top * (1.0 - fv) + bot * fv
