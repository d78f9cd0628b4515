"""Exact-order rasterizer: sequential per-triangle processing over the full
framebuffer, bit-faithful to Vulkan per-fragment semantics (draw-order
blending, any compare op, depth write interleaving).

This path is O(T * H * W) — it is the correctness anchor (validated against
the independent numpy oracle) and the production path for the *UI overlay*,
whose triangle counts are small (ref records UI into the first secondary
command buffer, before any meshes: src/rendering_function/forward_rendering/
mod.rs:291-296; stages.rs:31-86).  Large mesh passes use the visibility
rasterizer instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tyleri_tpu.ops import setup as S
from tyleri_tpu.ops.blend import apply_blend, apply_compare
from tyleri_tpu.ops.depth import quantize_depth
from tyleri_tpu.ops.sampling import sample_bilinear
from tyleri_tpu.pipeline.state import PipelineState


@functools.partial(jax.jit, static_argnames=("state", "with_vertex_color"))
def rasterize_exact(
    color,        # f32 [H, W, 4]
    depth,        # f32 [H, W] (quantized values)
    clip,         # f32 [T, 3, 4]
    uv,           # f32 [T, 3, 2]
    tex_id,       # i32 [T]
    tri_valid,    # bool [T]
    viewport,     # f32 [6]
    scissor,      # i32 [4]
    texels, tex_offset, tex_width, tex_height,
    *,
    state: PipelineState,
    with_vertex_color: bool = False,
    vertex_color=None,  # f32 [T, 3, 4] when with_vertex_color
    order=None,         # f32 [T] draw order override (near-clip splits)
):
    """Returns (color, depth) after drawing the triangles in order."""
    H, W = depth.shape
    T = clip.shape[0]

    # Reuse the shared triangle setup (tile grid unused here: 1x1 tiles over
    # a grid the size of the framebuffer keeps bbox math harmless).
    su = S.setup_triangles(
        clip, uv, tex_id, tri_valid, viewport, scissor,
        tile_w=max(W, 1), tile_h=max(H, 1), grid_w=1, grid_h=1,
        order=order,
    )
    if with_vertex_color:
        vc = vertex_color
        # perspective-correct: interpolate (c * 1/w) then divide by 1/w
        inv_w = 1.0 / clip[..., 3]
        vc_over_w = vc * inv_w[..., None]             # [T, 3, 4]
        # plane coeffs [T, 4(rgba), 3(ABC)]; HIGHEST precision: bf16 MXU
        # rounding here corrupts interpolated colors by ~1e-3 on TPU.
        vc_planes = jnp.einsum("tik,tic->tkc", vc_over_w, su.lam,
                               precision=jax.lax.Precision.HIGHEST)
    else:
        vc_planes = jnp.zeros((T, 0, 3), jnp.float32)

    xc = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
    yc = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
    xi = jnp.arange(W, dtype=jnp.int32)[None, :]
    yi = jnp.arange(H, dtype=jnp.int32)[:, None]
    scx, scy, scw, sch = (scissor[i] for i in range(4))
    in_scissor = (xi >= scx) & (xi < scx + scw) & (yi >= scy) & (yi < scy + sch)

    chT = su.channels  # [T, NUM_CHANNELS]

    def body(carry, t):
        color, depth = carry
        ch = chT[t]

        def plane(row):
            return ch[row] * xc + ch[row + 1] * yc + ch[row + 2]

        e0, e1, e2 = plane(S.CH_E0), plane(S.CH_E1), plane(S.CH_E2)
        cov = (
            ((e0 > 0) | ((e0 == 0) & (ch[S.CH_TOPLEFT] > 0)))
            & ((e1 > 0) | ((e1 == 0) & (ch[S.CH_TOPLEFT + 1] > 0)))
            & ((e2 > 0) | ((e2 == 0) & (ch[S.CH_TOPLEFT + 2] > 0)))
        )
        z = plane(S.CH_Z)
        zq = quantize_depth(z, state.depth.format)
        frag = cov & in_scissor & su.valid[t] & (z >= 0.0) & (z <= 1.0)
        if state.depth.test_enable:
            frag = frag & apply_compare(state.depth.compare_op, zq, depth)

        inv_w = plane(S.CH_INVW)
        denom = jnp.where(inv_w == 0, 1.0, inv_w)
        u = plane(S.CH_UW) / denom
        v = plane(S.CH_VW) / denom
        src = sample_bilinear(
            texels, tex_offset, tex_width, tex_height,
            ch[S.CH_TEX].astype(jnp.int32), u, v,
        )
        if with_vertex_color:
            vcp = vc_planes[t]  # [4, 3]
            vcol = (
                vcp[:, 0][None, None] * xc[..., None]
                + vcp[:, 1][None, None] * yc[..., None]
                + vcp[:, 2][None, None]
            ) / denom[..., None]
            src = src * vcol

        blended = apply_blend(state.blend, src, color)
        color = jnp.where(frag[..., None], blended, color)
        if state.depth.write_enable:
            depth = jnp.where(frag, zq, depth)
        return (color, depth), None

    (color, depth), _ = jax.lax.scan(body, (color, depth), jnp.arange(T))
    return color, depth
