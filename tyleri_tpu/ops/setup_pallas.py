"""Fused vertex-transform + near-cull + triangle-setup Pallas kernel.

The XLA formulation of this stage (ops/setup.py + ops/clip.py) measures
~15 ms/frame at 1M triangles on TPU: every elementwise intermediate (clip
positions, NDC, edge coefficients, interpolation planes) is HBM-materialized
by the fusion boundaries the clip pass forces (see
ops/clip.py::near_cull_triangles).  This kernel computes the whole chain —
MVP transform, near-plane cull + crossing telemetry, viewport transform,
edge/interp plane setup, tile bbox, validity and the z-min bound — in one
pass over the cached corner table: reads ~[18, T] f32, writes the [T, 24]
channel table + one packed i32 word per triangle.  The per-draw MVP is
selected in-register by a masked sweep over the (small) draw table, which
replaces the XLA one-hot matmul (ops/setup.py::transform_corner_table).

Semantics: identical to near_cull_triangles + setup_triangles (the adaptive
clip-SKIP path): triangles crossing the near plane are culled and COUNTED
(reported via PassStats.clip_crossings so the frame plan re-enables the full
XLA clipping path next frame, ForwardRenderingFunction.note_overflow).
Geometry and channel formulas mirror ops/setup.py line for line; the golden
tests hold both paths to the oracle within the edge budget, and on TPU both
raster backends consume this kernel's output (tools/compare_backends.py).

Ref: the vertex stage + fixed-function setup this replaces is the
reference's common_pipeline.vert (src/pipeline/glsl/common_pipeline.vert:16-19)
driven per mesh by cmd_draw_indexed + push constants
(src/render_objects/mesh_renderer.rs:52-78).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tyleri_tpu.ops import setup as S

BLOCK = 1024  # triangles per grid step: 8 sublane-rows of 128 lanes

# corner18 field indices (field-major table [18, N/128, 128])
F_V0 = 0   # x0 y0 z0 u0 v0
F_V1 = 5
F_V2 = 10
F_TEX = 15   # texture slot as f32; < 0 marks an invalid (padding) triangle
F_DRAW = 16  # draw id as f32
F_PAD = 17

# packed output bit layout (computed shifts depend on grid dims; see
# pack_shifts): [crossed:1][valid:1][ty1][ty0][tx1][tx0]


def pack_shifts(grid_w: int, grid_h: int):
    bw = max(int(grid_w - 1).bit_length(), 1)
    bh = max(int(grid_h - 1).bit_length(), 1)
    if 2 + 2 * (bw + bh) > 31:
        return None
    return bw, bh


def supports(plan) -> bool:
    """Host-side gate: pow2 tiles, packable grid, TPU lowering."""
    return (
        plan.tile_w & (plan.tile_w - 1) == 0
        and plan.tile_h & (plan.tile_h - 1) == 0
        and pack_shifts(plan.grid_w, plan.grid_h) is not None
    )


def _transform_kernel(
    viewport_ref,   # f32 [6] SMEM (x, y, w, h, min_depth, max_depth)
    scissor_ref,    # f32 [4] SMEM (unused here; shared prefetch signature)
    camv_ref,       # i32 [3] SMEM (camera-valid, draw_mod_n, draw_mod_i) —
                    # the mod mask is the sharded path's ParallelGroup
                    # round-robin (parallel/sharding.py)
    corner_ref,     # f32 [18, 8, 128] block
    mvp_ref,        # f32 [D, 16] SMEM per-draw MVP (row-major 4x4)
    win_ref,        # f32 [12, 8, 128] out: (sx, sy, sz, 1/w) x 3 corners
    flags_ref,      # i32 [8, 128] out: bit0 pre-valid, bit1 crossed
    *,
    draw_cap: int,
):
    """Stage 1 of the fused setup: MVP transform + near-cull + viewport.

    Split from the plane-setup stage because the single fused kernel sat on
    a Mosaic compile cliff: with everything in one body, compiles exceeded
    10 minutes, while removing ANY one feature dropped them to ~3 s.  Two
    kernels of ~half the op count each compile in seconds; the win12
    intermediate is 64 B/triangle of HBM traffic (~0.2 ms at 1M)."""
    def fld(k):
        return corner_ref[k]

    # ---- per-draw MVP selection: masked sweep over the draw table ----
    # (exact: selects only, no arithmetic — matches the XLA one-hot matmul
    # at HIGHEST precision, which is also exact for 0/1 weights).  The
    # sharded round-robin draw mask folds into the same sweep as a SCALAR
    # rem per draw — a per-lane i32 rem by a dynamic divisor would lower to
    # bit-serial division.
    draw = fld(F_DRAW).astype(jnp.int32)
    m = [jnp.zeros((8, 128), jnp.float32) for _ in range(16)]
    draw_kept = jnp.zeros((8, 128), jnp.bool_)
    for d in range(draw_cap):
        sel = draw == d
        keep_d = jax.lax.rem(jnp.int32(d), camv_ref[1]) == camv_ref[2]
        draw_kept = draw_kept | (sel & keep_d)
        for k in range(16):
            m[k] = jnp.where(sel, mvp_ref[d, k], m[k])

    # ---- vertex transform: clip = MVP @ (pos, 1) per corner ----
    # same contraction order as the XLA broadcast-multiply-reduce
    def transform(base):
        x, y, z = fld(base), fld(base + 1), fld(base + 2)
        out = []
        for j in range(4):
            out.append(
                m[4 * j] * x + m[4 * j + 1] * y + m[4 * j + 2] * z
                + m[4 * j + 3]
            )
        return out  # [cx, cy, cz, cw]

    c0 = transform(F_V0)
    c1 = transform(F_V1)
    c2 = transform(F_V2)

    tex = fld(F_TEX)
    tri_valid = (tex >= 0.0) & (camv_ref[0] > 0) & draw_kept

    # ---- near-plane cull + crossing telemetry (clip.py semantics) ----
    ins0 = c0[2] >= 0.0
    ins1 = c1[2] >= 0.0
    ins2 = c2[2] >= 0.0
    n_in = (ins0.astype(jnp.int32) + ins1.astype(jnp.int32)
            + ins2.astype(jnp.int32))
    crossed = tri_valid & (n_in > 0) & (n_in < 3)
    tri_valid = tri_valid & (n_in == 3)

    # ---- viewport transform (setup.py::viewport_transform) ----
    in_front = (c0[3] > S.W_EPS) & (c1[3] > S.W_EPS) & (c2[3] > S.W_EPS)
    one = jnp.float32(1.0)
    vx, vy = viewport_ref[0], viewport_ref[1]
    vw, vh = viewport_ref[2], viewport_ref[3]
    dmin, dmax = viewport_ref[4], viewport_ref[5]

    for ci, c in enumerate((c0, c1, c2)):
        # dead/behind corners use the safe_clip=1 substitution (XLA path)
        w = jnp.where(in_front, c[3], one)
        inv_w = 1.0 / w
        cx = jnp.where(in_front, c[0], one)
        cy = jnp.where(in_front, c[1], one)
        cz = jnp.where(in_front, c[2], one)
        win_ref[4 * ci] = (cx * inv_w * 0.5 + 0.5) * vw + vx
        win_ref[4 * ci + 1] = (cy * inv_w * 0.5 + 0.5) * vh + vy
        win_ref[4 * ci + 2] = dmin + cz * inv_w * (dmax - dmin)
        win_ref[4 * ci + 3] = inv_w

    flags_ref[...] = (
        (tri_valid & in_front).astype(jnp.int32)
        | (crossed.astype(jnp.int32) << 1)
    )


def _plane_kernel(
    viewport_ref,   # f32 [6] SMEM
    scissor_ref,    # f32 [4] SMEM (x, y, w, h)
    camv_ref,       # i32 [3] SMEM (unused here; shared prefetch signature)
    corner_ref,     # f32 [18, 8, 128] block (uv + tex fields)
    win_ref,        # f32 [12, 8, 128] block from _transform_kernel
    flags_ref,      # i32 [8, 128] block from _transform_kernel
    ch_ref,         # f32 [BLOCK, 24] out
    packed_ref,     # i32 [8, 128] out
    ch_scratch,     # f32 [24, 8, 128] VMEM channel staging
    *,
    tile_shift_x: int,
    tile_shift_y: int,
    grid_w: int,
    grid_h: int,
    bw: int,
    bh: int,
    cull: int,       # 0 none / 1 cull backfaces / 2 cull frontfaces / 3 all
    ccw_front: bool,
):
    """Stage 2 of the fused setup: edge/interp planes, tile bbox, validity,
    z-min bound, channel emit (see _transform_kernel for the split note)."""
    i = pl.program_id(0)

    def fld(k):
        return corner_ref[k]

    uv = [(fld(F_V0 + 3), fld(F_V0 + 4)),
          (fld(F_V1 + 3), fld(F_V1 + 4)),
          (fld(F_V2 + 3), fld(F_V2 + 4))]
    tex = fld(F_TEX)
    one = jnp.float32(1.0)
    vx, vy = viewport_ref[0], viewport_ref[1]
    vw, vh = viewport_ref[2], viewport_ref[3]
    sx0, sy0, sz0, iw0 = (win_ref[0], win_ref[1], win_ref[2], win_ref[3])
    sx1, sy1, sz1, iw1 = (win_ref[4], win_ref[5], win_ref[6], win_ref[7])
    sx2, sy2, sz2, iw2 = (win_ref[8], win_ref[9], win_ref[10], win_ref[11])
    flags = flags_ref[...]
    tri_valid = (flags & 1) > 0
    in_front = tri_valid  # folded into bit 0 by the transform stage

    # ---- signed doubled area + edge planes (setup.py) ----
    area2 = (sx1 - sx0) * (sy2 - sy0) - (sy1 - sy0) * (sx2 - sx0)
    nondeg = area2 != 0.0
    sgn = jnp.where(area2 > 0, 1.0, -1.0)
    inv_abs_area2 = sgn / jnp.where(nondeg, area2, one)

    # edge i from a=(i+1)%3 to b=(i+2)%3
    ax = (sx1, sx2, sx0)
    ay = (sy1, sy2, sy0)
    bx = (sx2, sx0, sx1)
    by = (sy2, sy0, sy1)
    eA, eB, eC, tl = [], [], [], []
    for e in range(3):
        dx = bx[e] - ax[e]
        dy = by[e] - ay[e]
        eA.append(-dy * sgn)
        eB.append(dx * sgn)
        eC.append((ax[e] * dy - ay[e] * dx) * sgn)
        edx = dx * sgn
        edy = dy * sgn
        tl.append(jnp.where((edy < 0) | ((edy == 0) & (edx > 0)), 1.0, 0.0))
        if e < 2:
            # stage to VMEM immediately (see ch_scratch note)
            ch_scratch[3 * e] = eA[e]
            ch_scratch[3 * e + 1] = eB[e]
            ch_scratch[3 * e + 2] = eC[e]

    # edge 2 is derived by the rasterizers (e0+e1+e2 == |2A|): store the
    # doubled area at CH_TWOA, matching setup.py bit-exactly (same exprs)
    ch_scratch[S.CH_TWOA] = area2 * sgn
    ch_scratch[S.CH_TWOA + 1] = jnp.zeros_like(area2)
    ch_scratch[S.CH_TWOA + 2] = jnp.zeros_like(area2)

    lamA = [eA[e] * inv_abs_area2 for e in range(3)]
    lamB = [eB[e] * inv_abs_area2 for e in range(3)]
    lamC = [eC[e] * inv_abs_area2 for e in range(3)]

    def attr_plane(row, v0, v1, v2):
        ch_scratch[row] = v0 * lamA[0] + v1 * lamA[1] + v2 * lamA[2]
        ch_scratch[row + 1] = v0 * lamB[0] + v1 * lamB[1] + v2 * lamB[2]
        ch_scratch[row + 2] = v0 * lamC[0] + v1 * lamC[1] + v2 * lamC[2]

    attr_plane(S.CH_Z, sz0, sz1, sz2)
    attr_plane(S.CH_INVW, iw0, iw1, iw2)
    attr_plane(S.CH_UW, uv[0][0] * iw0, uv[1][0] * iw1, uv[2][0] * iw2)
    attr_plane(S.CH_VW, uv[0][1] * iw0, uv[1][1] * iw1, uv[2][1] * iw2)
    zA = ch_scratch[S.CH_Z]
    zB = ch_scratch[S.CH_Z + 1]
    zC = ch_scratch[S.CH_Z + 2]

    # ---- tile bbox clamped to scissor (setup.py) ----
    scx, scy = scissor_ref[0], scissor_ref[1]
    scw, sch = scissor_ref[2], scissor_ref[3]
    bx0f = jnp.minimum(jnp.minimum(sx0, sx1), sx2)
    bx1f = jnp.maximum(jnp.maximum(sx0, sx1), sx2)
    by0f = jnp.minimum(jnp.minimum(sy0, sy1), sy2)
    by1f = jnp.maximum(jnp.maximum(sy0, sy1), sy2)
    px0 = jnp.maximum(jnp.floor(bx0f - 0.5).astype(jnp.int32),
                      scx.astype(jnp.int32))
    px1 = jnp.minimum(jnp.ceil(bx1f - 0.5).astype(jnp.int32),
                      (scx + scw).astype(jnp.int32) - 1)
    py0 = jnp.maximum(jnp.floor(by0f - 0.5).astype(jnp.int32),
                      scy.astype(jnp.int32))
    py1 = jnp.minimum(jnp.ceil(by1f - 0.5).astype(jnp.int32),
                      (scy + sch).astype(jnp.int32) - 1)
    tx0 = jnp.clip(px0 >> tile_shift_x, 0, grid_w - 1)
    tx1 = jnp.clip(px1 >> tile_shift_x, 0, grid_w - 1)
    ty0 = jnp.clip(py0 >> tile_shift_y, 0, grid_h - 1)
    ty1 = jnp.clip(py1 >> tile_shift_y, 0, grid_h - 1)
    on_screen = (px0 <= px1) & (py0 <= py1)

    valid = tri_valid & nondeg & on_screen
    crossed = (flags & 2) > 0
    # Vulkan cull test, as setup.py::cull_keep_mask
    if cull == 3:
        valid = valid & False
    elif cull:
        is_front = (area2 > 0) == ccw_front
        valid = valid & (is_front if cull == 1 else ~is_front)

    # ---- z-min early-exit bound (setup.py::_zmin_quantized) ----
    zmin = jnp.minimum(jnp.minimum(sz0, sz1), sz2)
    zmax = jnp.maximum(jnp.maximum(sz0, sz1), sz2)
    in_range = (zmin >= 0.0) & (zmax <= 1.0)
    fbw = jnp.abs(vx) + vw + 128.0
    fbh = jnp.abs(vy) + vh + 128.0
    err = (jnp.abs(zA) * fbw + jnp.abs(zB) * fbh + jnp.abs(zC)) * (
        8.0 * 2.0 ** -24
    )
    zsafe = in_range & (err * 65535.0 < S.ZMIN_SLACK_Q)
    zq = jnp.clip(jnp.floor(zmin * 65535.0) - S.ZMIN_SLACK_Q, 0.0, 65535.0)
    ch_zmin = jnp.where(zsafe, zq, 0.0)

    # ---- emit: staged channels -> row-major [BLOCK, 24] ----
    ch_scratch[S.CH_ZMIN] = ch_zmin
    tl_bits = tl[0] + 2.0 * tl[1] + 4.0 * tl[2]
    texf = jnp.clip(tex, 0.0, float(S.META_TEX_MASK))
    ch_scratch[S.CH_META] = (
        tl_bits * float(1 << S.META_TEX_BITS) + jnp.floor(texf)
    )
    row = (i * BLOCK
           + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    ch_scratch[S.CH_ORDER] = row.astype(jnp.float32)
    stacked = ch_scratch[...].reshape(24, BLOCK)
    ch_ref[...] = jnp.transpose(stacked, (1, 0))

    packed = (
        crossed.astype(jnp.int32) << (1 + 2 * (bw + bh))
        | valid.astype(jnp.int32) << (2 * (bw + bh))
        | ty1 << (bw + bh + bw)
        | ty0 << (2 * bw)
        | tx1 << bw
        | tx0
    )
    packed_ref[...] = packed


@functools.partial(
    jax.jit,
    static_argnames=("tile_w", "tile_h", "grid_w", "grid_h", "draw_cap",
                     "cull_mode", "front_face", "interpret"),
)
def fused_setup(
    corner18,   # f32 [18, N/128, 128] field-major corner table
    mvps,       # f32 [D, 16] per-draw MVP (view_proj @ model, row-major)
    cam_valid,  # bool [] camera-valid flag
    viewport,   # f32 [6]
    scissor,    # i32 [4]
    draw_mod=None,  # optional (n, i) traced i32 pair: keep draws with
                    # draw % n == i (sharded round-robin); None = all
    *,
    tile_w: int,
    tile_h: int,
    grid_w: int,
    grid_h: int,
    draw_cap: int,
    cull_mode=None,   # pipeline cull state (static; None = CullMode.NONE)
    front_face=None,
    interpret: bool = False,
):
    """Returns (TriangleSetup, crossings i32[]) — near-cull semantics.

    N (= corner18.shape[1] * 128) must be a multiple of BLOCK.
    """
    from tyleri_tpu.pipeline.state import CullMode, FrontFace

    cull = {None: 0, CullMode.NONE: 0, CullMode.BACK: 1, CullMode.FRONT: 2,
            CullMode.FRONT_AND_BACK: 3}[cull_mode]
    ccw_front = front_face in (None, FrontFace.COUNTER_CLOCKWISE)
    nrows = corner18.shape[1]
    N = nrows * 128
    assert N % BLOCK == 0, N
    sh = pack_shifts(grid_w, grid_h)
    assert sh is not None, "grid too large for packed bbox"
    bw, bh = sh
    assert tile_w & (tile_w - 1) == 0 and tile_h & (tile_h - 1) == 0

    if draw_mod is None:
        dm = jnp.array([1, 0], jnp.int32)
    else:
        dm = jnp.stack([draw_mod[0].astype(jnp.int32),
                        draw_mod[1].astype(jnp.int32)])
    flags_in = jnp.concatenate(
        [cam_valid.astype(jnp.int32).reshape(1), dm])
    vp_f = viewport.astype(jnp.float32)
    sc_f = scissor.astype(jnp.float32)

    # stage 1: transform + cull + viewport (see _transform_kernel note on
    # why this is two kernels)
    t_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // BLOCK,),
        in_specs=[
            pl.BlockSpec((18, BLOCK // 128, 128), lambda i, *_: (0, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((12, BLOCK // 128, 128), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((BLOCK // 128, 128), lambda i, *_: (i, 0)),
        ],
    )
    win12, flagsA = pl.pallas_call(
        functools.partial(_transform_kernel, draw_cap=draw_cap),
        grid_spec=t_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        out_shape=[
            jax.ShapeDtypeStruct((12, nrows, 128), jnp.float32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(vp_f, sc_f, flags_in, corner18, mvps.astype(jnp.float32))

    # stage 2: plane setup + bbox + channel emit
    p_kernel = functools.partial(
        _plane_kernel,
        tile_shift_x=tile_w.bit_length() - 1,
        tile_shift_y=tile_h.bit_length() - 1,
        grid_w=grid_w, grid_h=grid_h, bw=bw, bh=bh,
        cull=cull, ccw_front=ccw_front,
    )
    p_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // BLOCK,),
        in_specs=[
            pl.BlockSpec((18, BLOCK // 128, 128), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((12, BLOCK // 128, 128), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((BLOCK // 128, 128), lambda i, *_: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK, 24), lambda i, *_: (i, 0)),
            pl.BlockSpec((BLOCK // 128, 128), lambda i, *_: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, BLOCK // 128, 128), jnp.float32),
        ],
    )
    channels, packed = pl.pallas_call(
        p_kernel,
        grid_spec=p_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        out_shape=[
            jax.ShapeDtypeStruct((N, 24), jnp.float32),
            jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
        ],
        interpret=interpret,
    )(vp_f, sc_f, flags_in, corner18, win12, flagsA)

    packed_flat = packed.reshape(N)
    mask = (1 << bw) - 1
    maskh = (1 << bh) - 1
    tx0 = packed_flat & mask
    tx1 = (packed_flat >> bw) & mask
    ty0 = (packed_flat >> (2 * bw)) & maskh
    ty1 = (packed_flat >> (2 * bw + bh)) & maskh
    valid = ((packed_flat >> (2 * (bw + bh))) & 1) > 0
    crossed = (packed_flat >> (1 + 2 * (bw + bh))) > 0
    crossings = jnp.sum(packed_flat >> (1 + 2 * (bw + bh)))

    su = S.TriangleSetup(
        valid=valid,
        channels=channels,
        tile_lo=jnp.stack([tx0, ty0], axis=1),
        tile_hi=jnp.stack([tx1, ty1], axis=1),
        lam=jnp.zeros((N, 3, 3), jnp.float32),  # unused by the binned path
    )
    # crossed [N]: per-triangle near-plane crossing flag (same tri_valid
    # gates as the cull — camera/draw-mod/tex).  The hybrid clip path
    # (rendering/passes.py::_fused_clip_subset) re-clips exactly these
    # rows in XLA; cull-mode callers may ignore it.
    return su, crossings.astype(jnp.int32), crossed


def build_corner18(corner, tri_draw, tri_tex, tri_valid):
    """Relayout the cached [T, 3, 5+] corner table (+draw/tex/valid) into
    the field-major [18, ceil(T/BLOCK)*BLOCK/128, 128] table the kernel
    reads.  Runs once per draw-list change (cached next to the corner
    table).  Normal fields (lit path) stay in the row-major table — the
    fused kernel serves the unlit fast path."""
    T = corner.shape[0]
    Np = -(-T // BLOCK) * BLOCK
    flat = corner[..., :5].reshape(T, 15)
    texf = jnp.where(tri_valid, tri_tex.astype(jnp.float32), -1.0)
    cols = jnp.concatenate(
        [flat, texf[:, None], tri_draw.astype(jnp.float32)[:, None],
         jnp.zeros((T, 1), jnp.float32)], axis=1)          # [T, 18]
    cols = jnp.pad(cols, ((0, Np - T), (0, 0)),
                   constant_values=-1.0)  # pad rows invalid (tex < 0)
    return jnp.transpose(cols, (1, 0)).reshape(18, Np // 128, 128)
