"""Near-plane clipping with static shapes.

Vulkan clips primitives against z_c >= 0 and w > 0 (the near plane).  For
triangles entirely in front (w > eps for all vertices), per-pixel z-bound
tests reproduce z clipping exactly, so the only primitive-level work is the
w <= eps crossing:

  #inside | result
  --------+--------------------------------------------
     3    | unchanged
     2    | quad -> the in-place triangle + ONE extra triangle
     1    | clipped triangle, rewritten in place
     0    | culled

Extra triangles are scattered into a reserved tail region of the triangle
arrays (capacity ``extra_cap``, overflow counted).  Both halves carry the
ORIGINAL draw order, so depth-tie resolution in the visibility rasterizer is
unaffected by the split.  Attributes interpolate linearly in clip space
(Vulkan spec 27.4), exactly like the oracle's Sutherland-Hodgman
(testing/oracle.py::clip_triangle).

We clip against the actual near plane z_c >= 0: for standard perspective
projections (w_c = -z_view), every post-clip vertex then has
w_c >= z_near > 0, so projected coordinates are well conditioned and the
remaining clip planes are equivalent to the rasterizer's per-pixel
z in [0, 1] + scissor tests.  (Pathological projective matrices that leave
w <= 0 after the near clip fall back to whole-triangle culling in setup.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

W_EPS = 1e-6


class ClippedTriangles(NamedTuple):
    clip: jax.Array      # f32 [T + X, 3, 4]
    uv: jax.Array        # f32 [T + X, 3, 2]
    tex_id: jax.Array    # i32 [T + X]
    valid: jax.Array     # bool [T + X]
    order: jax.Array     # f32 [T + X] original draw order per triangle
    overflow: jax.Array  # i32 [] extra triangles dropped


@functools.partial(jax.jit, static_argnames=("extra_cap",))
def near_clip_triangles(clip, uv, tex_id, valid, *, extra_cap: int) -> ClippedTriangles:
    T = clip.shape[0]
    order = jnp.arange(T, dtype=jnp.float32)

    s = clip[..., 2]                      # [T, 3] signed distance: z_c >= 0
    inside = s >= 0.0
    n_in = jnp.sum(inside.astype(jnp.int32), axis=1)
    main_valid = valid & (n_in > 0)
    wants_extra = valid & (n_in == 2)
    needs_any = jnp.any(valid & (n_in > 0) & (n_in < 3))

    zero_extra = (
        jnp.zeros((extra_cap, 3, 4), clip.dtype),
        jnp.zeros((extra_cap, 3, 2), uv.dtype),
        jnp.zeros((extra_cap,), jnp.float32),
        jnp.zeros((extra_cap,), bool),
    )

    def do_clip(_):
        # Rotate vertices so the case pattern is canonical, preserving
        # winding (cyclic):
        #   n_in == 1 -> the inside vertex at slot 0
        #   n_in == 2 -> the outside vertex at slot 2
        ins_idx = jnp.argmax(inside, axis=1)          # first inside vertex
        out_idx = jnp.argmax(~inside, axis=1)         # first outside vertex
        r = jnp.where(n_in == 1, ins_idx, (out_idx + 1) % 3)
        # static rolls + select (a dynamic per-element gather here costs
        # ~100 ms at 2M triangles)
        sel1 = (r == 1)[:, None, None]
        sel2 = (r == 2)[:, None, None]

        def rotate(a):
            # slice+concat, not fancy indexing: TPU lowers static-permutation
            # gathers to per-row latency-bound gathers
            a1 = jnp.concatenate([a[:, 1:3], a[:, 0:1]], axis=1)
            a2 = jnp.concatenate([a[:, 2:3], a[:, 0:2]], axis=1)
            return jnp.where(sel1, a1, jnp.where(sel2, a2, a))

        cr = rotate(clip)
        ur = rotate(uv)
        sr = cr[..., 2]

        def lerp_vertex(a_idx, b_idx):
            """Intersection of edge (a -> b) with the z_c = 0 plane."""
            sa = sr[:, a_idx]
            sb = sr[:, b_idx]
            denom = jnp.where(sb - sa == 0, 1.0, sb - sa)
            t = jnp.clip((0.0 - sa) / denom, 0.0, 1.0)[:, None]
            c = cr[:, a_idx] + t * (cr[:, b_idx] - cr[:, a_idx])
            u = ur[:, a_idx] + t * (ur[:, b_idx] - ur[:, a_idx])
            return c, u

        i01c, i01u = lerp_vertex(0, 1)
        i12c, i12u = lerp_vertex(1, 2)
        i20c, i20u = lerp_vertex(2, 0)

        # in-place triangle per case
        case1_c = jnp.stack([cr[:, 0], i01c, i20c], axis=1)
        case1_u = jnp.stack([ur[:, 0], i01u, i20u], axis=1)
        case2_c = jnp.stack([cr[:, 0], cr[:, 1], i12c], axis=1)
        case2_u = jnp.stack([ur[:, 0], ur[:, 1], i12u], axis=1)

        is1 = (n_in == 1)[:, None, None]
        is2 = (n_in == 2)[:, None, None]
        main_c = jnp.where(is1, case1_c, jnp.where(is2, case2_c, clip))
        main_u = jnp.where(is1, case1_u, jnp.where(is2, case2_u, uv))

        # extra triangle (second half of the quad) for n_in == 2, compacted
        # into the tail region by inverse lookup (gather, not scatter):
        # extra slot x belongs to the triangle whose cumulative extra count
        # first exceeds x.
        cum = jnp.cumsum(wants_extra.astype(jnp.int32))
        # method="sort": binary search does ~21 gather rounds over the
        # queries; a merge-sort pass is bandwidth-bound instead
        src = jnp.searchsorted(
            cum, jnp.arange(1, extra_cap + 1, dtype=jnp.int32), side="left",
            method="sort",
        ).astype(jnp.int32)
        src_ok = src < T
        src_c = jnp.clip(src, 0, T - 1)
        extra_c = jnp.stack([cr[:, 0], i12c, i20c], axis=1)[src_c]
        extra_u = jnp.stack([ur[:, 0], i12u, i20u], axis=1)[src_c]
        xo = order[src_c]
        xv = src_ok & wants_extra[src_c]
        return main_c, main_u, extra_c, extra_u, xo, xv

    def no_clip(_):
        return (clip, uv) + zero_extra[:2] + zero_extra[2:]

    main_c, main_u, xc, xu, xo, xv = jax.lax.cond(needs_any, do_clip, no_clip, None)

    n_extra = jnp.sum(wants_extra.astype(jnp.int32))
    overflow = jnp.maximum(n_extra - extra_cap, 0)
    # recover the texture id of each extra from its source triangle (= order)
    xt = jnp.where(xv, tex_id[jnp.clip(xo.astype(jnp.int32), 0, T - 1)], 0)

    return ClippedTriangles(
        clip=jnp.concatenate([main_c, xc]),
        uv=jnp.concatenate([main_u, xu]),
        tex_id=jnp.concatenate([tex_id, xt]),
        valid=jnp.concatenate([main_valid, xv]),
        order=jnp.concatenate([order, xo]),
        overflow=overflow.astype(jnp.int32),
    )
