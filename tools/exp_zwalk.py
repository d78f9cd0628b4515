"""Round-3 scoping: simulate the front-to-back early-exit walk at several
binning granularities on config5 (sponza-1M @1080p), host-side numpy.

For each granularity (tile/cell size) this rasterizes the scene exactly,
streaming each tile's entries in ascending conservative-zmin order (what
the binning sort produces) and counting
  - entries:   (triangle, tile) pairs the binning emits
  - visited:   entries processed before the exact early exit
               (zmin > current tile zmax ends the tile's stream)
  - winners:   entries owning >= 1 pixel in the final image
The visited count times the per-entry kernel cost IS the visibility stage;
winners is the floor no early-exit scheme can beat.  Decides whether a
cell-granularity formulation (sharper early exit, smaller per-entry tiles)
can pay for its larger entry/sort/gather tables.

    python tools/exp_zwalk.py [tw,th ...]    (default 128,16 16,8 8,8)
"""

import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exp_tristats import build_config5


def screen_tris(fb_w=1920, fb_h=1080):
    clip = build_config5()
    w = clip[..., 3]
    in_front = np.all(w > 1e-6, axis=1)
    ndc = clip[..., :3] / np.where(in_front[:, None], w, 1.0)[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * fb_w
    sy = (ndc[..., 1] * 0.5 + 0.5) * fb_h
    sz = ndc[..., 2]
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0])
    px0 = np.maximum(np.floor(sx.min(1) - 0.5).astype(np.int64), 0)
    px1 = np.minimum(np.ceil(sx.max(1) - 0.5).astype(np.int64), fb_w - 1)
    py0 = np.maximum(np.floor(sy.min(1) - 0.5).astype(np.int64), 0)
    py1 = np.minimum(np.ceil(sy.max(1) - 0.5).astype(np.int64), fb_h - 1)
    valid = in_front & (area2 != 0) & (px0 <= px1) & (py0 <= py1)
    zmin = np.clip(sz.min(1), 0.0, 1.0)
    return (sx[valid], sy[valid], sz[valid], area2[valid],
            px0[valid], px1[valid], py0[valid], py1[valid], zmin[valid])


def walk(tw, th, fb_w=1920, fb_h=1080):
    sx, sy, sz, area2, px0, px1, py0, py1, zmin = screen_tris(fb_w, fb_h)
    n = sx.shape[0]
    gw, gh = -(-fb_w // tw), -(-fb_h // th)

    tx0 = px0 // tw
    tx1 = px1 // tw
    ty0 = py0 // th
    ty1 = py1 // th
    ncov = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    total_entries = int(ncov.sum())

    # expand to (tile, zmin, tri) entries
    order = np.repeat(np.arange(n), ncov)
    # per-entry covered-tile index
    off = np.arange(total_entries) - np.repeat(
        np.cumsum(ncov) - ncov, ncov)
    tww = (tx1 - tx0 + 1)[order]
    cy = ty0[order] + off // tww
    cx = tx0[order] + off % tww
    tile = cy * gw + cx
    key = tile.astype(np.int64) * (1 << 21) + np.minimum(
        (zmin[order] * 65535).astype(np.int64), 65535) * 32 + 0
    sort_idx = np.argsort(key, kind="stable")
    e_tri = order[sort_idx]
    e_tile = tile[sort_idx]
    seg = np.searchsorted(e_tile, np.arange(gw * gh + 1))

    # plane setup (f64): edge functions sign-normalized, z-plane
    sgn = np.where(area2 > 0, 1.0, -1.0)
    ex = np.stack([sx[:, (e + 1) % 3] - sx[:, e] for e in range(3)], 1)
    ey = np.stack([sy[:, (e + 1) % 3] - sy[:, e] for e in range(3)], 1)

    visited = 0
    winners_mask = None
    zbuf = np.ones((gh * th, gw * tw), np.float64)
    ownr = np.full((gh * th, gw * tw), -1, np.int64)
    t0 = time.time()
    yy_cache = {}
    for t in range(gw * gh):
        s, e = seg[t], seg[t + 1]
        if s == e:
            continue
        tx, ty = t % gw, t // gw
        x_lo, y_lo = tx * tw, ty * th
        zb = zbuf[y_lo:y_lo + th, x_lo:x_lo + tw]
        ow = ownr[y_lo:y_lo + th, x_lo:x_lo + tw]
        zmax = 1.0
        for k in range(s, e):
            tri = e_tri[k]
            if zmin[tri] > zmax:
                break
            visited += 1
            # rasterize tri's bbox clipped to this tile
            bx0 = max(px0[tri], x_lo)
            bx1 = min(px1[tri], x_lo + tw - 1)
            by0 = max(py0[tri], y_lo)
            by1 = min(py1[tri], y_lo + th - 1)
            if bx0 > bx1 or by0 > by1:
                continue
            shape = (by1 - by0 + 1, bx1 - bx0 + 1)
            if shape not in yy_cache:
                yy_cache[shape] = np.mgrid[0:shape[0], 0:shape[1]]
            dy, dx = yy_cache[shape]
            pxc = bx0 + dx + 0.5
            pyc = by0 + dy + 0.5
            inside = np.ones(shape, bool)
            for ei in range(3):
                a = ei
                ev = ((pyc - sy[tri, a]) * ex[tri, ei]
                      - (pxc - sx[tri, a]) * ey[tri, ei]) * sgn[tri]
                tl = (ey[tri, ei] * sgn[tri] < 0) | (
                    (ey[tri, ei] == 0) & (ex[tri, ei] * sgn[tri] > 0))
                inside &= (ev > 0) | ((ev == 0) & tl)
            if not inside.any():
                continue
            # barycentric z
            l0 = ((pyc - sy[tri, 1]) * ex[tri, 1]
                  - (pxc - sx[tri, 1]) * ey[tri, 1]) * sgn[tri]
            l1 = ((pyc - sy[tri, 2]) * ex[tri, 2]
                  - (pxc - sx[tri, 2]) * ey[tri, 2]) * sgn[tri]
            l2 = ((pyc - sy[tri, 0]) * ex[tri, 0]
                  - (pxc - sx[tri, 0]) * ey[tri, 0]) * sgn[tri]
            den = l0 + l1 + l2
            den = np.where(den == 0, 1.0, den)
            z = (l0 * sz[tri, 2] + l1 * sz[tri, 0] + l2 * sz[tri, 1]) / den
            z = np.clip(z, 0.0, 1.0)
            zv = zb[by0 - y_lo:by1 - y_lo + 1, bx0 - x_lo:bx1 - x_lo + 1]
            ov = ow[by0 - y_lo:by1 - y_lo + 1, bx0 - x_lo:bx1 - x_lo + 1]
            passing = inside & (z <= zv)
            zv[passing] = z[passing]
            ov[passing] = k
            zmax = zb.max()
    winners = len(np.unique(ownr[ownr >= 0]))
    dt = time.time() - t0
    print(f"tile {tw}x{th}: entries={total_entries/1e6:.2f}M "
          f"visited={visited/1e6:.2f}M ({100*visited/total_entries:.0f}%) "
          f"winners={winners/1e6:.2f}M "
          f"({100*winners/total_entries:.0f}% of entries)  [{dt:.0f}s]")


if __name__ == "__main__":
    geoms = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (128, 16), (16, 8), (8, 8)]
    for tw, th in geoms:
        walk(tw, th)
