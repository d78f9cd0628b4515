"""Round-3 scoping #2: visit counts under PRODUCTION exit semantics.

exp_zwalk.py counts the ideal per-entry-exit walk (0.20M visits on sponza
at (128,16) tiles).  The shipping kernel exits at CHUNK granularity with a
threshold that lags one chunk behind.  This sim reproduces that exactly and
scores the candidate sharpenings, giving the visit multiplier each buys:

  ideal       thresh refreshed after every entry (exp_zwalk semantics)
  chunk128    production: thresh refreshed at 128-aligned chunk ends,
              whole chunk processed once its first entry passes
  groupG      thresh refreshed every G entries, entry-exact exit test
  local       same, with CH_ZMIN tightened to the tile-local z-plane min
              (evaluate the affine z plane at the tile-rect corner chosen
              by coefficient signs instead of the triangle-global zmin)

    python tools/exp_zwalk2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.exp_zwalk import screen_tris


def build(tw, th, fb_w=1920, fb_h=1080):
    sx, sy, sz, area2, px0, px1, py0, py1, zmin = screen_tris(fb_w, fb_h)
    n = sx.shape[0]
    gw, gh = -(-fb_w // tw), -(-fb_h // th)

    # affine z plane z(x,y) = a*x + b*y + c via the adjugate
    x0, x1, x2 = sx[:, 0], sx[:, 1], sx[:, 2]
    y0, y1, y2 = sy[:, 0], sy[:, 1], sy[:, 2]
    z0, z1, z2 = sz[:, 0], sz[:, 1], sz[:, 2]
    det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    det = np.where(det == 0, 1.0, det)
    za = ((z1 - z0) * (y2 - y0) - (z2 - z0) * (y1 - y0)) / det
    zb = ((z2 - z0) * (x1 - x0) - (z1 - z0) * (x2 - x0)) / det
    zc = z0 - za * x0 - zb * y0

    tx0, tx1 = px0 // tw, px1 // tw
    ty0, ty1 = py0 // th, py1 // th
    ncov = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    total = int(ncov.sum())
    order = np.repeat(np.arange(n), ncov)
    off = np.arange(total) - np.repeat(np.cumsum(ncov) - ncov, ncov)
    tww = (tx1 - tx0 + 1)[order]
    cy = ty0[order] + off // tww
    cx = tx0[order] + off % tww
    tile = cy * gw + cx

    # tile-local zmin: clamp the affine plane's min over the bbox∩tile rect
    rx0 = np.maximum(px0[order], cx * tw).astype(np.float64) + 0.5
    rx1 = np.minimum(px1[order], cx * tw + tw - 1).astype(np.float64) + 0.5
    ry0 = np.maximum(py0[order], cy * th).astype(np.float64) + 0.5
    ry1 = np.minimum(py1[order], cy * th + th - 1).astype(np.float64) + 0.5
    xz = np.where(za[order] >= 0, rx0, rx1)
    yz = np.where(zb[order] >= 0, ry0, ry1)
    zlocal = za[order] * xz + zb[order] * yz + zc[order]
    # the plane min can undershoot the triangle's own zmin outside the tri;
    # both are valid lower bounds, take the tighter
    zlocal = np.clip(np.maximum(zlocal, zmin[order]), 0.0, 1.0)

    return dict(sx=sx, sy=sy, sz=sz, area2=area2, px0=px0, px1=px1,
                py0=py0, py1=py1, zmin=zmin, gw=gw, gh=gh, tw=tw, th=th,
                order=order, tile=tile, zlocal=zlocal, total=total)


def walk(d, mode, chunk=128, group=8, local=False):
    tw, th, gw, gh = d["tw"], d["th"], d["gw"], d["gh"]
    sx, sy, sz = d["sx"], d["sy"], d["sz"]
    area2 = d["area2"]
    px0, px1, py0, py1 = d["px0"], d["px1"], d["py0"], d["py1"]
    bound = d["zlocal"] if local else np.clip(d["zmin"][d["order"]], 0, 1)
    key = d["tile"].astype(np.int64) * (1 << 22) + np.minimum(
        (bound * 65535).astype(np.int64), 65535) * 32
    sort_idx = np.argsort(key, kind="stable")
    e_tri = d["order"][sort_idx]
    e_bound = bound[sort_idx]
    e_tile = d["tile"][sort_idx]
    seg = np.searchsorted(e_tile, np.arange(gw * gh + 1))

    sgn = np.where(area2 > 0, 1.0, -1.0)
    ex = np.stack([sx[:, (e + 1) % 3] - sx[:, e] for e in range(3)], 1)
    ey = np.stack([sy[:, (e + 1) % 3] - sy[:, e] for e in range(3)], 1)

    visited = 0
    t0 = time.time()
    yy_cache = {}
    for t in range(gw * gh):
        s, e = int(seg[t]), int(seg[t + 1])
        if s == e:
            continue
        tx, ty = t % gw, t // gw
        x_lo, y_lo = tx * tw, ty * th
        zb = np.ones((th, tw), np.float64)
        zmax = 1.0
        k = s
        while k < e:
            if mode == "ideal":
                k_hi = k + 1
                if e_bound[k] > zmax:
                    break
            elif mode == "chunk":
                # production: 128-aligned chunk, gate on its first live entry
                base = k - (k % chunk)
                k_hi = min(base + chunk, e)
                if e_bound[k] > zmax:
                    break
            else:  # group
                k_hi = min(k + group, e)
                if e_bound[k] > zmax:
                    break
            for kk in range(k, k_hi):
                visited += 1
                tri = e_tri[kk]
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
                    ev = ((pyc - sy[tri, ei]) * ex[tri, ei]
                          - (pxc - sx[tri, ei]) * ey[tri, ei]) * sgn[tri]
                    tl = (ey[tri, ei] * sgn[tri] < 0) | (
                        (ey[tri, ei] == 0) & (ex[tri, ei] * sgn[tri] > 0))
                    inside &= (ev > 0) | ((ev == 0) & tl)
                if not inside.any():
                    continue
                l0 = ((pyc - sy[tri, 1]) * ex[tri, 1]
                      - (pxc - sx[tri, 1]) * ey[tri, 1]) * sgn[tri]
                l1 = ((pyc - sy[tri, 2]) * ex[tri, 2]
                      - (pxc - sx[tri, 2]) * ey[tri, 2]) * sgn[tri]
                l2 = ((pyc - sy[tri, 0]) * ex[tri, 0]
                      - (pxc - sx[tri, 0]) * ey[tri, 0]) * sgn[tri]
                den = l0 + l1 + l2
                den = np.where(den == 0, 1.0, den)
                z = np.clip((l0 * sz[tri, 2] + l1 * sz[tri, 0]
                             + l2 * sz[tri, 1]) / den, 0.0, 1.0)
                sl = (slice(by0 - y_lo, by1 - y_lo + 1),
                      slice(bx0 - x_lo, bx1 - x_lo + 1))
                zv = zb[sl]
                passing = inside & (z <= zv)
                zv[passing] = z[passing]
            zmax = zb.max()
            k = k_hi
    dt = time.time() - t0
    tag = f"{mode}{group if mode == 'group' else ''}{'_local' if local else ''}"
    print(f"{tag:16s} entries={d['total']/1e6:.2f}M "
          f"visited={visited/1e6:.3f}M ({100*visited/d['total']:.0f}%) "
          f"[{dt:.0f}s]", flush=True)
    return visited


if __name__ == "__main__":
    d = build(128, 16)
    print(f"grid {d['gw']}x{d['gh']} entries={d['total']/1e6:.2f}M",
          flush=True)
    walk(d, "chunk")
    walk(d, "ideal")
    walk(d, "group", group=8)
    walk(d, "group", group=32)
    walk(d, "chunk", local=True)
    walk(d, "group", group=8, local=True)
    walk(d, "ideal", local=True)


def walk_lag(d, chunk=128, lag=2):
    """chunk-mode walk with the threshold LAGGING ``lag`` chunk boundaries
    (pipelined vector->scalar crossing in the kernel hides the reduce
    latency behind a chunk of work; costs these extra visits)."""
    tw, th, gw, gh = d["tw"], d["th"], d["gw"], d["gh"]
    sx, sy, sz = d["sx"], d["sy"], d["sz"]
    area2 = d["area2"]
    px0, px1, py0, py1 = d["px0"], d["px1"], d["py0"], d["py1"]
    bound = np.clip(d["zmin"][d["order"]], 0, 1)
    key = d["tile"].astype(np.int64) * (1 << 22) + np.minimum(
        (bound * 65535).astype(np.int64), 65535) * 32
    sort_idx = np.argsort(key, kind="stable")
    e_tri = d["order"][sort_idx]
    e_bound = bound[sort_idx]
    e_tile = d["tile"][sort_idx]
    seg = np.searchsorted(e_tile, np.arange(gw * gh + 1))
    sgn = np.where(area2 > 0, 1.0, -1.0)
    ex = np.stack([sx[:, (e + 1) % 3] - sx[:, e] for e in range(3)], 1)
    ey = np.stack([sy[:, (e + 1) % 3] - sy[:, e] for e in range(3)], 1)
    visited = 0
    yy_cache = {}
    for t in range(gw * gh):
        s, e = int(seg[t]), int(seg[t + 1])
        if s == e:
            continue
        tx, ty = t % gw, t // gw
        x_lo, y_lo = tx * tw, ty * th
        zb = np.ones((th, tw), np.float64)
        hist = [1.0] * lag  # thresholds pending publication
        k = s
        while k < e:
            k_hi = min(k + chunk, e)
            if e_bound[k] > hist[0]:
                break
            for kk in range(k, k_hi):
                visited += 1
                tri = e_tri[kk]
                bx0 = max(px0[tri], x_lo); bx1 = min(px1[tri], x_lo + tw - 1)
                by0 = max(py0[tri], y_lo); by1 = min(py1[tri], y_lo + th - 1)
                if bx0 > bx1 or by0 > by1:
                    continue
                shape = (by1 - by0 + 1, bx1 - bx0 + 1)
                if shape not in yy_cache:
                    yy_cache[shape] = np.mgrid[0:shape[0], 0:shape[1]]
                dy, dx = yy_cache[shape]
                pxc = bx0 + dx + 0.5; pyc = by0 + dy + 0.5
                inside = np.ones(shape, bool)
                for ei in range(3):
                    ev = ((pyc - sy[tri, ei]) * ex[tri, ei]
                          - (pxc - sx[tri, ei]) * ey[tri, ei]) * sgn[tri]
                    tl = (ey[tri, ei] * sgn[tri] < 0) | (
                        (ey[tri, ei] == 0) & (ex[tri, ei] * sgn[tri] > 0))
                    inside &= (ev > 0) | ((ev == 0) & tl)
                if not inside.any():
                    continue
                l0 = ((pyc - sy[tri, 1]) * ex[tri, 1]
                      - (pxc - sx[tri, 1]) * ey[tri, 1]) * sgn[tri]
                l1 = ((pyc - sy[tri, 2]) * ex[tri, 2]
                      - (pxc - sx[tri, 2]) * ey[tri, 2]) * sgn[tri]
                l2 = ((pyc - sy[tri, 0]) * ex[tri, 0]
                      - (pxc - sx[tri, 0]) * ey[tri, 0]) * sgn[tri]
                den = l0 + l1 + l2
                den = np.where(den == 0, 1.0, den)
                z = np.clip((l0 * sz[tri, 2] + l1 * sz[tri, 0]
                             + l2 * sz[tri, 1]) / den, 0.0, 1.0)
                sl = (slice(by0 - y_lo, by1 - y_lo + 1),
                      slice(bx0 - x_lo, bx1 - x_lo + 1))
                zv = zb[sl]
                passing = inside & (z <= zv)
                zv[passing] = z[passing]
            hist = hist[1:] + [zb.max()]
            k = k_hi
    print(f"lag{lag}            entries={d['total']/1e6:.2f}M "
          f"visited={visited/1e6:.3f}M ({100*visited/d['total']:.0f}%)",
          flush=True)
