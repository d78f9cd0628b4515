"""Round-3 scoping: per-triangle statistics of config5 (sponza-1M @1080p).

Quantifies the formulation-change opportunity before building it:
  - fraction of valid triangles whose snapped pixel-center bbox is empty
    (zero-coverage candidates killable in setup)
  - exact zero-coverage fraction for small-bbox triangles (<= KxK centers)
  - bbox-size and covered-tile distributions (entry counts at several tile
    geometries)
  - back-facing fraction (cull-mode opportunity)

Pure numpy on the host: replicates setup_triangles' snapping math at f64.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tyleri_tpu.models import primitives as prim
from tyleri_tpu.utils import math3d


def build_config5(grid_n=420, t=0.3):
    tris = []
    for li in range(3):
        verts, idx = prim.displaced_grid(grid_n, extent=14.0, seed=li)
        verts = verts.copy()
        verts[:, 1] += (li - 1) * 2.0
        pos = verts[:, :3][idx.astype(np.int64)].reshape(-1, 3, 3)
        tris.append(pos)
    pos = np.concatenate(tris, axis=0)

    eye = [6.5 * np.sin(0.1 * t), 4.0, 6.5 * np.cos(0.1 * t)]
    view = np.asarray(math3d.look_at_rh(eye, [0, 0, 0], [0, 1, 0]), np.float64)
    proj = np.asarray(
        math3d.perspective_rh(np.deg2rad(60.0), 1920 / 1080, 0.1, 100.0),
        np.float64,
    )
    mvp = proj @ view
    h = np.concatenate([pos, np.ones_like(pos[..., :1])], axis=-1)
    clip = h @ mvp.T
    return clip


def stats(clip, fb_w=1920, fb_h=1080):
    T = clip.shape[0]
    w = clip[..., 3]
    in_front = np.all(w > 1e-6, axis=1)
    ndc = clip[..., :3] / np.where(in_front[:, None], w, 1.0)[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * fb_w
    sy = (ndc[..., 1] * 0.5 + 0.5) * fb_h

    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sy[:, 1] - sy[:, 0]
    ) * (sx[:, 2] - sx[:, 0])
    nondeg = area2 != 0

    px0 = np.maximum(np.floor(sx.min(1) - 0.5).astype(np.int64), 0)
    px1 = np.minimum(np.ceil(sx.max(1) - 0.5).astype(np.int64), fb_w - 1)
    py0 = np.maximum(np.floor(sy.min(1) - 0.5).astype(np.int64), 0)
    py1 = np.minimum(np.ceil(sy.max(1) - 0.5).astype(np.int64), fb_h - 1)
    on_screen = (px0 <= px1) & (py0 <= py1)
    valid = in_front & nondeg & on_screen
    nvalid = valid.sum()
    print(f"T={T}  valid={nvalid} ({100*nvalid/T:.1f}%)  "
          f"in_front={in_front.sum()}  backfacing(of valid)="
          f"{100*np.mean(area2[valid] < 0):.1f}%")

    bw = (px1 - px0 + 1)[valid]
    bh = (py1 - py0 + 1)[valid]
    ncenters = bw * bh
    print("bbox center-count percentiles (valid tris):",
          {p: int(np.percentile(ncenters, p)) for p in (50, 75, 90, 95, 99)})
    for K in (1, 2, 3, 4, 6):
        small = ncenters <= K * K
        print(f"  bbox<= {K}x{K} centers: {100*np.mean(small):.1f}% of valid")

    # exact coverage for small-bbox triangles (evaluate every center)
    vsx, vsy = sx[valid], sy[valid]
    varea = area2[valid]
    vx0, vy0 = px0[valid], py0[valid]
    KMAX = 4
    small = ncenters <= KMAX * KMAX
    # edge functions, sign-normalized interior positive
    sgn = np.where(varea > 0, 1.0, -1.0)
    covered = np.zeros(small.sum(), bool)
    ssx, ssy = vsx[small], vsy[small]
    ssgn = sgn[small]
    sx0, sy0 = vx0[small], vy0[small]
    sbw, sbh = bw[small], bh[small]
    for dy in range(KMAX):
        for dx in range(KMAX):
            pxc = sx0 + dx + 0.5
            pyc = sy0 + dy + 0.5
            inside = np.ones_like(covered)
            for e in range(3):
                a = (e + 1) % 3
                b = (e + 2) % 3
                dxe = ssx[:, b] - ssx[:, a]
                dye = ssy[:, b] - ssy[:, a]
                ev = ((pyc - ssy[:, a]) * dxe - (pxc - ssx[:, a]) * dye) * ssgn
                edx = dxe * ssgn
                edy = dye * ssgn
                tl = (edy < 0) | ((edy == 0) & (edx > 0))
                inside &= (ev > 0) | ((ev == 0) & tl)
            covered |= inside & (dx < sbw) & (dy < sbh)
    zc = (~covered).sum()
    print(f"zero-coverage among bbox<={KMAX}x{KMAX} tris: {zc} "
          f"= {100*zc/max(small.sum(),1):.1f}% of small, "
          f"= {100*zc/nvalid:.1f}% of ALL valid")

    # entry counts at tile geometries
    for tw, th in ((128, 16), (128, 8), (64, 8), (32, 8)):
        gw = -(-fb_w // tw)
        tx0 = np.clip(px0[valid] // tw, 0, gw - 1)
        tx1 = np.clip(px1[valid] // tw, 0, gw - 1)
        ty0 = np.clip(py0[valid] // th, 0, -(-fb_h // th) - 1)
        ty1 = np.clip(py1[valid] // th, 0, -(-fb_h // th) - 1)
        ncov = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
        # after killing exact-zero-coverage small tris:
        kill = np.zeros(nvalid, bool)
        kill[np.flatnonzero(small)[~covered]] = True
        print(f"tile {tw}x{th}: entries={ncov.sum()/1e6:.2f}M "
              f"(after zero-cov kill {ncov[~kill].sum()/1e6:.2f}M) "
              f"spill={(ncov-1).sum()/1e6:.2f}M  mean cov={ncov.mean():.2f}")


if __name__ == "__main__":
    clip = build_config5()
    stats(clip)
