"""Differential fuzz: the visibility backends must agree pixel-exactly.

Random scenes (clustered tiny triangles, z-tie pairs, shared edges,
near-plane crossers, degenerates, off-screen geometry) rendered through
`passes.mesh_pass` under random plans and pipeline states; the XLA path is
the reference and every Pallas variant (interpret mode on CPU) must match
it bit-exactly — the same contract the production TPU path promises
(tools/compare_backends.py checks it on-chip).

    python tools/fuzz_backends.py [n_iters] [seed0]

Prints one line per case; exits nonzero on the first mismatch with a repro
line.  Tight-cap cases run on shared-binning variants where drops are
identical by construction.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Decide the platform WITHOUT jax.default_backend(): that call initializes
# the axon TPU plugin, which HANGS for ~25 min when the remote backend is
# down.  Interpret-mode fuzzing is a CPU job; opt into TPU explicitly.
if os.environ.get("FUZZ_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tyleri_tpu.pipeline.state import (
    BlendState, CompareOp, CullMode, DepthFormat, DepthState, FrontFace,
    PipelineState, RasterState)
from tyleri_tpu.rendering import passes
from tyleri_tpu.utils.math3d import Rect2D, Viewport

FBW, FBH = 256, 64


def random_scene(rng):
    """Adversarial triangle soup in clip space."""
    parts = []

    def tris(n, fn):
        if n > 0:
            parts.append(fn(n))

    n_tiny = int(rng.integers(16, 96))
    n_med = int(rng.integers(0, 12))
    n_big = int(rng.integers(0, 3))
    n_deg = int(rng.integers(0, 8))

    def tiny(n):
        # clustered ~2-px triangles (the sponza regime)
        base = rng.uniform(-1, 1, (n, 1, 2))
        ext = rng.uniform(0.002, 0.05, (n, 3, 2)) * rng.choice([-1, 1], (n, 3, 2))
        xy = base + ext
        z = rng.uniform(0.05, 0.95, (n, 1))
        return xy, np.broadcast_to(z, (n, 3)).copy()

    def med(n):
        base = rng.uniform(-1, 1, (n, 1, 2))
        ext = rng.uniform(0.1, 0.6, (n, 3, 2)) * rng.choice([-1, 1], (n, 3, 2))
        z = rng.uniform(0.05, 0.95, (n, 3))  # sloped depth
        return base + ext, z

    def big(n):
        xy = np.stack([
            np.stack([rng.uniform(-4, -1, n), rng.uniform(-4, -1, n)], -1),
            np.stack([rng.uniform(1, 4, n), rng.uniform(-4, -1, n)], -1),
            np.stack([rng.uniform(-1, 1, n), rng.uniform(1, 4, n)], -1),
        ], axis=1)
        z = rng.uniform(0.05, 0.95, (n, 1))
        return xy, np.broadcast_to(z, (n, 3)).copy()

    def degenerate(n):
        # zero-area (repeated vertex), collinear, and off-screen
        xy = rng.uniform(-1, 1, (n, 3, 2))
        for i in range(n):
            mode = rng.integers(0, 3)
            if mode == 0:
                xy[i, 1] = xy[i, 0]                 # repeated vertex
            elif mode == 1:
                xy[i, 2] = 2 * xy[i, 1] - xy[i, 0]  # collinear
            else:
                xy[i] += 8.0                        # far off-screen
        z = rng.uniform(0.05, 0.95, (n, 3))
        return xy, z

    tris(n_tiny, tiny)
    tris(n_med, med)
    tris(n_big, big)
    tris(n_deg, degenerate)
    xy = np.concatenate([p[0] for p in parts])
    z = np.concatenate([p[1] for p in parts])

    # z-tie pairs: duplicate a random subset with identical geometry
    # (later draw order) so D16-quantized ties exercise the order channel
    n_tie = int(rng.integers(0, 8))
    if n_tie:
        pick = rng.integers(0, len(xy), n_tie)
        xy = np.concatenate([xy, xy[pick]])
        z = np.concatenate([z, z[pick]])

    # shared-edge pair: two triangles splitting a quad (top-left rule:
    # the shared diagonal must be covered exactly once)
    qx, qy = rng.uniform(-0.8, 0.6, 2)
    w, h = rng.uniform(0.1, 0.4, 2)
    quad = np.array([
        [[qx, qy], [qx + w, qy], [qx, qy + h]],
        [[qx + w, qy + h], [qx, qy + h], [qx + w, qy]],
    ])
    qz = float(rng.uniform(0.05, 0.95))
    xy = np.concatenate([xy, quad])
    z = np.concatenate([z, np.full((2, 3), qz)])

    T = len(xy)
    w_ = np.ones((T, 3, 1), np.float32)
    if rng.random() < 0.3:
        # perspective w != 1 (still all in front of the eye)
        w_ = rng.uniform(0.7, 2.5, (T, 3, 1)).astype(np.float32)
    clip = np.concatenate(
        [xy * w_, z[..., None] * w_, w_], axis=2).astype(np.float32)
    if rng.random() < 0.25:
        # near-plane crossers (exercise the clip/cull pass)
        n_cross = int(rng.integers(1, 4))
        pick = rng.integers(0, T, n_cross)
        clip[pick, 0, 2] = -0.2
    uv = rng.random((T, 3, 2)).astype(np.float32)
    return clip, uv


def _state(le=True, cull=CullMode.NONE, ff=FrontFace.COUNTER_CLOCKWISE):
    return PipelineState(
        blend=BlendState(enable=False),
        depth=DepthState(
            test_enable=True, write_enable=True,
            compare_op=CompareOp.LESS_OR_EQUAL if le else CompareOp.LESS,
            format=DepthFormat.D16_UNORM),
        raster=RasterState(cull_mode=cull, front_face=ff),
    )


def _serial(tile_h=16, **flags):
    kw = dict(tile_w=128, tile_h=tile_h, chunk=128, pallas=True,
              entry_cap=1024, cap_per_tile=512, spill_cap=1024,
              max_tiles_per_tri=8, broad_cap=16)
    kw.update(flags)
    return kw


def _state(le=True, cull=CullMode.NONE, ff=FrontFace.COUNTER_CLOCKWISE):
    return PipelineState(
        blend=BlendState(enable=False),
        depth=DepthState(
            test_enable=True, write_enable=True,
            compare_op=CompareOp.LESS_OR_EQUAL if le else CompareOp.LESS,
            format=DepthFormat.D16_UNORM),
        raster=RasterState(cull_mode=cull, front_face=ff),
    )


# fixed (plan, state) pool: every case reuses one of these executables
# (a fresh plan/state per case would pay a fresh XLA compile per case)
POOL = [
    (_serial(), _state()),
    (_serial(), _state(le=False)),
    (_serial(tile_h=8, entry_cap=512, max_tiles_per_tri=2, broad_cap=8),
     _state()),
    (_serial(exit_lag2=True, tiles_per_prog=2), _state()),
    (_serial(exit_while=True, tiles_per_prog=4), _state()),
    (_serial(noexit=True), _state()),
    (_serial(peel2=True), _state()),
    (_serial(peel2=True, exit_lag2=True), _state()),
    (_serial(peel2=True, exit_while=True, tiles_per_prog=2),
     _state(le=False)),
    (_serial(), _state(cull=CullMode.BACK)),
    (_serial(tile_h=8), _state(cull=CullMode.FRONT, ff=FrontFace.CLOCKWISE)),
]


T_CAP = 192  # fixed row count: every case reuses the same executables


def render(clip, uv, state, plan_kw, scissor):
    T = clip.shape[0]
    assert T <= T_CAP, T
    valid = np.zeros((T_CAP,), bool)
    valid[:T] = True
    pad = T_CAP - T
    clip = np.pad(clip, ((0, pad), (0, 0), (0, 0)))
    uv = np.pad(uv, ((0, pad), (0, 0), (0, 0)))
    plan = passes.RasterPlan(fb_w=FBW, fb_h=FBH, clip_cap=64, **plan_kw)
    texels = jnp.ones((4, 16), jnp.float32)
    meta = (jnp.zeros((1,), jnp.int32), jnp.full((1,), 2, jnp.int32),
            jnp.full((1,), 2, jnp.int32))
    color = jnp.zeros((FBH, FBW, 4), jnp.float32)
    depth = jnp.ones((FBH, FBW), jnp.float32)
    color, depth, stats, _ = passes.mesh_pass(
        plan, state, color, depth,
        jnp.asarray(clip), jnp.asarray(uv),
        jnp.zeros((T_CAP,), jnp.int32), jnp.asarray(valid),
        Viewport(0, 0, FBW, FBH).as_array(),
        jnp.asarray(scissor, jnp.int32),
        texels, *meta,
    )
    return np.asarray(color), np.asarray(depth), stats


def one_case(seed):
    rng = np.random.default_rng(seed)
    clip, uv = random_scene(rng)
    plan_kw, state = POOL[seed % len(POOL)]
    if rng.random() < 0.3:
        sx = int(rng.integers(0, 64))
        sy = int(rng.integers(0, 24))
        scissor = [sx, sy, int(rng.integers(32, FBW - sx)),
                   int(rng.integers(16, FBH - sy))]
    else:
        scissor = [0, 0, FBW, FBH]

    ref_kw = dict(plan_kw)
    for k in ("exit_while", "exit_lag2",
              "tiles_per_prog"):
        ref_kw.pop(k, None)
    ref_kw["pallas"] = False
    c_ref, d_ref, st_ref = render(clip, uv, state, ref_kw, scissor)

    c_v, d_v, st_v = render(clip, uv, state, plan_kw, scissor)
    if not np.array_equal(d_v, d_ref):
        bad = np.argwhere(d_v != d_ref)
        raise AssertionError(
            f"depth mismatch seed={seed} plan={plan_kw} at {bad[:4]}: "
            f"{d_v[tuple(bad[0])]} vs {d_ref[tuple(bad[0])]}")
    if not np.allclose(c_v, c_ref, atol=1e-6):
        bad = np.argwhere(np.abs(c_v - c_ref).max(-1) > 1e-6)
        raise AssertionError(
            f"color mismatch seed={seed} plan={plan_kw} at {bad[:4]}")
    return f"ok T={clip.shape[0]} serial"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    fails = 0
    for i in range(n):
        seed = seed0 + i
        try:
            msg = one_case(seed)
        except AssertionError as e:
            fails += 1
            print(f"[{seed:5d}] FAIL {e}", flush=True)
            continue
        print(f"[{seed:5d}] {msg}", flush=True)
    print(f"done: {n - fails}/{n} clean", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
