"""Price DEEPER depth peels without building their kernels (VERDICT r4
item 3: "price k=3 peel once").

The f64 oracle rasterizes each config sequentially; a survivor hook records
the last K surviving fragments per pixel (true survivors — sequential
processing needs none of the kernel's demotion machinery).  The k-layer
truncated blend chain (blend the last k survivors, oldest first, onto the
clear color) is then compared against the oracle's full per-fragment chain:
exactly the deviation a k-layer peel kernel would ship, for k = 1..KMAX.

k=1 reproduces the fast path's deviation, k=2 the ideal peel2 — anchoring
the sim against BASELINE.md's on-chip rows — and k=3/4 answer whether a
third layer is worth building.  Run (CPU is fine; it is all numpy):
    python tools/kpeel_deviation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KMAX = 4


def study(device, rig, kmax=KMAX):
    import tyleri_tpu as ty
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.testing import oracle
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    w, h = rig.resolution
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    state = rf.mesh_state
    scene = RenderScene()
    rig.fill(scene, 0.5)

    # survivor registers: srcs[0] = newest surviving fragment's color
    srcs = [np.zeros((h, w, 4), np.float64) for _ in range(kmax)]
    have = np.zeros((h, w), np.int32)

    def hook(y0, x0, passed, frag):
        ph, pw = passed.shape
        sl = (slice(y0, y0 + ph), slice(x0, x0 + pw))
        for j in range(kmax - 1, 0, -1):
            srcs[j][sl][passed] = srcs[j - 1][sl][passed]
        srcs[0][sl][passed] = frag[passed]
        have[sl][passed] = np.minimum(have[sl][passed] + 1, kmax)

    color = np.zeros((h, w, 4), np.float64)
    depth = np.ones((h, w), np.float64)
    alloc = device.memory_allocator
    pos_stage = alloc.static_vertices_buffer.staging("pos")
    uv_stage = alloc.static_vertices_buffer.staging("uv")
    idx_stage = alloc.static_indices_buffer.staging("idx")
    tex_arena = device.memory_allocator.texture_arena

    for cam in scene.render_resources.cameras:
        mvp_base = (cam.get_projection_matrix().astype(np.float64)
                    @ cam.view_matrix.astype(np.float64))
        vp, sc = cam.viewport, cam.scissor
        for mesh in cam.mesh_renderers:
            vo, vl = mesh.vertices.offset, mesh.vertices.len
            io, il = mesh.indices.offset, mesh.indices.len
            idx = idx_stage[io:io + il].astype(np.int64)
            pos = pos_stage[vo:vo + vl]
            uvs = uv_stage[vo:vo + vl]
            mvp = mvp_base @ np.asarray(mesh.model, np.float64)
            clip = oracle.make_mesh_clip(pos, idx, mvp)
            t = mesh.texture
            toff = tex_arena._offsets[t.slot]
            tex = tex_arena._texels[toff:toff + t.width * t.height]
            tex = tex.reshape(t.height, t.width, 4).astype(np.float64)
            oracle.rasterize(color, depth, clip, uvs[idx].reshape(-1, 3, 2),
                             state, vp, sc, texture=tex,
                             survivor_hook=hook)

    def u8(img):
        return np.clip(np.round(img * 255.0), 0, 255).astype(np.int32)

    full = u8(color)
    print(f"{rig.name} ({rig.triangle_count} tris) @{w}x{h}: "
          f"survivor depth histogram "
          f"{[int((have == j).sum()) for j in range(kmax)]}"
          f" + >= {kmax}: {int((have >= kmax).sum())}")
    for k in range(1, kmax + 1):
        acc = np.zeros((h, w, 4), np.float64)   # clear color (0,0,0,0)
        for j in range(k - 1, -1, -1):
            mask = have > j
            acc[mask] = oracle.blend(state.blend, srcs[j][mask], acc[mask])
        diff = np.abs(u8(acc) - full)
        bad = int((diff.max(axis=-1) > 1).sum())
        print(f"  k={k}: max|diff|={int(diff.max())}u8 "
              f"px>1u8={bad} ({100.0 * bad / (h * w):.3f}%) "
              f"mean|diff|={diff.mean():.4f}u8")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")  # all-numpy study
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib

    device = ty.RenderDeviceBuilder().build()
    study(device, scenelib.config4_instances(device, resolution=(480, 272)))
    study(device, scenelib.config5_sponza(device, resolution=(480, 272),
                                          grid_n=132))


if __name__ == "__main__":
    main()
