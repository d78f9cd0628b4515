"""Cross-check the Pallas visibility kernel against the XLA reference path.

Renders each config once through the default plan (Pallas kernel, wide
tiles on TPU) and once through the XLA path (8x8 tiles, pallas=False) on
the SAME device, then diffs the u8-quantized images. The XLA path is
itself pinned to the spec-exact numpy oracle by the golden tests, so
agreement here extends that pixel guarantee to the production kernel and
tile geometry. Run on TPU:
    python tools/compare_backends.py [config ...]
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def render_once(device, rig, *, xla_reference: bool):
    import tyleri_tpu as ty
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    if xla_reference:
        # 8x8 tiles need worst-case entry headroom: a triangle contributes
        # up to max_tiles_per_tri narrow entries, and every padded slot up
        # to tri_cap contributes one — start generous, retry on overflow.
        # spill_cap must be big enough that every multi-level spill cap
        # (_LEVEL_FRACS fractions of it, tuned for (16,128) tiles where
        # spilling is rare) covers the FULL triangle count: at 8x8 tiles
        # most triangles spill, and level-cap drops are governed by
        # spill_cap, not entry_cap.
        worst = 36 * rig.triangle_count + (1 << 16)
        cap = max(rf.plan.raster.entry_cap, -(-worst // 128) * 128)
        spill = max(1 << 16,
                    -(-int(rig.triangle_count / 0.012) // 512) * 512)
        rf.plan = dataclasses.replace(
            rf.plan,
            raster=dataclasses.replace(
                rf.plan.raster, tile_w=8, tile_h=8, chunk=32, pallas=False,
                entry_cap=cap, cap_per_tile=4096, spill_cap=spill,
                valid_cap=0,
                # mid-size triangles cover >32 8x8 tiles and go broad
                broad_cap=4096),
        )
    for _ in range(4):
        scene = RenderScene()
        rig.fill(scene, 0.5)
        frame = rf.record(device, scene.render_resources, 1.0, rig.resolution)
        over = int(jax.device_get(frame.bin_overflow))
        clip_over = int(jax.device_get(frame.clip_overflow))
        if over == 0 and clip_over == 0:
            break
        if xla_reference and over:
            cap = rf.plan.raster.entry_cap + -(-2 * over // 128) * 128
            rf.plan = dataclasses.replace(
                rf.plan, raster=dataclasses.replace(
                    rf.plan.raster, entry_cap=cap,
                    spill_cap=rf.plan.raster.spill_cap * 2,
                    broad_cap=rf.plan.raster.broad_cap * 2))
            rf.note_overflow(0, 0, clip_over)
        else:
            # production path: occupancy feedback grows the entry headroom
            # (exactly what RenderWindow does at recycle)
            rf.note_overflow(over, 0, clip_over)
    color = np.asarray(jax.device_get(frame.color))
    assert int(jax.device_get(frame.bin_overflow)) == 0, "bin overflow"
    assert int(jax.device_get(frame.tile_overflow)) == 0, "tile overflow"
    assert int(jax.device_get(frame.clip_overflow)) == 0, "clip overflow"
    return np.clip(np.round(color * 255.0), 0, 255).astype(np.uint8)


def main():
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib

    device = ty.RenderDeviceBuilder().build()
    print("device:", device.device)
    makers = {
        "config1": lambda: scenelib.config1_triangle(device),
        "config2": lambda: scenelib.config2_cube(device, (800, 600)),
        "config3": lambda: scenelib.config3_suzanne(device, (800, 600)),
        "config4": lambda: scenelib.config4_instances(device),
    }
    names = sys.argv[1:] or list(makers)
    failed = False
    for name in names:
        rig = makers[name]()
        a = render_once(device, rig, xla_reference=False)
        b = render_once(device, rig, xla_reference=True)
        diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
        bad = int((diff > 1).sum())
        print(f"{name}: shape={a.shape} max|diff|={int(diff.max())} "
              f"pixels>1u8={bad} ({100.0 * bad / diff.size:.4f}%)")
        if bad:
            failed = True
    print("FAIL" if failed else "OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
