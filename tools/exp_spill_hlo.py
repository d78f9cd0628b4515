"""Dump compiled-HLO op inventories for binning spill variants (TPU).

Prints, per variant, the count and shapes of sort/gather/scatter/while/
fusion ops so the 15 ms vs 48 ms cliff in exp_spill can be attributed to a
lowering difference rather than guessed at.

    python tools/exp_spill_hlo.py
"""

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp


def main():
    sys.argv = [sys.argv[0]]
    import tools.exp_spill as E
    import tyleri_tpu as ty
    from tyleri_tpu.models import scenes as scenelib
    from tyleri_tpu.ops.clip import near_clip_triangles
    from tyleri_tpu.ops.setup import setup_triangles, transform_corner_table
    from tyleri_tpu.scene.render_scene import RenderScene
    from tyleri_tpu.window.swapchain import ImageViewSwapchain

    device = ty.RenderDeviceBuilder().build()
    rig = scenelib.config5_sponza(device)
    rf = ty.ForwardRenderingFunction(device, ImageViewSwapchain(rig.resolution))
    scene = RenderScene()
    rig.fill(scene, 0.5)
    arrays = jax.device_put(
        rf.build_frame_inputs(device, scene.render_resources, 1.0,
                              rig.resolution))
    (texels, toff, tw_, th_, clear_color,
     cam_valid, viewports, scissors, view_projs, models,
     corners, tri_draw, tri_valid0, tri_tex, *_rest) = arrays
    r = rf.plan.raster

    def make_setup(view_projs, models):
        mvps = jnp.einsum("ij,djk->dik", view_projs[0], models[0],
                          precision=jax.lax.Precision.HIGHEST)
        clip, uv3 = transform_corner_table(corners[0], tri_draw[0], mvps)
        ct = near_clip_triangles(clip, uv3, tri_tex[0],
                                 tri_valid0[0] & cam_valid[0],
                                 extra_cap=r.clip_cap)
        return setup_triangles(
            ct.clip, ct.uv, ct.tex_id, ct.valid, viewports[0],
            scissors[0], tile_w=r.tile_w, tile_h=r.tile_h,
            grid_w=r.grid_w, grid_h=r.grid_h, order=ct.order)

    su = jax.jit(make_setup)(view_projs, models)
    jax.block_until_ready(su)

    # reuse exp_spill's variant_bin by reconstructing it via its module:
    # simplest is to re-execute its main-scope logic; instead import the
    # closure pattern by monkeypatching — here we just copy the reference.
    T = su.valid.shape[0]

    variant_bin = None
    # exp_spill defines variant_bin inside main(); replicate via exec of the
    # extracted source to avoid divergence
    import inspect
    src = inspect.getsource(E.main)
    m = re.search(r"(    def variant_bin.*?)\n    def sync", src, re.S)
    assert m, "variant_bin not found"
    body = "def _mk(r, T, S, jnp, jax):\n" + m.group(1).replace(
        "    def variant_bin", "    def variant_bin") + "\n        pass\n" \
        + "    return variant_bin\n"
    ns = {}
    exec(body, ns)
    from tyleri_tpu.ops import setup as S
    variant_bin = ns["_mk"](r, T, S, jnp, jax)

    for mode, cap in (("nospill", 65536), ("nosort", 65536),
                      ("sortc", 65536), ("direct", 65536)):
        fn = jax.jit(functools.partial(variant_bin, mode=mode, spill_cap=cap))
        txt = fn.lower(su).compile().as_text()
        counts = {}
        for line in txt.splitlines():
            mm = re.search(r"= \S+ (sort|gather|scatter|while|fusion|"
                           r"dynamic-slice|dynamic-update-slice|custom-call)"
                           r"[.(]", line)
            if mm:
                counts[mm.group(1)] = counts.get(mm.group(1), 0) + 1
        big = [ln.strip()[:160] for ln in txt.splitlines()
               if re.search(r"= \S+ (sort|scatter|while)\(", ln)]
        print(f"== {mode} cap={cap}: {counts}", flush=True)
        for b in big[:12]:
            print("   ", b, flush=True)


if __name__ == "__main__":
    main()
