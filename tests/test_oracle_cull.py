"""Facing/culling convention tests for the oracle.

The reference never enables culling (cull mode defaults to NONE — the
rasterization_state at src/pipeline/common_pipeline.rs:96-102 only sets
front_face/line_width/polygon_mode), but the framework exposes culling as a
perf option, so its orientation convention must match the Vulkan spec.
"""

import numpy as np

from tyleri_tpu.pipeline.state import (
    BlendState,
    CullMode,
    DepthState,
    FrontFace,
    PipelineState,
    RasterState,
)
from tyleri_tpu.testing import oracle
from tyleri_tpu.utils.math3d import Rect2D, Viewport


def run(cull, front, clip):
    state = PipelineState(
        blend=BlendState(enable=False),
        depth=DepthState(test_enable=False, write_enable=False),
        raster=RasterState(front_face=front, cull_mode=cull),
    )
    color = np.zeros((4, 4, 4), np.float64)
    depth = np.ones((4, 4), np.float64)
    oracle.rasterize(color, depth, clip, np.zeros((1, 3, 2)), state,
                     Viewport(0, 0, 4, 4), Rect2D(0, 0, 4, 4),
                     texture=np.ones((1, 1, 4)))
    return color[..., 0].sum()


# In NDC (y down on screen): going (0,0)->(1,0)->(1,1) walks right then down,
# which is counter-clockwise per the Vulkan shoelace convention (positive area).
CCW_FB = np.array([[[-1, -1, 0, 1], [1, -1, 0, 1], [1, 1, 0, 1]]], np.float64)
CW_FB = CCW_FB[:, ::-1, :].copy()


def test_cull_none_draws_both_windings():
    assert run(CullMode.NONE, FrontFace.COUNTER_CLOCKWISE, CCW_FB) > 0
    assert run(CullMode.NONE, FrontFace.COUNTER_CLOCKWISE, CW_FB) > 0


def test_cull_back_keeps_front_faces():
    assert run(CullMode.BACK, FrontFace.COUNTER_CLOCKWISE, CCW_FB) > 0
    assert run(CullMode.BACK, FrontFace.COUNTER_CLOCKWISE, CW_FB) == 0
    # flipping the front-face convention flips which winding survives
    assert run(CullMode.BACK, FrontFace.CLOCKWISE, CCW_FB) == 0
    assert run(CullMode.BACK, FrontFace.CLOCKWISE, CW_FB) > 0


def test_cull_front_is_complement():
    assert run(CullMode.FRONT, FrontFace.COUNTER_CLOCKWISE, CCW_FB) == 0
    assert run(CullMode.FRONT, FrontFace.COUNTER_CLOCKWISE, CW_FB) > 0
