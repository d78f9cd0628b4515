"""Device builder, validation layer, profiler, UI quirks, plan growth."""

import numpy as np
import pytest

import tyleri_tpu as ty
from tyleri_tpu.device.builders import DeviceSelectionError
from tyleri_tpu.device.debug import DebugMessenger, Severity
from tyleri_tpu.rendering.forward import _cap_growth, _next_pow2
from tyleri_tpu.scene.render_scene import RenderScene
from tyleri_tpu.utils.profiling import FrameProfiler


def test_builder_defaults_mirror_reference():
    from tyleri_tpu.device import builders as B

    assert B.DEFAULT_APP_NAME == "Tyleri App"          # ref: builders.rs:29
    assert B.DEFAULT_ENGINE_NAME == "Tyleri Engine"    # ref: builders.rs:30
    assert B.DEFAULT_DEPTH_FORMAT == ty.DepthFormat.D16_UNORM  # ref: builders.rs:31
    dev = ty.RenderDeviceBuilder().build()
    assert dev.depth_format == ty.DepthFormat.D16_UNORM
    assert dev.sampler_anisotropy is None


def test_builder_fluent_config():
    dev = (
        ty.RenderDeviceBuilder()
        .app_name("my app")
        .engine_name("my engine")
        .max_sampler_anisotropy(8.0)
        .depth_format(ty.DepthFormat.D32_SFLOAT)
        .queue_pool_size(2)
        .build()
    )
    assert dev.depth_format == ty.DepthFormat.D32_SFLOAT
    assert dev.sampler_anisotropy == 8.0
    q1 = dev.present_queues.pop()
    q2 = dev.present_queues.pop()
    assert q1 is not q2
    dev.present_queues.push(q1)
    dev.present_queues.push(q2)


def test_builder_rejects_zero_queues():
    with pytest.raises(DeviceSelectionError):
        ty.RenderDeviceBuilder().queue_pool_size(0).build()


def test_debug_messenger_severity_filter():
    got = []
    m = DebugMessenger(min_severity=Severity.WARNING, callback=got.append)
    m.emit(Severity.INFO, "id1", "quiet")
    m.emit(Severity.ERROR, "id2", "loud")
    assert len(got) == 1 and got[0].message_id == "id2"
    m.check_overflow("x", 0)
    assert len(got) == 1
    m.check_overflow("x", 3)
    assert len(got) == 2 and "3 entries" in got[1].message


def test_frame_profiler_counters():
    import time

    p = FrameProfiler()
    for _ in range(5):
        p.frame(1000)
        time.sleep(0.002)
    assert p.fps() > 0
    s = p.summary()
    assert s["fps"] > 0 and s["mtris_per_s"] > 0 and s["p99_ms"] >= 0


def test_add_ui_rebuild_and_clear_quirk():
    """ref: ui.rs:57-59 — non-empty rebuilds the element list, empty clears."""
    scene = RenderScene()
    dev = ty.RenderDeviceBuilder().build()
    (tex,) = dev.create_textures([((1, 1), lambda b: b.__setitem__(slice(None), 1.0))])
    quad = [((0, 0), (0, 0), (1, 1, 1, 1))] * 4
    scene.add_ui([(quad, [0, 1, 2, 0, 2, 3], tex)])
    r = scene.render_resources
    assert len(r.ui) == 1 and r.ui_vertices.len == 4 and r.ui_indices.len == 6
    scene.add_ui([(quad, [0, 1, 2], tex), (quad, [0, 2, 3], tex)])
    assert len(r.ui) == 2 and r.ui_vertices.len == 8
    assert r.ui[1].vertex_offset == 4 and r.ui[1].index_offset == 3
    scene.add_ui([])
    assert len(r.ui) == 0 and r.ui_vertices.len == 0


def test_index_allocations_stay_triangle_aligned():
    dev = ty.RenderDeviceBuilder().build()
    handles = dev.create_indices([
        (3, lambda b: b.__setitem__(slice(None), 0)),
        (4, lambda b: b.__setitem__(slice(None), 0)),  # non-multiple of 3
        (6, lambda b: b.__setitem__(slice(None), 0)),
    ])
    for h in handles:
        assert h.offset % 3 == 0
    assert handles[1].len == 4  # logical length preserved
    handles[1].free()  # padded size freed without corruption
    (h2,) = dev.create_indices([(6, lambda b: None)])
    assert h2.offset % 3 == 0


def test_cap_growth_policy():
    # pow2 regime below the granule
    assert _cap_growth(18000, 1 << 18, 8192) == 32768
    # granule steps above it
    assert _cap_growth(3_113_368, 1 << 18, 8192) == -(-3_113_368 // (1 << 18)) * (1 << 18)
    # monotone: never below floor
    assert _cap_growth(100, 1 << 18, 65536) == 65536
    assert _next_pow2(5, 4) == 8
