"""Unit + property tests for the resource layer: allocators, arenas,
growable buffers, texture slots, ParallelGroup — the invariants the
reference only enforces via panics (SURVEY §4)."""

import numpy as np
import pytest

from tyleri_tpu.resource import (
    AllocationError,
    BindlessBufferAllocator,
    BlockBasedAllocator,
    TextureArena,
    VariableLengthBuffer,
)
from tyleri_tpu.scene.parallel_group import ParallelGroup


def test_block_allocator_first_fit_and_merge():
    a = BlockBasedAllocator(100)
    x = a.allocate(30)
    y = a.allocate(30)
    z = a.allocate(40)
    assert (x, y, z) == (0, 30, 60)
    with pytest.raises(AllocationError):
        a.allocate(1)
    # free middle then ends; adjacent blocks must merge back to one
    a.free(y, 30)
    a.free(x, 30)
    a.free(z, 40)
    assert a.allocate(100) == 0


def test_block_allocator_par_allocate_contiguous():
    a = BlockBasedAllocator(64)
    offs = a.par_allocate([8, 8, 16], total_hint=32)
    assert offs == [0, 8, 16]
    # spare from the hint was returned to the free list
    assert a.allocate(32) == 32


def test_block_allocator_random_stress():
    rng = np.random.default_rng(3)
    a = BlockBasedAllocator(1 << 12)
    live = []
    for _ in range(300):
        if live and rng.random() < 0.45:
            off, sz = live.pop(rng.integers(len(live)))
            a.free(off, sz)
        else:
            sz = int(rng.integers(1, 64))
            try:
                off = a.allocate(sz)
            except AllocationError:
                continue
            # no overlap with any live block
            for o2, s2 in live:
                assert off + sz <= o2 or o2 + s2 <= off
            live.append((off, sz))
    for off, sz in live:
        a.free(off, sz)
    assert a.allocate(1 << 12) == 0


def test_bindless_arena_writer_and_growth():
    arena = BindlessBufferAllocator({"pos": ((3,), np.float32)}, 4)
    vals = []

    def writer(v):
        v[:] = 7.0
        vals.append(v.shape)

    (h1,) = arena.allocate([(3, writer)])
    assert h1.offset == 0 and h1.len == 3
    # exceeds capacity 4 -> grows transparently
    (h2,) = arena.allocate([(10, writer)])
    assert arena.capacity >= 13
    dev = arena.device_arrays()
    assert np.asarray(dev["pos"])[h2.offset] [0] == 7.0
    # free + reuse
    h1.free()
    (h3,) = arena.allocate([(2, writer)])
    assert h3.offset == 0


def test_variable_length_buffer_semantics():
    b = VariableLengthBuffer((2,), np.float32, 4)
    o1 = b.write([[1, 2], [3, 4]])
    o2 = b.write([[5, 6]])
    assert (o1, o2, b.len) == (0, 2, 3)
    b.expand_to(100)
    assert b.capacity >= 100 and b.len == 3
    np.testing.assert_array_equal(b.data()[2], [5, 6])
    padded = b.padded(8)
    assert padded.shape == (8, 2) and (padded[3:] == 0).all()
    b.clear()
    assert b.len == 0 and b.write([[9, 9]]) == 0


def test_texture_arena_slots_and_device_arrays():
    arena = TextureArena(initial_texels=16)
    (a, b) = arena.allocate([
        ((2, 2), lambda v: v.__setitem__(slice(None), 0.5)),
        ((5, 3), lambda v: v.__setitem__(slice(None), 0.25)),  # forces growth
    ])
    assert (a.slot, b.slot) == (0, 1)
    texels, offs, ws, hs = arena.device_arrays()
    assert int(offs[1]) == 4 and int(ws[1]) == 5 and int(hs[1]) == 3
    assert float(texels[int(offs[1])][0]) == 0.25


def test_parallel_group_round_robin():
    g = ParallelGroup(3)
    for i in range(8):
        g.push(i)
    assert g.get_group_by_thread(0) == [0, 3, 6]
    assert g.get_group_by_thread(1) == [1, 4, 7]
    assert g.get_group_by_thread(2) == [2, 5]
    assert g.get_group_by_thread(3) is None


import tyleri_tpu as ty
from tyleri_tpu.window.render_window import RenderWindow


def test_texture_arena_reclamation():
    """allocate -> free -> allocate reuses texels + slot (the reference's
    Arc-drop semantics, ref: src/resource/mod.rs:59-136)."""
    import numpy as np

    from tyleri_tpu.resource.textures import TextureArena

    arena = TextureArena(initial_texels=64)
    (a,) = arena.allocate([((4, 4), lambda b: b.__setitem__(slice(None), 0.25))])
    (b,) = arena.allocate([((2, 2), lambda b: b.__setitem__(slice(None), 0.5))])
    used0 = arena._used
    off_a, slot_a = arena._offsets[a.slot], a.slot
    a.free()
    assert arena._widths[slot_a] == 0  # slot dead
    (c,) = arena.allocate([((4, 4), lambda b: b.__setitem__(slice(None), 0.75))])
    assert arena._offsets[c.slot] == off_a, "texels not reused"
    assert c.slot == slot_a, "slot not reused"
    assert arena._used == used0, "arena grew despite free"
    a.free()  # double-free is a no-op
    # trailing free shrinks the bump pointer
    c.free()
    b.free()
    assert arena._used == 0
    # arrays still build with dead slots present
    (d,) = arena.allocate([((1, 1), lambda buf: buf.__setitem__(slice(None), 1.0))])
    texels, offs, ws, hs = arena.device_arrays()
    assert int(ws[d.slot]) == 1


def test_present_to_validates_surface_support(monkeypatch):
    from tyleri_tpu.device.builders import DeviceSelectionError
    from tyleri_tpu.window.render_window import WindowHandle

    # headless handles always pass (host-copy present)
    dev = ty.RenderDeviceBuilder().present_to(WindowHandle()).build()
    assert dev is not None
    import pytest

    # an OS window handle in a headless process is REFUSED at build():
    # there is no windowing system to present the host copy to (the
    # surface-support query can actually say no, ref builders.rs:185-221)
    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("WAYLAND_DISPLAY", raising=False)
    with pytest.raises(DeviceSelectionError):
        (ty.RenderDeviceBuilder()
         .present_to(WindowHandle(window=42, display=1)).build())
    # with a windowing system present, the same handle passes
    monkeypatch.setenv("DISPLAY", ":0")
    dev2 = (ty.RenderDeviceBuilder()
            .present_to(WindowHandle(window=42, display=1)).build())
    assert dev2 is not None
    # nonsense handle rejected at build() regardless of environment
    with pytest.raises(DeviceSelectionError):
        ty.RenderDeviceBuilder().present_to(WindowHandle(window=-5)).build()
    # and again at window creation (ref: render_window.rs:62-75)
    with pytest.raises(ValueError):
        RenderWindow(dev, WindowHandle(window="bogus"))


def test_memory_budget_checked_on_growth():
    """VERDICT r2: arena growth must consult the device budget and fail
    early (try_memory_type analog, ref resource_info.rs:47-58) instead of
    OOMing mid-frame; the failure is reported through the debug messenger."""
    import numpy as np

    from tyleri_tpu.resource.arenas import BindlessBufferAllocator
    from tyleri_tpu.resource.resource_info import ResourcesInfo

    class FakeDev:
        def memory_stats(self):
            return {"bytes_limit": 20 * 4096}  # 4096 vertex elements

    ri = ResourcesInfo(FakeDev())
    arena = BindlessBufferAllocator(
        {"pos": ((3,), np.float32), "uv": ((2,), np.float32)}, 64,
        budget_check=lambda n: ri.check_budget("static_vertices", n),
    )
    # within budget: grows fine
    arena.allocate([(1024, lambda p, u: None)])
    # beyond budget: raises BEFORE growing, capacity unchanged
    cap0 = arena.capacity
    with pytest.raises(MemoryError):
        arena.allocate([(1 << 20, lambda p, u: None)])
    assert arena.capacity == cap0

    # the device-level path reports via the messenger then re-raises
    # (validation must be on — the messenger is a no-op at NONE, exactly
    # like the reference's opt-in validation layer)
    from tyleri_tpu.device.builders import ValidationLevel

    msgs = []
    dev = (ty.RenderDeviceBuilder()
           .validation_level(ValidationLevel.ERROR).build())
    dev.debug_messenger.callback = lambda m: msgs.append(m.message_id)
    dev.memory_allocator.resources_info.device = FakeDev()
    with pytest.raises(MemoryError):
        dev.create_vertices([(1 << 20, lambda buf: None)])
    assert "memory-budget" in msgs
