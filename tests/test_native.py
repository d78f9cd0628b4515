"""Native host runtime tests: the C++ allocator must behave identically to
the python free-list, the native PNG encoder round-trips, the pacer paces."""

import time

import numpy as np
import pytest

from tyleri_tpu import native
from tyleri_tpu.resource.arenas import AllocationError, BlockBasedAllocator

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native build failed: {native.build_error()}"
)


def test_native_allocator_matches_python_randomized():
    rng = np.random.default_rng(11)
    py = BlockBasedAllocator(1 << 10)
    nat = native.NativeBlockAllocator(1 << 10)
    live = []
    for step in range(400):
        if live and rng.random() < 0.45:
            off, sz = live.pop(rng.integers(len(live)))
            py.free(off, sz)
            nat.free(off, sz)
        else:
            sz = int(rng.integers(1, 48))
            try:
                a = py.allocate(sz)
                ok_py = True
            except AllocationError:
                ok_py = False
            try:
                b = nat.allocate(sz)
                ok_nat = True
            except AllocationError:
                ok_nat = False
            assert ok_py == ok_nat, f"step {step}: divergent exhaustion"
            if ok_py:
                # both are first-fit over identical free lists => same offset
                assert a == b, f"step {step}: {a} != {b}"
                live.append((a, sz))


def test_native_par_allocate_and_grow():
    nat = native.NativeBlockAllocator(64)
    offs = nat.par_allocate([8, 8, 16], total_hint=32)
    assert offs == [0, 8, 16]
    assert nat.allocate(32) == 32
    with pytest.raises(AllocationError):
        nat.allocate(1)
    nat.grow(128)
    assert nat.allocate(64) == 64
    assert nat.largest_free == 0


def test_native_png_roundtrip(tmp_path):
    from tyleri_tpu.utils.image import read_png, write_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(33, 47, 4), dtype=np.uint8)
    p = str(tmp_path / "native.png")
    write_png(p, img)  # routes through the native encoder
    back = read_png(p)
    np.testing.assert_array_equal(back, img)


def test_frame_pacer_fifo():
    pacer = native.FramePacer(200.0)  # 5 ms interval
    t0 = time.perf_counter()
    for _ in range(4):
        pacer.wait()
    dt = time.perf_counter() - t0
    assert dt >= 0.012  # at least ~3 intervals of blocking
    # a slow frame reports missed intervals
    pacer.wait()
    time.sleep(0.03)
    missed = pacer.wait()
    assert missed >= 2
