"""Texture arena: the descriptor-heap analog.

The reference creates one R8G8B8A8_UNORM sampled image + one descriptor set
per texture (ref: src/resource/mod.rs:59-136).  TPU-natively every texture is
a row-major slice of one flat rgba texel arena in HBM; a ``StaticTexture`` is
just a slot id + extent — the "descriptor set" that mesh/UI draws carry.
This is the bindless-by-construction design the reference's TODO.md aspires
to (ref: TODO.md "use bindless descriptor set").
"""

from __future__ import annotations

import threading

import numpy as np


class StaticTexture:
    """Texture handle: slot id into the arena metadata (descriptor analog)."""

    def __init__(self, arena: "TextureArena", slot: int, width: int, height: int):
        self.arena = arena
        self.slot = int(slot)
        self.width = int(width)
        self.height = int(height)


class TextureArena:
    def __init__(self, initial_texels: int = 1 << 16):
        self._texels = np.zeros((int(initial_texels), 4), np.float32)
        self._used = 0
        self._offsets: list[int] = []
        self._widths: list[int] = []
        self._heights: list[int] = []
        self._dirty = True
        self._device = None
        self._lock = threading.Lock()

    @property
    def num_slots(self) -> int:
        return len(self._offsets)

    def _ensure(self, extra: int) -> None:
        need = self._used + extra
        if need <= len(self._texels):
            return
        cap = len(self._texels)
        while cap < need:
            cap *= 2
        grown = np.zeros((cap, 4), np.float32)
        grown[: self._used] = self._texels[: self._used]
        self._texels = grown

    def allocate(self, items):
        """Batch-create textures: [( (width, height), writer ), ...].

        writer(buf) receives an [h, w, 4] f32 view to fill (rgba in [0,1]);
        uint8 data should be divided by 255 by the caller (the reference's
        images are R8G8B8A8_UNORM, so u8/255 reproduces its sampled values).
        Returns [StaticTexture, ...].
        """
        items = list(items)
        with self._lock:
            total = sum(w * h for (w, h), _ in items)
            self._ensure(total)
            out = []
            for (w, h), writer in items:
                off = self._used
                view = self._texels[off : off + w * h].reshape(h, w, 4)
                writer(view)
                slot = len(self._offsets)
                self._offsets.append(off)
                self._widths.append(w)
                self._heights.append(h)
                self._used += w * h
                out.append(StaticTexture(self, slot, w, h))
            self._dirty = True
            return out

    def device_arrays(self):
        """(texel_quads [cap,16], offsets [S], widths [S], heights [S]) on
        device — 2x2 quad rows so the sampler fetches all four bilinear taps
        in one row gather (ops/sampling.py::make_texel_quads).
        A white 1x1 fallback occupies slot capacity when no textures exist."""
        import jax.numpy as jnp

        from tyleri_tpu.ops.sampling import make_texel_quads

        with self._lock:
            if self._dirty or self._device is None:
                if self._offsets:
                    texels = self._texels[: max(self._used, 1)]
                    offs, ws, hs = self._offsets, self._widths, self._heights
                else:
                    texels = np.ones((1, 4), np.float32)
                    offs, ws, hs = [0], [1], [1]
                quads = make_texel_quads(texels, offs, ws, hs)
                self._device = (
                    jnp.asarray(quads),
                    jnp.asarray(offs, jnp.int32),
                    jnp.asarray(ws, jnp.int32),
                    jnp.asarray(hs, jnp.int32),
                )
                self._dirty = False
            return self._device
