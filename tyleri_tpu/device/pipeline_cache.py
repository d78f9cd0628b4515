"""Pipeline cache — persistent compiled-executable cache.

The reference seeds a VkPipelineCache from user-provided bytes and lets the
app persist it across runs (ref: src/render_device/builders.rs:85-88,321-331).
The XLA analog is the persistent compilation cache: every distinct
(PipelineState, RasterPlan) pair compiles to an executable once; with a cache
directory set, later processes skip compilation — the exact role pipeline
cache bytes play for Vulkan.
"""

from __future__ import annotations

import os


class PipelineCache:
    def __init__(self, directory: str | None = None,
                 min_compile_seconds: float = 1.0):
        self.directory = directory
        self.enabled = False
        if directory:
            try:
                import jax

                os.makedirs(directory, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", directory)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs",
                    float(min_compile_seconds),
                )
                self.enabled = True
            except Exception:
                # cache is an optimization; never fail device creation on it
                # (the reference has a "TODO check if cache is valid" at
                # builders.rs:321-331 — same fail-open policy)
                self.enabled = False

    def get_data(self) -> bytes:
        """Opaque token identifying the cache (the get-cache-bytes analog);
        the actual artifacts live in the cache directory."""
        return (self.directory or "").encode()
