"""tyleri_tpu.resource — L1 resources & memory.

Public upload API lives on RenderDevice (create_vertices / create_indices /
create_textures, mirroring ref: src/resource/mod.rs:31-136); the building
blocks are exported here.
"""

from tyleri_tpu.resource.allocator import (
    INDICES_INIT_SIZE,
    MemoryAllocator,
    UploadQueue,
    VERTICES_INIT_SIZE,
)
from tyleri_tpu.resource.arenas import (
    AllocationError,
    BindlessBuffer,
    BindlessBufferAllocator,
    BlockBasedAllocator,
    VariableLengthBuffer,
)
from tyleri_tpu.resource.textures import StaticTexture, TextureArena

# Type aliases for the reference's public resource handles
# (ref: src/resource/mod.rs:26-28).
StaticVertices = BindlessBuffer
StaticIndices = BindlessBuffer

__all__ = [
    "AllocationError",
    "BindlessBuffer",
    "BindlessBufferAllocator",
    "BlockBasedAllocator",
    "INDICES_INIT_SIZE",
    "MemoryAllocator",
    "StaticIndices",
    "StaticTexture",
    "StaticVertices",
    "TextureArena",
    "UploadQueue",
    "VERTICES_INIT_SIZE",
    "VariableLengthBuffer",
]
