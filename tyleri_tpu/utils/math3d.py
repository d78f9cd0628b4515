"""3D math: Mat4 helpers with glam-compatible conventions.

The reference uses ``glam`` (ref: src/render_objects/camera.rs:4,40-47) with
column-vector math and the Vulkan [0,1] NDC depth range.  All functions here
return row-major ``(4, 4)`` arrays ``M`` acting on column vectors:
``clip = M @ [x, y, z, 1]``.  They accept/return either numpy or jax arrays
(everything is expressed in jnp; under jit they trace, on host they eagerly
evaluate).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def perspective_rh(fov_y_radians, aspect_ratio, z_near, z_far):
    """Right-handed perspective projection, depth range [0, 1].

    Bit-for-bit the formula of ``glam::Mat4::perspective_rh`` used by the
    reference camera (ref: src/render_objects/camera.rs:40-47): looking down
    -Z, ``z = -z_near`` maps to NDC depth 0 and ``z = -z_far`` to 1.
    """
    fov = jnp.asarray(fov_y_radians, jnp.float32)
    h = jnp.cos(fov * 0.5) / jnp.sin(fov * 0.5)
    w = h / jnp.asarray(aspect_ratio, jnp.float32)
    zn = jnp.asarray(z_near, jnp.float32)
    zf = jnp.asarray(z_far, jnp.float32)
    r = zf / (zn - zf)
    zero = jnp.zeros_like(w)
    one = jnp.ones_like(w)
    return jnp.stack(
        [
            jnp.stack([w, zero, zero, zero]),
            jnp.stack([zero, h, zero, zero]),
            jnp.stack([zero, zero, r, r * zn]),
            jnp.stack([zero, zero, -one, zero]),
        ]
    )


def look_at_rh(eye, center, up):
    """Right-handed view matrix (glam ``Mat4::look_at_rh`` semantics)."""
    eye = jnp.asarray(eye, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(s, eye)[None]]),
            jnp.concatenate([u, -jnp.dot(u, eye)[None]]),
            jnp.concatenate([-f, jnp.dot(f, eye)[None]]),
            jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        ]
    )
    return m


def translation(v):
    v = jnp.asarray(v, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(v)


def scale(v):
    v = jnp.asarray(v, jnp.float32)
    return jnp.diag(jnp.concatenate([v, jnp.ones((1,), jnp.float32)]))


def rotation_x(angle):
    a = jnp.asarray(angle, jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero, zero]),
            jnp.stack([zero, c, -s, zero]),
            jnp.stack([zero, s, c, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def rotation_y(angle):
    a = jnp.asarray(angle, jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s, zero]),
            jnp.stack([zero, one, zero, zero]),
            jnp.stack([-s, zero, c, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def rotation_z(angle):
    a = jnp.asarray(angle, jnp.float32)
    c, s = jnp.cos(a), jnp.sin(a)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero, zero]),
            jnp.stack([s, c, zero, zero]),
            jnp.stack([zero, zero, one, zero]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def compose(*mats):
    """Matrix product ``mats[0] @ mats[1] @ ...`` (applied right-to-left).

    Uses HIGHEST matmul precision: camera/model matrix products feed raster
    coverage math, where TPU bf16 MXU rounding is visible.
    """
    out = jnp.asarray(mats[0], jnp.float32)
    for m in mats[1:]:
        out = jnp.matmul(out, jnp.asarray(m, jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
    return out


def transform_points(m, pts):
    """Apply a 4x4 to ``[N, 3]`` points; returns homogeneous ``[N, 4]``."""
    pts = jnp.asarray(pts, jnp.float32)
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    h = jnp.concatenate([pts, ones], axis=-1)
    return jnp.matmul(h, m.T, precision=jax.lax.Precision.HIGHEST)


@dataclasses.dataclass(frozen=True)
class Viewport:
    """Vulkan-style viewport (ref: yarvk ``Viewport`` used at
    src/render_objects/camera.rs:15 and stages.rs:53-61).

    ``y`` grows downward in framebuffer space; NDC (-1,-1) maps to the
    viewport's top-left corner when ``height`` is positive.
    """

    x: float = 0.0
    y: float = 0.0
    width: float = 0.0
    height: float = 0.0
    min_depth: float = 0.0
    max_depth: float = 1.0

    def as_array(self):
        return jnp.array(
            [self.x, self.y, self.width, self.height, self.min_depth, self.max_depth],
            jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class Rect2D:
    """Vulkan-style scissor rect (offset + extent)."""

    x: int = 0
    y: int = 0
    width: int = 0
    height: int = 0

    def as_array(self):
        return jnp.array([self.x, self.y, self.width, self.height], jnp.int32)
