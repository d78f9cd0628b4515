"""Unit tests for Mat4 helpers (glam-convention parity).

The reference camera builds its projection with glam::Mat4::perspective_rh
(ref: src/render_objects/camera.rs:40-47); these tests pin the [0,1] depth
range and handedness that pixel parity depends on.
"""

import numpy as np

from tyleri_tpu.utils import math3d


def project(m, p):
    h = np.asarray(m) @ np.array([*p, 1.0])
    return h[:3] / h[3]


def test_perspective_rh_depth_range():
    m = math3d.perspective_rh(np.radians(45.0), 4 / 3, 0.1, 100.0)
    # point on the near plane straight ahead -> ndc z == 0
    near = project(m, [0.0, 0.0, -0.1])
    assert abs(near[2]) < 1e-6
    # point on the far plane -> ndc z == 1
    far = project(m, [0.0, 0.0, -100.0])
    assert abs(far[2] - 1.0) < 1e-4
    # midway depth is nonlinear (reversed hyperbolic), between 0 and 1
    mid = project(m, [0.0, 0.0, -1.0])
    assert 0.0 < mid[2] < 1.0


def test_perspective_rh_fov_edges():
    fov = np.radians(90.0)
    m = math3d.perspective_rh(fov, 1.0, 0.1, 100.0)
    # at z=-d with 90deg fov, y=d maps to ndc y = 1 (top of frustum)
    p = project(m, [0.0, 2.0, -2.0])
    assert abs(p[1] - 1.0) < 1e-6
    # aspect scales x only
    m2 = math3d.perspective_rh(fov, 2.0, 0.1, 100.0)
    p2 = project(m2, [2.0, 0.0, -2.0])
    assert abs(p2[0] - 0.5) < 1e-6


def test_look_at_rh():
    eye = [0.0, 0.0, 5.0]
    m = math3d.look_at_rh(eye, [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    # the target sits 5 units along -z in view space
    v = np.asarray(m) @ np.array([0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(v[:3], [0, 0, -5], atol=1e-6)
    # the eye maps to the origin
    v = np.asarray(m) @ np.array([*eye, 1.0])
    np.testing.assert_allclose(v[:3], [0, 0, 0], atol=1e-6)


def test_compose_and_transform_points():
    m = math3d.compose(math3d.translation([1.0, 2.0, 3.0]), math3d.scale([2.0, 2.0, 2.0]))
    out = math3d.transform_points(m, np.array([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out)[0], [3.0, 4.0, 5.0, 1.0], atol=1e-6)


def test_rotations_orthonormal():
    for rot in (math3d.rotation_x, math3d.rotation_y, math3d.rotation_z):
        m = np.asarray(rot(0.7))
        np.testing.assert_allclose(m @ m.T, np.eye(4), atol=1e-6)
        assert abs(np.linalg.det(m) - 1.0) < 1e-6
