"""Stage-1 tests: camera math invariants (SURVEY.md §7 stage 1).

Parity targets: reference graphics_utils.py:17-78 and neural_rendering.py:205-248.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manigaussian_tpu.ops import camera as cam


def test_focal_fov_roundtrip():
    f = 123.4
    fov = cam.focal2fov(f, 128)
    assert np.isclose(cam.fov2focal(fov, 128), f, rtol=1e-6)


def test_world_to_view_identity():
    V = cam.world_to_view(jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(V, np.eye(4), atol=1e-6)


def test_world_to_view_roundtrip_random_pose():
    rng = np.random.default_rng(0)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3).astype(np.float32)
    # reference convention: R is cam->world rotation, t world->cam translation
    V = np.asarray(cam.world_to_view(jnp.asarray(Q, jnp.float32), jnp.asarray(t)))
    # V @ [C;1] == 0 where C is the camera center = -Q @ t
    C = -Q @ t
    p = V @ np.concatenate([C, [1.0]])
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
    # rotation part is Q^T
    np.testing.assert_allclose(V[:3, :3], Q.T, atol=1e-5)


def test_projection_maps_frustum_corners():
    znear, zfar, h, w = 0.1, 4.0, 128, 128
    K = jnp.array([[100.0, 0, 64.0], [0, 100.0, 64.0], [0, 0, 1]])
    P = np.asarray(cam.projection_from_intrinsics(K, znear, zfar, h, w))
    # A point on the principal axis at znear maps to ndc z=0, at zfar to ndc z=1.
    for z, ndc_z in [(znear, 0.0), (zfar, 1.0)]:
        p = P @ np.array([0.0, 0.0, z, 1.0])
        p = p / p[3]
        np.testing.assert_allclose(p[2], ndc_z, atol=1e-5)
    # Point at pixel (0, cy): x_cam = -cx*z/fx -> ndc x = -1... pixel 0 edge maps
    # to the left frustum plane: x = -(w - cx)*z/fx maps to ndc -1
    z = 1.0
    x_left = -(w - 64.0) * z / 100.0
    p = P @ np.array([x_left, 0.0, z, 1.0])
    p = p / p[3]
    np.testing.assert_allclose(p[0], -1.0, atol=1e-5)


def test_novel_camera_calib_center_and_view():
    rng = np.random.default_rng(1)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    pos = rng.normal(size=3)
    c2w = np.eye(4)
    c2w[:3, :3] = Q
    c2w[:3, 3] = pos
    intr = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], jnp.float32)
    c = cam.novel_camera_calib(intr, jnp.asarray(c2w, jnp.float32), 0.1, 4.0, 128, 128)
    # camera center in world coordinates is the c2w translation
    np.testing.assert_allclose(np.asarray(c.camera_center), pos, atol=1e-4)
    # row-vector transform matches w2c action: [p,1] @ Vt == w2c @ [p;1]
    p = rng.normal(size=3).astype(np.float32)
    w2c = np.linalg.inv(c2w)
    expected = (w2c @ np.concatenate([p, [1.0]]))[:3]
    got = np.concatenate([p, [1.0]]) @ np.asarray(c.world_view_transform)
    np.testing.assert_allclose(got[:3], expected, atol=1e-4)
    # full_proj = Vt @ Pt
    tanx = np.asarray(c.tan_fovx)
    assert np.isclose(tanx, 64.0 / 100.0, atol=1e-6)


def test_depth_to_pointcloud_roundtrip():
    # points on the z=2 plane seen by an identity camera unproject back to z=2
    intr = jnp.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    depth = jnp.full((64, 64), 2.0)
    pts = cam.depth_to_pointcloud(depth, jnp.eye(4), intr)
    np.testing.assert_allclose(np.asarray(pts[:, 2]), 2.0, atol=1e-5)
    # the center pixel (cx, cy) is near x=y=0
    center = np.asarray(pts.reshape(64, 64, 3)[32, 32])
    np.testing.assert_allclose(center[:2], [0.5 * 2 / 60, 0.5 * 2 / 60], atol=1e-4)


def test_depth_to_pointcloud_extrinsic():
    # camera translated by +1 in x: world x = cam x + 1
    intr = jnp.array([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32)
    depth = jnp.full((64, 64), 2.0)
    w2c = jnp.eye(4).at[0, 3].set(-1.0)  # cam = world - 1 -> world = cam + 1
    pts = cam.depth_to_pointcloud(depth, w2c, intr)
    pts0 = cam.depth_to_pointcloud(depth, jnp.eye(4), intr)
    np.testing.assert_allclose(np.asarray(pts[:, 0] - pts0[:, 0]), 1.0, atol=1e-5)


def test_world_canonical_roundtrip():
    bounds = [-0.3, -0.5, 0.6, 0.7, 0.5, 1.6]
    x = jnp.array([[0.2, 0.0, 1.1], [-0.3, -0.5, 0.6]])
    c = cam.world_to_canonical(x, bounds)
    np.testing.assert_allclose(np.asarray(cam.canonical_to_world(c, bounds)), np.asarray(x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(c[1]), 0.0, atol=1e-6)
