"""Stage-1 tests: per-Gaussian math (quat, cov3d, EWA cov2d, SH).

Parity targets: forward.cu:21-153 + preprocessCUDA (forward.cu:155-257).
"""

import jax
import jax.numpy as jnp
import numpy as np

from manigaussian_tpu.ops import camera as cam
from manigaussian_tpu.ops import gaussian_math as gm
from tests.helpers import make_camera, random_scene


def test_quat_identity():
    R = gm.quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_quat_z_90():
    # 90° about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    s = np.sqrt(0.5)
    R = np.asarray(gm.quat_to_rotmat(jnp.array([s, 0, 0, s])))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_orthonormal_batch():
    q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(gm.quat_to_rotmat(q))
    eye = np.broadcast_to(np.eye(3), (32, 3, 3))
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_cov3d_matches_rs2rt():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (8, 4))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    s = jax.random.uniform(jax.random.PRNGKey(2), (8, 3), minval=0.01, maxval=0.2)
    cov6 = np.asarray(gm.build_cov3d(s, q))
    R = np.asarray(gm.quat_to_rotmat(q))
    S2 = np.asarray(s) ** 2
    Sigma = np.einsum("nij,nj,nkj->nik", R, S2, R)
    got = np.asarray(gm.cov3d_to_matrix(jnp.asarray(cov6)))
    np.testing.assert_allclose(got, Sigma, atol=1e-6)
    # positive semidefinite
    evals = np.linalg.eigvalsh(Sigma)
    assert (evals > -1e-7).all()


def test_eval_sh_degree0_constant():
    shs = jnp.zeros((4, 1, 3)).at[:, 0, :].set(jnp.array([1.0, 0.5, -3.0]))
    dirs = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    rgb, clamped = gm.eval_sh(shs, 0, dirs)
    expected = gm.SH_C0 * np.array([1.0, 0.5, -3.0]) + 0.5
    np.testing.assert_allclose(np.asarray(rgb), np.maximum(expected, 0)[None].repeat(4, 0),
                               atol=1e-6)
    # third channel clamped
    assert np.asarray(clamped)[:, 2].all()


def test_eval_sh_degree1_direction_dependence():
    shs = jnp.zeros((1, 4, 3)).at[0, 3, 0].set(1.0)  # x-band, red
    rgb_posx, _ = gm.eval_sh(shs, 1, jnp.array([[1.0, 0, 0]]))
    rgb_negx, _ = gm.eval_sh(shs, 1, jnp.array([[-1.0, 0, 0]]))
    # result = 0.5 - SH_C1 * x * sh[3]
    np.testing.assert_allclose(float(rgb_posx[0, 0]), max(0.5 - gm.SH_C1, 0), atol=1e-6)
    np.testing.assert_allclose(float(rgb_negx[0, 0]), 0.5 + gm.SH_C1, atol=1e-6)


def test_project_cov2d_isotropic_center():
    """An isotropic Gaussian at the image center: cov2d ≈ (f*s/z)^2 I + lowpass."""
    c = make_camera(width=64, height=64, focal=60.0)
    s = 0.05
    z = 2.0
    cov6 = gm.build_cov3d(jnp.full((1, 3), s), jnp.array([[1.0, 0, 0, 0]]))
    mean_view = jnp.array([[0.0, 0.0, z]])
    cov2d = np.asarray(gm.project_cov2d(
        mean_view, cov6, c.world_view_transform[:3, :3].T, 60.0, 60.0,
        c.tan_fovx, c.tan_fovy))[0]
    expected = (60.0 * s / z) ** 2
    np.testing.assert_allclose(cov2d[0], expected + gm.COV2D_LOWPASS, rtol=1e-5)
    np.testing.assert_allclose(cov2d[2], expected + gm.COV2D_LOWPASS, rtol=1e-5)
    np.testing.assert_allclose(cov2d[1], 0.0, atol=1e-7)


def test_preprocess_culling_and_projection():
    c = make_camera(width=64, height=64, focal=60.0)
    means = jnp.array([
        [0.0, 0.0, 2.0],    # center, visible
        [0.0, 0.0, 0.1],    # behind near-cull plane (z <= 0.2)
        [0.0, 0.0, -1.0],   # behind camera
        [50.0, 0.0, 2.0],   # far off-screen
    ])
    n = means.shape[0]
    scales = jnp.full((n, 3), 0.03)
    rot = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    opac = jnp.full((n,), 0.9)
    shs = jnp.zeros((n, 4, 3))
    pre = gm.preprocess(means, opac, c, 64, 64, 16, scales=scales, rotations=rot,
                        shs=shs, sh_degree=1)
    valid = np.asarray(pre.valid)
    assert valid[0] and not valid[1] and not valid[2] and not valid[3]
    # center gaussian projects to the pixel center: ndc 0 -> (S-1)/2
    np.testing.assert_allclose(np.asarray(pre.means2d[0]), [31.5, 31.5], atol=1e-3)
    np.testing.assert_allclose(float(pre.depths[0]), 2.0, atol=1e-5)
    assert int(pre.radii[0]) > 0
    assert int(pre.radii[1]) == 0
    # no NaNs anywhere (culled entries are guarded)
    for field in [pre.means2d, pre.conic, pre.rgb]:
        assert np.isfinite(np.asarray(field)[valid]).all()


def test_preprocess_grad_no_nan_through_culled():
    c = make_camera()

    def loss(means):
        scales = jnp.full((2, 3), 0.03)
        rot = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 1))
        pre = gm.preprocess(means, jnp.full((2,), 0.9), c, 64, 64, 16,
                            scales=scales, rotations=rot,
                            colors_precomp=jnp.ones((2, 3)))
        w = pre.valid.astype(jnp.float32)
        return jnp.sum(pre.means2d * w[:, None]) + jnp.sum(pre.conic * w[:, None])

    g = jax.grad(loss)(jnp.array([[0.0, 0.0, 2.0], [0.0, 0.0, -1.0]]))
    assert np.isfinite(np.asarray(g)).all()
