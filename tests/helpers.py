"""Shared test fixtures: cameras and random Gaussian scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from manigaussian_tpu.ops import camera as cam


def assert_mostly_close(actual, desired, atol, rtol, max_frac=0.005,
                        err_msg=""):
    """allclose tolerant to DISCRETE-THRESHOLD flips between implementations.

    Splats sitting exactly on the alpha>=1/255 / T<1e-4 / power<=0 cutoffs can
    land on different sides in two numerically-equivalent implementations
    (oracle vs pallas vs CUDA), flipping their masks and producing finitely
    different values at a handful of elements. Require the overwhelming
    majority to be tight instead of every element.
    """
    actual, desired = np.asarray(actual), np.asarray(desired)
    bad = ~np.isclose(actual, desired, atol=atol, rtol=rtol)
    frac = float(bad.mean())
    assert frac <= max_frac, (
        f"{err_msg}: {bad.sum()}/{bad.size} elements ({frac:.2%}) outside "
        f"atol={atol} rtol={rtol}; max abs diff "
        f"{np.abs(actual - desired)[bad].max() if bad.any() else 0}")


def make_camera(width=64, height=64, focal=60.0, cam_pos=(0.0, 0.0, 0.0),
                znear=0.1, zfar=4.0):
    """Camera at cam_pos looking along +z (identity rotation)."""
    intr = jnp.array([[focal, 0.0, width / 2.0],
                      [0.0, focal, height / 2.0],
                      [0.0, 0.0, 1.0]], dtype=jnp.float32)
    c2w = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(jnp.asarray(cam_pos))
    return cam.novel_camera_calib(intr, c2w, znear, zfar, height, width)


def random_scene(key, n, center=(0.0, 0.0, 2.0), spread=0.5, scale_lo=0.01,
                 scale_hi=0.08, sh_degree=1, with_lang=True):
    """Random Gaussians in front of the default camera."""
    ks = jax.random.split(key, 6)
    means = jnp.asarray(center) + spread * jax.random.normal(ks[0], (n, 3))
    scales = jnp.exp(jax.random.uniform(
        ks[1], (n, 3), minval=np.log(scale_lo), maxval=np.log(scale_hi)))
    q = jax.random.normal(ks[2], (n, 4))
    rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacities = jax.random.uniform(ks[3], (n,), minval=0.05, maxval=0.95)
    n_sh = (sh_degree + 1) ** 2
    shs = 0.3 * jax.random.normal(ks[4], (n, n_sh, 3))
    lang = jax.random.normal(ks[5], (n, 3)) if with_lang else None
    return dict(means3d=means, scales=scales, rotations=rotations,
                opacities=opacities, shs=shs, language_features=lang)
