"""kNN util + recon-panel smoke tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from manigaussian_tpu.ops.knn import knn_mean_sq_dist
from manigaussian_tpu.utils.visualization import save_recon_panel


def test_knn_matches_bruteforce():
    rs = np.random.RandomState(0)
    pts = rs.randn(100, 3).astype(np.float32)
    ours = np.asarray(knn_mean_sq_dist(jnp.array(pts), k=3, block=32))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_knn_jit():
    pts = jax.random.normal(jax.random.PRNGKey(0), (257, 3))
    out = jax.jit(lambda p: knn_mean_sq_dist(p, k=3, block=64))(pts)
    assert out.shape == (257,)
    assert bool(jnp.all(out > 0))


def test_recon_panel_written(tmp_path):
    """Full 7-panel figure (input/gt/pred/embed/gt_embed/next_pred/next_gt —
    qattention:956-1010 parity, the exact set the train runner passes)."""
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    path = save_recon_panel(str(tmp_path), 100, input_rgb=img, gt_rgb=img,
                            pred_rgb=img, pred_embed=img * 10 - 5,
                            gt_embed=img * 4 - 2,
                            next_pred_rgb=img, next_gt_rgb=img)
    assert os.path.exists(path)
    assert path.endswith("recon/100.png")
