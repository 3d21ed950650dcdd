"""Coverage for small modules: stat accumulator, 3D attention, video, profiling."""

import numpy as np
import pytest

from manigaussian_tpu.runners.stat_accumulator import SimpleAccumulator


def test_stat_accumulator_column_names():
    acc = SimpleAccumulator()
    acc.add_episode("open_drawer", 100.0, 10)
    acc.add_episode("open_drawer", 0.0, 25, error_type="IKError")
    acc.add_episode("turn_tap", 100.0, 5)
    out = acc.pop()
    assert out["eval_envs/return/open_drawer"] == 50.0
    assert out["eval_envs/return/turn_tap"] == 100.0
    assert out["eval_envs/error/IKError"] == 1.0
    # reset after pop
    assert acc.pop() == {}


def test_stat_accumulator_single_task_column():
    acc = SimpleAccumulator()
    acc.add_episode("open_drawer", 100.0, 10)
    out = acc.pop()
    assert "eval_envs/return" in out


@pytest.mark.slow
def test_attention3d_shapes():
    import jax
    import jax.numpy as jnp
    from manigaussian_tpu.models.attention3d import Visual3DLangTransformer

    m = Visual3DLangTransformer(heads=2, dim_head=8)
    x = jnp.zeros((1, 4, 4, 4, 16))
    lang = jnp.zeros((1, 7, 16))
    params = m.init(jax.random.PRNGKey(0), x, lang)
    out = m.apply(params, x, lang)
    assert out.shape == x.shape


def test_step_timer():
    from manigaussian_tpu.utils.profiling import StepTimer
    t = StepTimer()
    assert t.tick() == {}
    out = t.tick()
    assert "steps_per_s" in out and out["steps_per_s"] > 0


def test_video_recorder(tmp_path):
    from manigaussian_tpu.utils.video import EpisodeRecorder, circular_camera_path
    r = EpisodeRecorder()
    for _ in range(3):
        r.add_frame(np.random.rand(8, 8, 3))
    out = r.save(str(tmp_path / "ep"))
    import os
    assert os.path.exists(out)
    poses = circular_camera_path(np.array([0.0, 0.0, 1.0]), 0.5, 0.3, 3)
    assert poses.shape == (3, 4, 4)
