"""Train-runner integration: synthetic demos → replay → few train steps →
checkpoint → resume. The full SURVEY.md §7 'minimum end-to-end slice' in CI."""

import os

import jax
import numpy as np
import pytest

from manigaussian_tpu.data.language import create_language_model
from manigaussian_tpu.data.pipeline import BatchIterator, fill_replay
from manigaussian_tpu.data.replay import TaskUniformReplay
from manigaussian_tpu.data.synthetic import SCENE_BOUNDS, generate_task
from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.runners.offline_train_runner import OfflineTrainRunner
from manigaussian_tpu.utils.checkpoint import (list_checkpoints,
                                               restore_checkpoint,
                                               save_checkpoint)
from tests.test_agent import tiny_config


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("demos"))
    generate_task(root, "open_drawer", num_episodes=1, timesteps=10,
                  h=16, w=16, nerf_views=3, nerf_hw=32)
    lang = create_language_model("stub")
    replay = TaskUniformReplay()
    n = fill_replay(replay, root, "open_drawer", 1, ("front",),
                    SCENE_BOUNDS, 20, 5, 25, lang)
    assert n > 0
    return replay


@pytest.mark.slow
def test_runner_end_to_end_with_resume(pipeline, tmp_path):
    logdir = str(tmp_path / "logs")
    cfg = tiny_config(use_dynamic_field=False)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, framework=dataclasses.replace(
            cfg.framework, training_iterations=4, save_freq=2, log_freq=2))
    agent = ManiGaussianBCAgent(cfg)

    it = BatchIterator(pipeline, batch_size=1, seed=0, num_view_for_nerf=3)
    runner = OfflineTrainRunner(agent, it, logdir, cfg)
    state = runner.start()
    assert int(state.step) >= 4
    ckpts = list_checkpoints(logdir)
    assert len(ckpts) >= 1

    # training CSV exists
    assert os.path.exists(os.path.join(logdir, "train_data.csv"))

    # resume continues from the saved step
    it2 = BatchIterator(pipeline, batch_size=1, seed=1, num_view_for_nerf=3)
    runner2 = OfflineTrainRunner(agent, it2, logdir, cfg)
    state2 = runner2.start(max_iterations=5)
    assert int(state2.step) > int(ckpts[-1])
    it.close()
    it2.close()


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    from tests.test_agent import make_batch
    batch = make_batch(jax.random.PRNGKey(0))
    state = agent.init_state(jax.random.PRNGKey(1), batch, training=True)
    logdir = str(tmp_path / "ckpt")
    save_checkpoint(logdir, 7, jax.device_get(state))
    restored, step = restore_checkpoint(logdir, state)
    assert step == 7
    before = jax.tree_util.tree_leaves(state.params)
    after = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rolling_window(tmp_path):
    cfg = tiny_config(use_neural_rendering=False)
    agent = ManiGaussianBCAgent(cfg)
    from tests.test_agent import make_batch
    batch = make_batch(jax.random.PRNGKey(0))
    state = jax.device_get(
        agent.init_state(jax.random.PRNGKey(1), batch, training=True))
    logdir = str(tmp_path / "ckpt")
    for s in range(5):
        save_checkpoint(logdir, s, state, num_weights_to_keep=2)
    assert list_checkpoints(logdir) == [3, 4]
