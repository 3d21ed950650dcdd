"""Evaluation runner: checkpoint selection + closed-loop rollouts + CSV.

Parity targets:
  * checkpoint selection modes missing / best / last / <int>
    (`eval.py:89-143`),
  * rollout loop (`yarr/utils/rollout_generator.py:21-70`): reset_to_demo,
    act → env.step for episode_length steps, terminal on env error,
  * eval_data.csv rows: step + per-task mean return
    ('eval_envs/return/<task>' multi-task, 'eval_envs/return' single-task —
    the exact column names compute_results.py consumes),
  * parallel checkpoint evaluation (`eval.py:154-172` spawns one Process per
    checkpoint) — here a spawn-context worker pool, one env+agent per worker,
    with all CSV writes serialized in the parent so the append stays atomic.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from manigaussian_tpu.agents.bc_agent import ManiGaussianBCAgent
from manigaussian_tpu.envs.base import EnvClient
from manigaussian_tpu.utils.checkpoint import list_checkpoints, restore_checkpoint

EVAL_CSV = "eval_data.csv"


def read_eval_csv(logdir: str) -> List[Dict[str, float]]:
    path = os.path.join(logdir, EVAL_CSV)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [dict((k, float(v)) for k, v in row.items() if v != "")
                for row in csv.DictReader(f)]


def append_eval_csv(logdir: str, row: Dict[str, float]) -> None:
    rows = read_eval_csv(logdir)
    rows.append(row)
    fields: List[str] = []
    for r in rows:
        for k in r:
            if k not in fields:
                fields.append(k)
    with open(os.path.join(logdir, EVAL_CSV), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval="")
        w.writeheader()
        w.writerows(rows)


def select_checkpoints(logdir: str, eval_type, tasks: Sequence[str]) -> List[int]:
    """eval.py:89-143 parity."""
    weights = list_checkpoints(logdir)
    if not weights:
        return []
    if eval_type == "missing":
        done = {int(r["step"]) for r in read_eval_csv(logdir)}
        return [w for w in weights if w not in done]
    if eval_type == "best":
        rows = read_eval_csv(logdir)
        if not rows:
            raise RuntimeError(f"no {EVAL_CSV} in {logdir} for eval_type=best")
        cols = ([f"eval_envs/return/{t}" for t in tasks] if len(tasks) > 1
                else ["eval_envs/return"])
        best_step, best_score = None, -np.inf
        for r in rows:
            if int(r["step"]) not in weights:
                continue
            score = float(np.mean([r[c] for c in cols if c in r]))
            if score >= best_score:
                best_score, best_step = score, int(r["step"])
        return [best_step] if best_step is not None else []
    if eval_type == "last":
        return [weights[-1]]
    if isinstance(eval_type, int):
        return [eval_type]
    raise ValueError(f"unknown eval_type {eval_type!r}")


def rollout_episode(agent: ManiGaussianBCAgent, params, env: EnvClient,
                    episode_index: int, episode_length: int,
                    lang_emb, lang_tokens, act_fn=None,
                    with_length: bool = False, recorder=None):
    """One closed-loop episode; returns the episode return
    (or (return, steps_taken) when with_length). `recorder` (an
    utils/video.EpisodeRecorder) collects the front-camera frames — the
    cinematic-recorder analog (reference conf/eval.yaml cinematic_recorder +
    yarr TaskRecorder)."""
    obs = env.reset_to_demo(episode_index)
    act = act_fn or agent.jit_act()
    total = 0.0
    steps = 0
    if recorder is not None:
        recorder.add_frame(obs.rgb[0])
    for _ in range(episode_length):
        batch_obs = {
            "rgb": obs.rgb[None], "pcd": obs.pcd[None],
            "low_dim_state": obs.low_dim_state[None],
            "lang_goal_emb": lang_emb[None],
            "lang_token_embs": lang_tokens[None],
        }
        res = act(params, batch_obs)
        action = np.asarray(res.continuous_action[0])
        step_res = env.step(action)
        total += step_res.reward
        steps += 1
        obs = step_res.observation
        if recorder is not None:
            recorder.add_frame(obs.rgb[0])
        if step_res.terminal:
            break
    return (total, steps) if with_length else total


def evaluate_checkpoint(agent: ManiGaussianBCAgent, logdir: str, step: int,
                        env: EnvClient, tasks: Sequence[str],
                        eval_episodes: int, episode_length: int,
                        lang_model, state_like,
                        record_every_n: int = 0,
                        episode_offset: int = 0) -> Dict[str, float]:
    state, _ = restore_checkpoint(logdir, state_like, step=step)
    assert state is not None, f"checkpoint {step} missing in {logdir}"
    act = agent.jit_act()

    row: Dict[str, float] = {"step": float(step)}
    per_task = []
    total_transitions = 0  # cumulative across tasks, reference CSV convention
    for task in tasks:
        env.set_task(task)
        sent, toks = lang_model.encode(task.replace("_", " "))
        outcomes = []
        for e in range(eval_episodes):
            rec = None
            if record_every_n and e % record_every_n == 0:
                from manigaussian_tpu.utils.video import EpisodeRecorder
                rec = EpisodeRecorder()
            outcomes.append(
                rollout_episode(agent, state.params, env, episode_offset + e,
                                episode_length, sent, toks, act_fn=act,
                                with_length=True, recorder=rec))
            if rec is not None:
                rec.save(os.path.join(logdir, "videos",
                                      f"{task}_step{step}_ep{e}"))
        returns = [r for r, _ in outcomes]
        lengths = [s for _, s in outcomes]
        mean_r = float(np.mean(returns))
        per_task.append(mean_r)
        total_transitions += int(np.sum(lengths))
        if len(tasks) > 1:
            # the reference's per-task column triple (ManiGaussian_results CSV
            # header: return / length / cumulative total_transitions)
            row[f"eval_envs/return/{task}"] = mean_r
            row[f"eval_envs/length/{task}"] = float(np.mean(lengths))
            row[f"eval_envs/total_transitions/{task}"] = float(
                total_transitions)
    if len(tasks) == 1:
        row["eval_envs/return"] = per_task[0]
    row["eval_envs/mean_return"] = float(np.mean(per_task))
    return row


def run_eval(agent: ManiGaussianBCAgent, logdir: str, env: EnvClient,
             tasks: Sequence[str], eval_type="last", eval_episodes: int = 25,
             episode_length: int = 25, lang_model=None,
             state_like=None, record_every_n: int = 0,
             episode_offset: int = 0) -> List[Dict[str, float]]:
    """Full eval pass (eval.py eval_seed semantics, serial over checkpoints).
    record_every_n > 0 saves a GIF of every n-th episode under
    <logdir>/videos/ (cinematic-recorder analog, conf/eval.yaml).
    episode_offset > 0 starts rollouts at that stored-episode index — held-out
    eval on episodes the replay fill never saw (train on 0..demos-1, eval from
    demos up)."""
    steps = select_checkpoints(logdir, eval_type, tasks)
    rows = []
    env.launch()
    try:
        for step in steps:
            row = evaluate_checkpoint(agent, logdir, step, env, tasks,
                                      eval_episodes, episode_length,
                                      lang_model, state_like,
                                      record_every_n=record_every_n,
                                      episode_offset=episode_offset)
            append_eval_csv(logdir, row)
            rows.append(row)
    finally:
        env.shutdown()
    return rows


# --------------------------------------------------------------- parallel
def make_state_skeleton(cfg):
    """Restore skeleton for checkpoints: the training=True, renderer-on tree
    (checkpoints always include optimizer state), shapes from a dummy batch."""
    import dataclasses

    import jax.numpy as jnp

    h, w = cfg.rlbench.camera_resolution
    ncam = len(cfg.rlbench.cameras)
    img = cfg.method.neural_renderer.image_height
    eye_intr = jnp.array([[float(img), 0, img / 2], [0, float(img), img / 2],
                          [0, 0, 1.0]])
    dummy = {
        "rgb": jnp.zeros((1, ncam, h, w, 3)),
        "pcd": jnp.zeros((1, ncam, h, w, 3)),
        "low_dim_state": jnp.zeros((1, 4)),
        "lang_goal_emb": jnp.zeros((1, 1024)),
        "lang_token_embs": jnp.zeros((1, 77, cfg.method.language_model_dim)),
        "nerf_target_rgb": jnp.zeros((1, img, img, 3)),
        "nerf_target_pose": jnp.tile(jnp.eye(4), (1, 1, 1)),
        "nerf_target_intrinsic": jnp.tile(eye_intr, (1, 1, 1)),
        "nerf_next_target_rgb": jnp.zeros((1, img, img, 3)),
        "nerf_next_target_pose": jnp.tile(jnp.eye(4), (1, 1, 1)),
        "nerf_next_target_intrinsic": jnp.tile(eye_intr, (1, 1, 1)),
        "action": jnp.zeros((1, 8)),
    }
    # through the registry: GNFACTOR_BC checkpoints carry the NeRF renderer
    # parameter tree, not the splat one — building ManiGaussianBCAgent
    # directly would restore against the wrong skeleton
    from manigaussian_tpu.agents.registry import create_agent
    train_cfg = dataclasses.replace(
        cfg, method=dataclasses.replace(cfg.method, use_neural_rendering=True))
    return jax.device_get(create_agent(train_cfg).init_state(
        jax.random.PRNGKey(0), dummy, training=True, lazy=True))


def make_env(cfg, demo_root: str, env_kind: str) -> EnvClient:
    if env_kind == "mock":
        from manigaussian_tpu.envs.mock_env import MockEnvClient
        return MockEnvClient(demo_root, cameras=cfg.rlbench.cameras,
                             episode_length=cfg.rlbench.episode_length)
    if env_kind.startswith("rpc://"):
        # simulator on a separate host (scripts/sim_host_server.py)
        from manigaussian_tpu.envs.rpc import RPCEnvClient
        return RPCEnvClient(env_kind)
    if env_kind.startswith("transcript://"):
        # recorded-session conformance double (envs/transcript.py)
        from manigaussian_tpu.envs.transcript import TranscriptReplayEnv
        return TranscriptReplayEnv(env_kind.removeprefix("transcript://"))
    from manigaussian_tpu.envs.rlbench_env import RLBenchEnvClient
    return RLBenchEnvClient(demo_root, cameras=cfg.rlbench.cameras,
                            episode_length=cfg.rlbench.episode_length)


def _eval_worker(payload):
    """Spawn-context worker: build agent+env+lang from the config and evaluate
    ONE checkpoint. Runs in a fresh interpreter — force the platform before
    any device query (workers must never contend for the single TPU claim)."""
    (cfg, logdir, step, demo_root, env_kind, eval_episodes, platform,
     episode_offset) = payload
    if platform:
        jax.config.update("jax_platforms", platform)

    from manigaussian_tpu.agents.registry import create_agent
    from manigaussian_tpu.data.language import create_language_model

    agent = create_agent(cfg)
    lang = create_language_model(
        cfg.method.language_model,
        checkpoint_dir=cfg.method.language_model_checkpoint,
        cache_dir=os.path.join(logdir, "lang_cache"))
    env = make_env(cfg, demo_root, env_kind)
    state_like = make_state_skeleton(cfg)
    env.launch()
    try:
        return evaluate_checkpoint(agent, logdir, step, env,
                                   cfg.rlbench.tasks, eval_episodes,
                                   cfg.rlbench.episode_length, lang,
                                   state_like, episode_offset=episode_offset)
    finally:
        env.shutdown()


def run_eval_parallel(cfg, logdir: str, demo_root: str, env_kind: str,
                      eval_type="missing", eval_episodes: int = 25,
                      num_workers: int = 2,
                      platform: Optional[str] = None,
                      episode_offset: int = 0) -> List[Dict[str, float]]:
    """Evaluate selected checkpoints concurrently, one subprocess per
    checkpoint bounded by `num_workers` (reference eval.py:154-172). The
    parent does every CSV write, in checkpoint order."""
    import multiprocessing as mp

    steps = select_checkpoints(logdir, eval_type, cfg.rlbench.tasks)
    if not steps:
        return []
    payloads = [(cfg, logdir, s, demo_root, env_kind, eval_episodes, platform,
                 episode_offset)
                for s in steps]
    if num_workers <= 1 or len(steps) == 1:
        rows = [_eval_worker(p) for p in payloads]
    else:
        ctx = mp.get_context("spawn")
        with ctx.Pool(min(num_workers, len(steps))) as pool:
            rows = pool.map(_eval_worker, payloads)
    rows.sort(key=lambda r: r["step"])
    for row in rows:
        append_eval_csv(logdir, row)
    return rows
