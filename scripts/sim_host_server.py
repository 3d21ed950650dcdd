"""Simulator-host RPC server.

Runs an EnvClient (RLBench/CoppeliaSim, or the mock for smoke tests) behind
the TCP protocol in manigaussian_tpu/envs/rpc.py, so a TPU host evaluates
against it with `eval.py --env rpc://HOST:PORT` (SURVEY.md §7 hard part 7:
simulator-in-the-loop eval needs a clean process boundary; the reference runs
PyRep in-process, helpers/custom_rlbench_env.py:279).

Usage (on the x86 sim host with CoppeliaSim + RLBench installed):
    python scripts/sim_host_server.py --port 18861 --backend rlbench \
        --dataset-root /data/demos --cameras front --image-size 128

Smoke test without a simulator (serves recorded episodes):
    python scripts/sim_host_server.py --port 18861 --backend mock \
        --dataset-root /tmp/demos
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=18861)
    parser.add_argument("--backend", default="rlbench",
                        choices=["rlbench", "mock", "transcript"])
    parser.add_argument("--dataset-root", default=None,
                        help="demo root (rlbench/mock) — required unless "
                             "--backend transcript")
    parser.add_argument("--transcript", default=None,
                        help="recorded session JSONL to replay "
                             "(--backend transcript), see envs/transcript.py")
    parser.add_argument("--record", default=None,
                        help="record this session's call/response transcript "
                             "to the given JSONL path (any backend)")
    parser.add_argument("--cameras", nargs="+", default=["front"])
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--episode-length", type=int, default=25)
    parser.add_argument("--headless", action="store_true", default=True)
    args = parser.parse_args()

    if args.backend == "transcript":
        assert args.transcript, "--backend transcript needs --transcript"
        from manigaussian_tpu.envs.transcript import TranscriptReplayEnv
        env = TranscriptReplayEnv(args.transcript)
    elif args.backend == "rlbench":
        assert args.dataset_root, "--backend rlbench needs --dataset-root"
        from manigaussian_tpu.envs.rlbench_env import RLBenchEnvClient
        env = RLBenchEnvClient(args.dataset_root, cameras=args.cameras,
                               image_size=(args.image_size, args.image_size),
                               episode_length=args.episode_length,
                               headless=args.headless)
    else:
        assert args.dataset_root, "--backend mock needs --dataset-root"
        from manigaussian_tpu.envs.mock_env import MockEnvClient
        env = MockEnvClient(args.dataset_root, cameras=tuple(args.cameras),
                            episode_length=args.episode_length)

    if args.record:
        from manigaussian_tpu.envs.transcript import TranscriptRecorder
        env = TranscriptRecorder(env, args.record)

    from manigaussian_tpu.envs.rpc import EnvRPCServer
    server = EnvRPCServer(env, host=args.host, port=args.port)
    print(f"[sim-host] serving {args.backend} env on "
          f"{args.host}:{server.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
