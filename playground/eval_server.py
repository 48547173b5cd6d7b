"""Success-rate evaluation harness: drive a deployed action server with sim
envs and report per-task success (the role of the external dexbotic-benchmark
docker in the reference, docs/Tutorial.md:134-150).

Usage:
    # terminal 1: python playground/benchmarks/libero/libero_cogact.py --task inference
    # terminal 2:
    python playground/eval_server.py --env_type libero \
        --task_suite libero_spatial --episodes_per_task 10 \
        --url http://localhost:7891/process_frame

Works against any policy speaking the /process_frame protocol; --env_type
mock runs without a simulator.
"""

from __future__ import annotations

import argparse
import json
import time
from collections import defaultdict

import numpy as np

from dexbotic_tpu.client import DexClient
from dexbotic_tpu.sim_envs.base import extract_rgb as _extract_rgb
from dexbotic_tpu.sim_envs.factory import create_env_batch


def evaluate(
    url: str,
    env_type: str,
    task_suite: str,
    task_names: list[str],
    episodes_per_task: int,
    max_steps: int,
    execute_steps: int,
    config,
) -> dict:
    client = DexClient(url=url, execute_steps=execute_steps)
    results = defaultdict(list)
    t_start = time.time()
    frames = 0

    for task in task_names:
        for ep in range(episodes_per_task):
            envs = create_env_batch(
                env_type, task_suite, [task], [ep], [ep], config, threaded=False
            )
            env = envs[0]
            client.reset()
            obs = env.get_obs()
            instruction = env.get_instruction()
            done = False
            while not done and env.get_step_count() < max_steps:
                rgb = _extract_rgb(obs)
                action = client.act(rgb, instruction)
                frames += 1
                obs, done = env.step(np.asarray(action)[None])
            results[task].append(float(env.is_complete()))
            env.close()

    report = {
        "per_task": {t: float(np.mean(v)) for t, v in results.items()},
        "average": float(np.mean([x for v in results.values() for x in v])),
        "episodes": sum(len(v) for v in results.values()),
        "frames": frames,
        "wall_s": round(time.time() - t_start, 1),
    }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:7891/process_frame")
    ap.add_argument("--env_type", default="mock", choices=["mock", "libero"])
    ap.add_argument("--task_suite", default="libero_spatial")
    ap.add_argument("--task_names", nargs="+", default=["task_0"])
    ap.add_argument("--episodes_per_task", type=int, default=10)
    ap.add_argument("--max_steps", type=int, default=512)
    ap.add_argument("--execute_steps", type=int, default=8)
    args = ap.parse_args()

    class Cfg:
        task_suite_name = args.task_suite
        max_episode_steps = args.max_steps
        obs_dim = (224, 224, 3)
        camera_height = 256
        camera_width = 256
        mock_success_prob = 0.5

    report = evaluate(
        args.url, args.env_type, args.task_suite, args.task_names,
        args.episodes_per_task, args.max_steps, args.execute_steps, Cfg(),
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
