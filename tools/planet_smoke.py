"""PlaNet end-to-end smoke run: seed episodes + 3 training episodes on
a tiny configuration (VERDICT r1 vision item — proves the full
collect -> replay -> RSSM update -> CEM act loop runs, losses finite).

    python tools/planet_smoke.py [task=hammer-v0]

Runs on CPU in ~10-20 min (pixel-env compile dominates); on TPU the
same script is minutes.  Prints one JSON line with the final losses.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FORCE_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    from mj_envs_tpu.utils.hostcpu import pin_cpu
    pin_cpu()

from mj_envs_tpu import envs
from mj_envs_tpu.utils.config import PlanetConfig
from mj_envs_tpu.utils.train import train_planet_policy


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "hammer-v0"
    config = PlanetConfig()
    config.env_name = task
    config.seed = 0
    config.max_episodes = 4            # 1 seed + 3 training episodes
    config.seed_episodes = 1
    config.max_episode_length = 16     # T = 8 at action_repeat 2
    config.action_repeat = 2
    config.batch_size = 6
    config.chunk_size = 6
    config.sample_iters = 1
    config.belief_size = 32
    config.state_size = 8
    config.hidden_size = 32
    config.embedding_size = 64
    config.candidates = 32
    config.optimisation_iters = 2
    config.top_candidates = 6
    config.planning_horizon = 3
    config.experience_size = 2000
    config.checkpoint_interval = 100
    config.test_interval = 100
    config.log_path = "/tmp/planet_smoke"

    import time
    t0 = time.time()
    env = envs.make(task)
    print(f"planet_smoke: env built in {time.time() - t0:.1f}s", flush=True)
    params, metrics = train_planet_policy(config, env)
    last = metrics.rows[-1]
    print(json.dumps({"task": task, "episodes": config.max_episodes,
                      "final": {k: round(float(v), 3)
                                for k, v in last.items()}}))


if __name__ == "__main__":
    main()
