"""PPO with a shared policy/value GBT tree on CartPole-v1 (BASELINE config 3).

Usage: python examples/ppo_cartpole.py [--steps 100000] [--device tpu|cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import gymnasium as gym
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--n-envs", type=int, default=16)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.ppo import PPO

    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * args.n_envs)
    algo = PPO(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="greedy"),
               policy_lr=0.17, value_lr=0.01,
               n_steps=256, batch_size=512, n_epochs=4, ent_coef=0.0,
               log_interval=5, device=args.device)
    t0 = time.time()
    algo.learn(total_timesteps=args.steps, seed=args.seed)
    dt = time.time() - t0
    print(f"done: mean_reward={algo.mean_reward():.1f} "
          f"trees={algo.model.get_num_trees()} "
          f"env_steps_per_s={args.steps / dt:.0f}")


if __name__ == "__main__":
    main()
