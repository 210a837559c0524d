"""A2C with Adam leaf optimizer + control variates on LunarLander-v3
(BASELINE config 4).

Usage: python examples/a2c_lunarlander.py [--steps 200000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import gymnasium as gym


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--n-envs", type=int, default=16)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.a2c import A2C

    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("LunarLander-v3")] * args.n_envs)
    algo = A2C(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               policy_lr=0.05, value_lr=0.01, policy_algo="Adam",
               control_variates=True, n_steps=64, ent_coef=0.01,
               log_interval=25, device=args.device)
    t0 = time.time()
    algo.learn(total_timesteps=args.steps, seed=args.seed)
    dt = time.time() - t0
    print(f"done: mean_reward={algo.mean_reward():.1f} "
          f"trees={algo.model.get_num_trees()} "
          f"env_steps_per_s={args.steps / dt:.0f}")


if __name__ == "__main__":
    main()
