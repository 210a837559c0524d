"""A2C LunarLander hyperparameter probe (tuning toward BASELINE config 4).

Usage: python examples/a2c_sweep.py <tag> --steps 200000 [--device cpu] ...
Writes examples/sweep_a2c_<tag>.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import gymnasium as gym
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--n-envs", type=int, default=16)
    ap.add_argument("--n-steps", type=int, default=64)
    ap.add_argument("--policy-lr", type=float, default=0.05)
    ap.add_argument("--value-lr", type=float, default=0.01)
    ap.add_argument("--policy-algo", default="Adam")
    ap.add_argument("--ent-coef", type=float, default=0.01)
    ap.add_argument("--grow", default="oblivious")
    ap.add_argument("--cv", type=int, default=1)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.a2c import A2C

    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("LunarLander-v3")] * args.n_envs)
    algo = A2C(env,
               tree_struct=dict(max_depth=args.depth, n_bins=256,
                                min_data_in_leaf=0, par_th=2,
                                grow_policy=args.grow),
               policy_lr=args.policy_lr, value_lr=args.value_lr,
               policy_algo=args.policy_algo, control_variates=bool(args.cv),
               n_steps=args.n_steps, ent_coef=args.ent_coef,
               log_interval=0, device=args.device)
    t0 = time.time()
    curve = []
    chunk = 20_000
    done_steps = 0
    while done_steps < args.steps:
        algo.learn(total_timesteps=chunk, seed=args.seed + done_steps)
        done_steps += chunk
        curve.append([done_steps, float(np.mean(algo.episode_rewards[-100:]))
                      if algo.episode_rewards else float("nan")])
        print(f"[{args.tag}] {done_steps} steps mean100 {curve[-1][1]:.1f}",
              flush=True)
    out = dict(tag=args.tag, config=vars(args), curve=curve,
               final=curve[-1][1], trees=algo.model.get_num_trees(),
               wall_s=round(time.time() - t0, 1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"sweep_a2c_{args.tag}.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"[{args.tag}] final {out['final']:.1f} trees {out['trees']}")


if __name__ == "__main__":
    main()
