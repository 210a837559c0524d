"""SAC with GBT actor + twin parametric Q-critics on Pendulum-v1.

The reference delegates SAC to its companion repo GBRL_SB3 (reference
README.md:19); this framework ships it in-repo.  The critic trees output
Q-function *parameters* theta(s) (linear / quadratic / tanh forms,
reference gbrl/models/critic.py:42-54) so dQ/da is analytic, and the
target network is the ensemble prefix — older trees, no polyak copies.

STATUS (documented honestly, see ROADMAP.md): SAC learns contextual-bandit
tasks (tests/test_sac.py) and runs at full speed (~330 env-steps/s with the
host-mirror rollout + fused train step), but does NOT solve Pendulum at
small GBT budgets.  Diagnosed, not just observed: after 20k steps the
critic's value head varies only ±18 across states (true V spans ~900), so
dQ/da gives the actor no useful signal; entropy floors, hotter critics,
value-scale bias jumps, and lower gammas were all swept without success.
The bootstrapped-TD + tree-budget combination needs a different critic
design (e.g. n-step/Retrace targets); treat in-repo SAC as experimental.

Usage: python examples/sac_pendulum.py [--steps 30000] [--q-func quadratic]
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
    ap.add_argument("--env", default="Pendulum-v1")
    ap.add_argument("--steps", type=int, default=30_000)
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--q-func", default="quadratic",
                    choices=["linear", "quadratic", "tanh"])
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-step", type=int, default=5,
                    help="n-step TD targets (1 = classic SAC)")
    ap.add_argument("--gamma", type=float, default=0.95)
    ap.add_argument("--gradient-steps", type=int, default=1)
    ap.add_argument("--train-freq", type=int, default=4)
    ap.add_argument("--critic-lr", type=float, default=0.05)
    ap.add_argument("--actor-lr", type=float, default=0.02)
    ap.add_argument("--no-write", action="store_true",
                    help="sweep mode: skip the results JSON")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.sac import SAC

    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make(args.env)] * args.n_envs)
    algo = SAC(env, q_func_type=args.q_func,
               actor_lr=args.actor_lr, critic_lr=args.critic_lr,
               gamma=args.gamma, n_step=args.n_step,
               gradient_steps=args.gradient_steps,
               learning_starts=1000, batch_size=256,
               train_freq=args.train_freq,
               target_update_interval=100, log_interval=200,
               device=args.device)
    t0 = time.time()
    algo.learn(total_timesteps=args.steps, seed=args.seed)
    dt = time.time() - t0
    env.close()
    print(f"done: {args.steps} steps in {dt:.1f}s "
          f"({args.steps / dt:.0f} env-steps/s), "
          f"actor trees {algo.actor.get_num_trees()}, "
          f"ep_rew_mean(100) {algo.mean_reward():.1f}")

    if args.no_write:
        return

    import json
    er = [float(r) for r in algo.episode_rewards]
    k = max(1, len(er) // 20)
    curve = [{"episode": i, "mean_k": float(np.mean(er[max(0, i - k):i]))}
             for i in range(k, len(er) + 1, k)]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_sac_pendulum.json")
    with open(out, "w") as f:
        json.dump({
            "config": (f"SAC twin-{args.q_func}-Q prefix-targets "
                       f"actor_lr{args.actor_lr} critic_lr{args.critic_lr} "
                       f"gamma{args.gamma} n_step{args.n_step} batch256 "
                       f"train_freq{args.train_freq} "
                       f"grad_steps{args.gradient_steps}"),
            "env": args.env, "steps": args.steps, "seed": args.seed,
            "final_mean_reward_100": float(algo.mean_reward()),
            "first_episodes_mean": float(np.mean(er[:k])) if er else None,
            "actor_trees": int(algo.actor.get_num_trees()),
            "env_steps_per_s": args.steps / dt, "wall_clock_s": dt,
            "reward_curve": curve,
        }, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
