"""SAC with GBT actor + twin parametric Q-critics on Pendulum-v1.

The reference delegates SAC to its companion repo GBRL_SB3 (reference
README.md:19); this framework ships it in-repo.  The critic trees output
Q-function *parameters* theta(s) (linear / quadratic / tanh forms,
reference gbrl/models/critic.py:42-54) so dQ/da is analytic, and the
target network is the ensemble prefix — older trees, no polyak copies.

STATUS (documented honestly, see ROADMAP.md): the round-4 diagnosis — a
1-step-TD critic whose value head varied only ±18 across states (true V
spans ~900), giving the actor no usable dQ/da — pointed at the bootstrap
chain, and n-STEP TD TARGETS fixed it (rl/buffers.NStepAccumulator:
each replay row carries n real rewards and a gamma^n bootstrap tail).
20k-step sweep on Pendulum, mean-100 reward (random ~= -1200):

    1-step (any q-func/gamma/lr swept in r4):   flat at -1200..-1350
    linear-Q  n_step=5  gamma=0.95:             -1173
    quadratic n_step=10 gamma=0.9:              -1202
    tanh      n_step=5  gamma=0.95:             -1333
    quadratic n_step=5  g0.95 2x tree budget:    -954
    linear-Q  n_step=10 gamma=0.9 clr=0.1:       -928  <- learns
    + 2x tree budget (the default config here): -576 at 30k and falling

At 80k steps the un-annealed run peaks at -282 (45k) then churns back to
-499 (every new full-lr tree keeps overwriting a converged policy);
adding the reference's Linear lr anneal (--critic-lr lin_0.1
--actor-lr lin_0.02, annealed over the planned tree budget) holds the
plateau: -308.9 / -345.1 / -444.9 over seeds 0/1/2 (mean -366±57,
results_sac_pendulum.json).  Still experimental: Pendulum 'solved' is
~-200, seed variance is wide, and no reference baseline exists (the
reference ships no SAC).

Usage: python examples/sac_pendulum.py --steps 80000 \
           --critic-lr lin_0.1 --actor-lr lin_0.02 [--seeds 0 1 2]
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
    ap.add_argument("--q-func", default="linear",
                    choices=["linear", "quadratic", "tanh"])
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--n-step", type=int, default=10,
                    help="n-step TD targets (1 = classic SAC)")
    ap.add_argument("--gamma", type=float, default=0.9)
    ap.add_argument("--gradient-steps", type=int, default=2)
    ap.add_argument("--train-freq", type=int, default=2)
    def _lr(s):     # float, or the reference's "lin_<lr>" anneal strings
        return s if s.startswith("lin_") else float(s)
    ap.add_argument("--critic-lr", type=_lr, default=0.1)
    ap.add_argument("--actor-lr", type=_lr, default=0.02)
    ap.add_argument("--no-write", action="store_true",
                    help="sweep mode: skip the results JSON")
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.sac import SAC

    planned_trees = (args.steps // (args.train_freq * args.n_envs)
                     ) * args.gradient_steps
    runs = []
    for seed in args.seeds:
        env = gym.vector.SyncVectorEnv(
            [lambda: gym.make(args.env)] * args.n_envs)
        algo = SAC(env, q_func_type=args.q_func,
                   actor_lr=args.actor_lr, critic_lr=args.critic_lr,
                   schedule_T=planned_trees,
                   gamma=args.gamma, n_step=args.n_step,
                   gradient_steps=args.gradient_steps,
                   learning_starts=1000, batch_size=256,
                   train_freq=args.train_freq,
                   target_update_interval=100, log_interval=200,
                   device=args.device)
        t0 = time.time()
        algo.learn(total_timesteps=args.steps, seed=seed)
        dt = time.time() - t0
        env.close()
        print(f"done seed {seed}: {args.steps} steps in {dt:.1f}s "
              f"({args.steps / dt:.0f} env-steps/s), "
              f"actor trees {algo.actor.get_num_trees()}, "
              f"ep_rew_mean(100) {algo.mean_reward():.1f}", flush=True)
        er = [float(r) for r in algo.episode_rewards]
        k = max(1, len(er) // 20)
        runs.append({
            "seed": seed, "final_mean_reward_100": float(algo.mean_reward()),
            "first_episodes_mean": float(np.mean(er[:k])) if er else None,
            "actor_trees": int(algo.actor.get_num_trees()),
            "env_steps_per_s": args.steps / dt, "wall_clock_s": dt,
            "reward_curve": [
                {"episode": i, "mean_k": float(np.mean(er[max(0, i - k):i]))}
                for i in range(k, len(er) + 1, k)],
        })

    if args.no_write:
        return

    import json
    finals = [r["final_mean_reward_100"] for r in runs]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_sac_pendulum.json")
    with open(out, "w") as f:
        json.dump({
            "config": (f"SAC twin-{args.q_func}-Q prefix-targets "
                       f"actor_lr{args.actor_lr} critic_lr{args.critic_lr} "
                       f"gamma{args.gamma} n_step{args.n_step} batch256 "
                       f"train_freq{args.train_freq} "
                       f"grad_steps{args.gradient_steps} "
                       f"schedule_T{planned_trees}"),
            "env": args.env, "steps": args.steps,
            "seeds": args.seeds,
            "final_mean_reward_100_per_seed": [round(x, 1) for x in finals],
            "final_mean_reward_100_mean": float(np.mean(finals)),
            "final_mean_reward_100_std": float(np.std(finals)),
            "runs": runs,
        }, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
