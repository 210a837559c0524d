"""AWR on MuJoCo continuous control with feature weights
(BASELINE config 5).

Usage: python examples/awr_mujoco.py [--env HalfCheetah-v5] [--steps 300000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import gymnasium as gym
import numpy as np


def shap_feature_weights(env_id: str, n_envs: int, pilot_steps: int,
                         seed: int, device: str) -> np.ndarray:
    """SHAP-derived feature weights (BASELINE config 5's "with feature
    weights"): run a short uniform-weight pilot, attribute the pilot
    critic's value predictions to input features with exact linear
    TreeSHAP (learners/gbt_learner.shap; reference mechanism:
    fitter.cpp:317-371 consumes the weights, shap.cpp computes
    attributions), and weight each feature by its mean |SHAP| share,
    floored at 0.25 and normalized to mean 1 so no feature is silenced."""
    from gbrl_tpu.rl.awr import AWR
    env = gym.vector.SyncVectorEnv([lambda: gym.make(env_id)] * n_envs)
    obs_dim = int(np.prod(env.single_observation_space.shape))
    algo = AWR(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               actor_lr=0.05, critic_lr=0.05, beta=0.5,
               log_std_final=-1.4, n_steps=2048, actor_updates=20,
               critic_updates=60, batch_size=2048,
               feature_weights=np.ones(obs_dim), device=device)
    algo.learn(total_timesteps=pilot_steps, seed=seed + 7000)
    obs_sample = np.concatenate(
        [chunk[0].reshape(-1, obs_dim) for chunk in algo._replay])[:2048]
    sv = algo.critic.learner.shap(obs_sample.astype(np.float32))
    imp = np.abs(np.asarray(sv)).mean(axis=0).reshape(obs_dim, -1).sum(1)
    env.close()
    w = np.maximum(imp / max(imp.mean(), 1e-12), 0.25)
    return (w / w.mean()).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="HalfCheetah-v5")
    ap.add_argument("--steps", type=int, default=300_000)
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--feature-weights", choices=["uniform", "shap"],
                    default="shap")
    ap.add_argument("--gamma", type=float, default=0.99)
    ap.add_argument("--fw-pilot-steps", type=int, default=30_000)
    args = ap.parse_args()

    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from gbrl_tpu.rl.awr import AWR

    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make(args.env)] * args.n_envs)
    obs_dim = int(np.prod(env.single_observation_space.shape))
    # tuned round 3: cooled critic (lr 0.05, 60 trees/iter, batch 2048)
    # stabilizes the bootstrapped-target regression; beta 0.5 selectivity;
    # fixed-sigma actor with sigma^2-free weighted regression + per-sample
    # grad clip (see rl/awr.py) -- Pendulum improves monotonically
    # -1112 -> ~-320 over 300k steps
    if args.feature_weights == "shap":
        fw = shap_feature_weights(args.env, args.n_envs,
                                  args.fw_pilot_steps, args.seed,
                                  args.device)
        print(f"SHAP-derived feature weights: "
              f"{np.round(fw, 2).tolist()}", flush=True)
    else:
        fw = np.ones(obs_dim, dtype=np.float32)
    algo = AWR(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               actor_lr=0.05, critic_lr=0.05, beta=0.5,
               gamma=args.gamma, log_std_final=-1.4,
               n_steps=2048, actor_updates=20, critic_updates=60,
               batch_size=2048, feature_weights=fw,
               log_interval=10, device=args.device)
    t0 = time.time()
    algo.learn(total_timesteps=args.steps, seed=args.seed)
    dt = time.time() - t0
    print(f"done: mean_reward={algo.mean_reward():.1f} "
          f"actor_trees={algo.actor.get_num_trees()} "
          f"env_steps_per_s={args.steps / dt:.0f}")

    import json
    er = [float(r) for r in algo.episode_rewards]
    k = max(1, len(er) // 20)
    curve = [{"episode": i, "mean_k": float(np.mean(er[max(0, i - k):i]))}
             for i in range(k, len(er) + 1, k)]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f"results_awr_{args.env.split('-')[0].lower()}.json")
    with open(out, "w") as f:
        json.dump({
            "config": (f"AWR oblivious d4 b256 actor_lr0.05 critic_lr0.05 "
                       f"beta0.5 n_steps2048 updates20/60 batch2048 "
                       f"fixed-sigma(-0.5->-1.4) grad-clip10"),
            "env": args.env, "steps": args.steps, "seed": args.seed,
            "n_envs": args.n_envs, "device": args.device,
            "gamma": args.gamma,
            "feature_weights_mode": args.feature_weights,
            "feature_weights": [round(float(x), 3) for x in fw],
            "final_mean_reward_100": float(algo.mean_reward()),
            "first_episodes_mean": float(np.mean(er[:k])) if er else None,
            "actor_trees": int(algo.actor.get_num_trees()),
            "critic_trees": int(algo.critic.get_num_trees()),
            "env_steps_per_s": args.steps / dt,
            "wall_clock_s": dt,
            "reward_curve": curve,
            "training_curve": getattr(algo, "curve", []),
        }, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
