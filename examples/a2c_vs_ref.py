"""BASELINE config 4 head-to-head, multi-seed: our A2C (shared actor-critic
GBT, Adam policy optimizer + SGD value optimizer, control variates,
oblivious trees) vs the UNMODIFIED reference C++ core driven by
bench_reference/a2c_ref.cpp — identical algorithm, hyperparameters, and
step budget on CartPole (the VERDICT criterion is curve parity within seed
variance at the shared budget, not absolute score; config 4's env in
BASELINE.json is LunarLander, whose Box2D physics has no C++ reference
harness — the CartPole harness from ppo_ref.cpp drives both sides
identically instead).

Usage:
  python examples/a2c_vs_ref.py --steps 300000 --seeds 0 1 2 \
      --ref-json /tmp/ppo_ref_build/a2c_seed{seed}.json \
      --out examples/results_a2c_vs_ref.json
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

from ppo_vs_ref import checkpoint_stats


def run_ours(steps: int, seed: int, device: str):
    from gbrl_tpu.rl.a2c import A2C
    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * 16)
    algo = A2C(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               policy_lr=0.05, value_lr=0.01, policy_algo="Adam",
               n_steps=64, ent_coef=0.01, control_variates=True,
               log_interval=50, device=device)
    t0 = time.time()
    algo.learn(total_timesteps=steps, seed=seed)
    wall = time.time() - t0
    env.close()
    return dict(seed=seed, wall_s=wall, final_mean100=algo.mean_reward(),
                trees=algo.model.get_num_trees(), curve=algo.curve)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300_000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--ref-json", default="")
    ap.add_argument("--out", default="examples/results_a2c_vs_ref.json")
    args = ap.parse_args()

    ours = []
    for seed in args.seeds:
        r = run_ours(args.steps, seed, args.device)
        print(f"[ours seed {seed}] final {r['final_mean100']:.1f} "
              f"wall {r['wall_s']:.1f}s trees {r['trees']}", flush=True)
        ours.append(r)

    result = dict(
        description=(
            "BASELINE config 4 head-to-head, multi-seed: identical A2C "
            "(shared actor-critic GBT, oblivious cosine d4 b256, Adam "
            "policy lr 0.05 + SGD value lr 0.01, control variates, 16 envs "
            "x 64 steps, one tree per rollout, ent_coef 0.01) on CartPole. "
            "Reference: unmodified compiled C++ core via "
            "bench_reference/a2c_ref.cpp."),
        ours=dict(runs=ours,
                  checkpoints=checkpoint_stats(ours, args.steps),
                  wall_s_mean=float(np.mean([r["wall_s"] for r in ours])),
                  final_mean100_per_seed=[round(r["final_mean100"], 1)
                                          for r in ours]))

    if args.ref_json:
        refs = []
        for seed in args.seeds:
            p = args.ref_json.replace("{seed}", str(seed))
            if os.path.exists(p):
                with open(p) as f:
                    refs.append(json.load(f))
        if refs:
            result["reference"] = dict(
                runs=refs,
                checkpoints=checkpoint_stats(refs, args.steps),
                wall_s_mean=float(np.mean([r["wall_s"] for r in refs])),
                final_mean100_per_seed=[round(r["curve"][-1][1], 1)
                                        for r in refs])
            om = result["ours"]["checkpoints"][-1]
            rm = result["reference"]["checkpoints"][-1]
            spread = max(om["std"], rm["std"], 1.0)
            result["verdict"] = (
                f"final mean100 ours {om['mean']:.1f}±{om['std']:.1f} vs "
                f"ref {rm['mean']:.1f}±{rm['std']:.1f} "
                f"({'within' if abs(om['mean'] - rm['mean']) <= 2 * spread else 'OUTSIDE'}"
                f" 2x max seed std)")
            print(result["verdict"], flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
