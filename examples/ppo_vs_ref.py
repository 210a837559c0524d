"""BASELINE config 3 head-to-head, multi-seed: our PPO (shared actor-critic
GBT, TPU fitter + host-mirror rollout forwards) vs the UNMODIFIED reference
C++ core driven by bench_reference/ppo_ref.cpp — identical algorithm,
hyperparameters, and 500k-step budget on CartPole-v1.

Usage:
  python examples/ppo_vs_ref.py --steps 500000 --seeds 0 1 2 \
      --ref-json /tmp/ppo_ref_build/ref_seed{seed}.json \
      --out examples/results_ppo_cartpole_vs_ref.json

The reference side is produced separately (compile bench_reference/
ppo_ref.cpp against /root/reference sources, run per seed).  This script
runs our side per seed in one process (device init amortized), then merges
both into one JSON with mean±std at 50k-step checkpoints.
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


def run_ours(steps: int, seed: int, device: str):
    from gbrl_tpu.rl.ppo import PPO
    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * 16)
    algo = PPO(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="greedy"),
               policy_lr=0.17, value_lr=0.01,
               n_steps=256, batch_size=512, n_epochs=4, ent_coef=0.0,
               log_interval=20, device=device)
    t0 = time.time()
    algo.learn(total_timesteps=steps, seed=seed)
    wall = time.time() - t0
    env.close()
    return dict(seed=seed, wall_s=wall, final_mean100=algo.mean_reward(),
                trees=algo.model.get_num_trees(), curve=algo.curve)


def checkpoint_stats(runs, steps, key="mean_reward_100"):
    """mean±std of mean100 at ~50k-step checkpoints across seeds."""
    marks = list(range(50_000, steps + 1, 50_000))
    rows = []
    for m in marks:
        vals = []
        for r in runs:
            curve = r["curve"]
            if isinstance(curve[0], dict):
                pts = [(c["steps"], c[key]) for c in curve]
            else:
                pts = [(c[0], c[1]) for c in curve]
            best = min(pts, key=lambda p: abs(p[0] - m))
            vals.append(best[1])
        rows.append(dict(steps=m, mean=float(np.mean(vals)),
                         std=float(np.std(vals)),
                         per_seed=[round(v, 1) for v in vals]))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500_000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--ref-json", default="")
    ap.add_argument("--out", default="examples/results_ppo_cartpole_vs_ref.json")
    ap.add_argument("--merge-only", action="store_true",
                    help="reuse the 'ours' runs already in --out; only "
                         "re-merge the reference JSONs and verdict")
    args = ap.parse_args()

    if args.merge_only:
        with open(args.out) as f:
            ours = json.load(f)["ours"]["runs"]
    else:
        ours = []
        for seed in args.seeds:
            r = run_ours(args.steps, seed, args.device)
            print(f"[ours seed {seed}] final {r['final_mean100']:.1f} "
                  f"wall {r['wall_s']:.1f}s trees {r['trees']}", flush=True)
            ours.append(r)

    result = dict(
        description=(
            "BASELINE config 3 head-to-head, multi-seed: identical PPO "
            "(shared actor-critic GBT, greedy cosine d4 b256, SGD lr 0.17 "
            "policy / 0.01 value, 16 envs x 256 steps, batch 512, 4 epochs) "
            "on CartPole-v1 for 500k steps. Reference: unmodified compiled "
            "C++ core via bench_reference/ppo_ref.cpp. Ours: "
            "gbrl_tpu.rl.PPO — TPU fitter (jit update loop) + host-mirror "
            "rollout forwards (utils/host_mirror.py)."),
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
            ref_wall = float(np.mean([r["wall_s"] for r in refs]))
            result["reference"] = dict(
                runs=refs,
                checkpoints=checkpoint_stats(refs, args.steps),
                wall_s_mean=ref_wall,
                wall_note="mean of per-seed SOLO (sequential) runs",
                final_mean100_per_seed=[round(r["curve"][-1][1], 1)
                                        for r in refs])
            # compare the PLATEAU (mean of the last 3 checkpoints across
            # seeds) rather than the final snapshot: late-training CartPole
            # mean-100 oscillates +-30, so single-moment comparisons flip
            # by luck of the draw
            def plateau(side):
                cps = result[side]["checkpoints"][-3:]
                vals = [v for c in cps for v in c["per_seed"]]
                return (float(np.mean(vals)),
                        float(np.std(vals)))
            om, ostd = plateau("ours")
            rm, rstd = plateau("reference")
            spread = max(ostd, rstd, 1.0)
            result["verdict"] = (
                f"plateau mean100 (last 3 checkpoints x seeds) ours "
                f"{om:.1f}±{ostd:.1f} vs ref {rm:.1f}±{rstd:.1f} "
                f"({'within' if abs(om - rm) <= 2 * spread else 'OUTSIDE'}"
                f" 2x max spread); wall ours "
                f"{result['ours']['wall_s_mean']:.1f}s vs ref "
                f"{result['reference']['wall_s_mean']:.1f}s")
            print(result["verdict"], flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
