"""BASELINE config 4 head-to-head ON ITS ACTUAL ENVIRONMENT: A2C (shared
actor-critic GBT, Adam policy optimizer + SGD value optimizer, control
variates, oblivious trees) on LunarLander — ours vs the UNMODIFIED reference
C++ core.

Both sides run the IDENTICAL Python algorithm loop (gbrl_tpu.rl.A2C) and the
IDENTICAL gymnasium envs; the reference side swaps in a torch facade over the
compiled reference core (bench_reference/ref_backend.py -> ref_shim.cpp ->
/root/reference/gbrl/src/cpp), so walls compare the cores under the same env
cost.  BASELINE.json says "LunarLander-v2"; gymnasium>=1.0 ships it as
LunarLander-v3 (identical dynamics, renamed id).

Run each side solo (sequentially, idle host) for honest walls:

  python examples/a2c_lunarlander_vs_ref.py --side ref  --seeds 0 1 2
  python examples/a2c_lunarlander_vs_ref.py --side ours --seeds 0 1 2
  python examples/a2c_lunarlander_vs_ref.py --side combine
"""
import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, os.path.join(_HERE, "..", "bench_reference"))

import gymnasium as gym
import numpy as np

from ppo_vs_ref import checkpoint_stats

HYPERS = dict(policy_lr=0.05, value_lr=0.01, policy_algo="Adam",
              n_steps=64, ent_coef=0.01, control_variates=True)
N_ENVS = 16


def make_env(env_id: str):
    return gym.vector.SyncVectorEnv([lambda: gym.make(env_id)] * N_ENVS)


def run_side(side: str, env_id: str, steps: int, seed: int, device: str):
    from gbrl_tpu.rl.a2c import A2C
    env = make_env(env_id)
    algo = A2C(env,
               tree_struct=dict(max_depth=4, n_bins=256, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               log_interval=50, device=device, **HYPERS)
    if side == "ref":
        from ref_backend import RefActorCritic
        obs_dim = int(np.prod(env.single_observation_space.shape))
        algo.model = RefActorCritic(
            input_dim=obs_dim, n_actions=int(env.single_action_space.n),
            policy_algo=HYPERS["policy_algo"],
            policy_lr=HYPERS["policy_lr"], value_lr=HYPERS["value_lr"],
            control_variates=HYPERS["control_variates"],
            batch_size=N_ENVS * HYPERS["n_steps"])
        algo._mirror = False          # reference serves its own CPU predicts
    t0 = time.time()
    algo.learn(total_timesteps=steps, seed=seed)
    wall = time.time() - t0
    env.close()
    return dict(seed=seed, wall_s=wall, final_mean100=algo.mean_reward(),
                trees=algo.model.get_num_trees(),
                curve=[[c["steps"], c["mean_reward_100"]]
                       for c in algo.curve])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ours", "ref", "combine"],
                    required=True)
    ap.add_argument("--env-id", default="LunarLander-v3")
    ap.add_argument("--steps", type=int, default=300_000)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--out",
                    default=os.path.join(
                        _HERE, "results_a2c_lunarlander_vs_ref.json"))
    args = ap.parse_args()
    tag = args.env_id.split("-")[0].lower()
    part = os.path.join(_HERE, f"_a2c_{tag}_{{side}}.json")

    if args.side in ("ours", "ref"):
        runs = []
        for seed in args.seeds:
            r = run_side(args.side, args.env_id, args.steps, seed,
                         args.device)
            print(f"[{args.side} seed {seed}] final "
                  f"{r['final_mean100']:.1f} wall {r['wall_s']:.1f}s "
                  f"trees {r['trees']}", flush=True)
            runs.append(r)
        with open(part.format(side=args.side), "w") as f:
            json.dump(dict(steps=args.steps, runs=runs), f)
        return

    sides = {}
    for side in ("ours", "ref"):
        with open(part.format(side=side)) as f:
            sides[side] = json.load(f)
    steps = sides["ours"]["steps"]

    def summarize(runs):
        return dict(
            runs=runs, checkpoints=checkpoint_stats(runs, steps),
            wall_s_per_seed=[round(r["wall_s"], 1) for r in runs],
            wall_s_mean=float(np.mean([r["wall_s"] for r in runs])),
            final_mean100_per_seed=[round(r["final_mean100"], 1)
                                    for r in runs])

    result = dict(
        description=(
            "BASELINE config 4 head-to-head on LunarLander-v3 "
            "(gymnasium>=1.0 id for LunarLander-v2): identical A2C "
            "(shared actor-critic GBT, oblivious cosine d4 b256, Adam "
            "policy lr 0.05 + SGD value lr 0.01, control variates, 16 envs "
            "x 64 steps, one tree per rollout, ent_coef 0.01), identical "
            "gymnasium envs and Python loop on both sides; reference side "
            "= unmodified compiled C++ core via bench_reference/"
            "ref_shim.cpp. Each side run solo (sequential seeds, idle "
            "host)."),
        env=args.env_id, total_steps=steps,
        ours=summarize(sides["ours"]["runs"]),
        reference=summarize(sides["ref"]["runs"]))
    om, rm = result["ours"], result["reference"]
    oc, rc = om["checkpoints"][-1], rm["checkpoints"][-1]
    spread = max(oc["std"], rc["std"], 1.0)
    within = abs(oc["mean"] - rc["mean"]) <= 2 * spread
    result["verdict"] = (
        f"reward: final mean100 ours {oc['mean']:.1f}±{oc['std']:.1f} vs "
        f"ref {rc['mean']:.1f}±{rc['std']:.1f} "
        f"({'within' if within else 'OUTSIDE'} 2x max seed std); "
        f"wall: ours {om['wall_s_mean']:.1f}s vs ref "
        f"{rm['wall_s_mean']:.1f}s "
        f"({rm['wall_s_mean'] / om['wall_s_mean']:.2f}x)")
    print(result["verdict"], flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
