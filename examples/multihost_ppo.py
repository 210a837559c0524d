"""Multi-host PPO with per-host sharded rollouts (SURVEY §2.4's last new
component): N processes — each owning its own gymnasium vector envs and its
own device shard — train ONE shared actor-critic GBT ensemble.

Per iteration, every host:
  1. rolls out its LOCAL envs, serving forwards from a host-mirror copy of
     the (replicated) ensemble (utils/host_mirror.py);
  2. computes GAE on its local slice;
  3. draws the GLOBAL minibatch plan with a shared per-iteration seed;
  4. calls parallel/hosts.host_ppo_update with only its local rollout
     shard — the histogram all-reduce over the mesh is the only cross-host
     traffic, and every host ends with a bit-identical ensemble.

Run (self-launching, 2 localhost processes x 4 virtual CPU devices each):
  python examples/multihost_ppo.py --steps 40000
Worker mode (used internally):
  python examples/multihost_ppo.py --worker <out.json> [--steps N]
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

N_ENVS = 8          # per host
N_STEPS = 128
BATCH = 256
EPOCHS = 4


def worker(out_path: str, total_steps: int, seed: int) -> None:
    import jax
    import gymnasium as gym
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ensemble import ensure_capacity, init_ensemble
    from gbrl_tpu.optimizers import OptimizerSpec
    from gbrl_tpu.parallel import hosts
    from gbrl_tpu.rl.jit_update import PPOHyper
    from gbrl_tpu.utils.host_mirror import HostMirror

    hosts.initialize()
    pid = jax.process_index()
    nproc = jax.process_count()
    mesh = hosts.global_mesh()

    F, A, O = 4, 2, 3
    cfg = TreeConfig(input_dim=F, output_dim=O, n_num_features=F,
                     max_depth=4, n_bins=64, grow_policy="greedy",
                     split_score_func="cosine")
    specs = (OptimizerSpec(algo="SGD", init_lr=0.17, start_idx=0, stop_idx=A),
             OptimizerSpec(algo="SGD", init_lr=0.01, start_idx=A,
                           stop_idx=O))
    hp = PPOHyper(n_actions=A, clip_range=0.2, ent_coef=0.0, vf_coef=0.5,
                  normalize_advantage=True, policy_clip=0.0, value_clip=0.0)

    rows_local = N_STEPS * N_ENVS
    rows_global = rows_local * nproc
    iters = -(-total_steps // (rows_global))
    trees_per_iter = EPOCHS * (-(-rows_global // BATCH))
    ens = ensure_capacity(init_ensemble(cfg, capacity=64),
                          iters * trees_per_iter)
    ens = hosts.replicate(mesh, ens)
    fw = hosts.replicate(mesh, np.ones(F, dtype=np.float32))

    # host mirror over the replicated ensemble (shim: HostMirror only needs
    # .cfg/.specs/.ens)
    shim = SimpleNamespace(cfg=cfg, specs=specs, ens=ens)
    mirror = HostMirror(shim)

    envs = gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * N_ENVS)
    obs, _ = envs.reset(seed=seed + 100 * pid)
    dones = np.zeros(N_ENVS, dtype=np.float32)
    ep_ret = np.zeros(N_ENVS)
    ep_rewards = []
    gamma, lam = 0.99, 0.95
    rng_local = np.random.default_rng(seed * 977 + pid)

    t0 = time.time()
    curve = []
    for it in range(iters):
        # ---------------- local rollout (host's own envs, mirror forwards)
        O_b = np.zeros((N_STEPS, N_ENVS, F), np.float32)
        A_b = np.zeros((N_STEPS, N_ENVS), np.int32)
        R_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        D_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        V_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        LP_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        for t in range(N_STEPS):
            preds = mirror.predict(obs.astype(np.float32))
            logits = preds[:, :A] - preds[:, :A].max(axis=1, keepdims=True)
            logp = logits - np.log(np.exp(logits).sum(1, keepdims=True))
            p = np.exp(logp)
            u = rng_local.random(N_ENVS)
            acts = (u[:, None] >= np.cumsum(p, axis=1)).sum(1)
            np.clip(acts, 0, A - 1, out=acts)
            O_b[t], A_b[t], D_b[t] = obs, acts, dones
            V_b[t] = preds[:, A]
            LP_b[t] = np.take_along_axis(logp, acts[:, None], 1)[:, 0]
            obs, rew, term, trunc, _ = envs.step(acts)
            done_now = np.logical_or(term, trunc).astype(np.float32)
            R_b[t] = rew
            ep_ret += rew
            for i in np.nonzero(done_now)[0]:
                ep_rewards.append(ep_ret[i])
                ep_ret[i] = 0.0
            dones = done_now
        boot = mirror.predict(obs.astype(np.float32))[:, A]
        adv = np.zeros_like(R_b)
        gae = np.zeros(N_ENVS, np.float32)
        nv, nnt = boot, 1.0 - dones
        for t in reversed(range(N_STEPS)):
            delta = R_b[t] + gamma * nv * nnt - V_b[t]
            gae = delta + gamma * lam * nnt * gae
            adv[t] = gae
            nv, nnt = V_b[t], 1.0 - D_b[t]
        ret = adv + V_b

        # ------------- global minibatch plan: SAME seed on every host
        prng = np.random.default_rng(seed * 100_003 + it)
        U = EPOCHS * (rows_global // BATCH)
        mb_idx = np.zeros((U, BATCH), np.int32)
        u = 0
        for _ in range(EPOCHS):
            perm = prng.permutation(rows_global)
            for start in range(0, rows_global, BATCH):
                sl = perm[start:start + BATCH]
                mb_idx[u, :len(sl)] = sl
                u += 1
        mb_n = np.full(U, BATCH, np.int32)

        ens, _ = hosts.host_ppo_update(
            cfg, hp, mesh, ens,
            O_b.reshape(rows_local, F), mb_idx, mb_n,
            A_b.reshape(-1), LP_b.reshape(-1), adv.reshape(-1),
            ret.reshape(-1), specs, fw,
            valid_local=(1.0 - D_b.reshape(-1)))
        shim.ens = ens
        mirror.learner = shim
        mirror.sync()
        if (it + 1) % 5 == 0 or it == iters - 1:
            m100 = float(np.mean(ep_rewards[-100:])) if ep_rewards else 0.0
            curve.append(dict(steps=(it + 1) * rows_global,
                              mean_reward_100=m100,
                              trees=int(np.asarray(ens.n_trees))))
            if pid == 0:
                print(f"it {it + 1}/{iters} m100 {m100:.1f} "
                      f"trees {int(np.asarray(ens.n_trees))}", flush=True)

    result = dict(
        process=pid, n_processes=nproc, devices=len(jax.devices()),
        total_steps=iters * rows_global, wall_s=time.time() - t0,
        env_steps_per_s=iters * rows_global / (time.time() - t0),
        final_mean100=float(np.mean(ep_rewards[-100:])) if ep_rewards else 0.0,
        trees=int(np.asarray(ens.n_trees)),
        ensemble_digest=[float(np.asarray(ens.leaf_values).sum()),
                         float(np.asarray(ens.thr).sum()),
                         int(np.asarray(ens.feat).sum())],
        curve=curve)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    hosts.shutdown()


def launch(total_steps: int, seed: int, nproc: int, out: str) -> None:
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    here = os.path.abspath(__file__)
    outs, procs = [], []
    for pid in range(nproc):
        o = f"/tmp/multihost_ppo_{pid}.json"
        outs.append(o)
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=os.path.dirname(os.path.dirname(here)),
        )
        procs.append(subprocess.Popen(
            [sys.executable, here, "--worker", o, "--steps",
             str(total_steps), "--seed", str(seed)], env=env))
    for p in procs:
        assert p.wait(timeout=1800) == 0, "worker failed"
    results = []
    for o in outs:
        with open(o) as f:
            results.append(json.load(f))
    d0, d1 = (r["ensemble_digest"] for r in results[:2])
    assert d0 == d1, f"ensembles diverged across hosts: {d0} vs {d1}"
    merged = dict(
        description=(
            "Multi-host PPO with per-host sharded rollouts: each process "
            "owns its own vector envs + device shard; update phases run "
            "through parallel/hosts.host_ppo_update with only local rollout "
            "slices; the ensemble digest is asserted identical across "
            "processes."),
        per_process=results,
        ensembles_identical=True,
        combined_env_steps_per_s=sum(r["env_steps_per_s"]
                                     for r in results))
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"ensembles identical across {nproc} processes; "
          f"final m100 per process: "
          f"{[round(r['final_mean100'], 1) for r in results]}; wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default="")
    ap.add_argument("--steps", type=int, default=40_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--out", default="examples/results_multihost_ppo.json")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.steps, args.seed)
    else:
        launch(args.steps, args.seed, args.nproc, args.out)


if __name__ == "__main__":
    main()
