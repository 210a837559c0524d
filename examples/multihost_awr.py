"""Multi-host AWR with per-host sharded replay (BASELINE config 5's
"sharded over 2+ hosts" clause): N processes — each owning its own
gymnasium vector envs and device shard — train ONE shared GaussianActor +
value-critic GBT pair.

Per iteration, every host:
  1. rolls out its LOCAL envs with fixed-std Gaussian sampling, serving
     actor forwards from a host-mirror copy of the replicated ensemble;
  2. recomputes TD(lambda) advantages over its LOCAL replay with the
     current critic (mirror-served);
  3. draws the GLOBAL critic/actor minibatch plans with a shared
     per-iteration seed;
  4. calls parallel/hosts.host_awr_update with only its local replay
     shard — the histogram all-reduce over the mesh is the only cross-host
     traffic, and every host ends with bit-identical actor AND critic
     ensembles (digest-asserted).

Run (self-launching, 2 localhost processes x 4 virtual CPU devices each):
  python examples/multihost_awr.py --steps 8192
Worker mode (used internally):
  python examples/multihost_awr.py --worker <out.json> [--steps N]
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

N_ENVS = 4          # per host
N_STEPS = 256       # per host per iteration (rows_local = N_STEPS)
BATCH = 256
CRITIC_UPDATES = 8
ACTOR_UPDATES = 4


def worker(out_path: str, total_steps: int, seed: int) -> None:
    import jax
    import gymnasium as gym
    from gbrl_tpu.config import TreeConfig
    from gbrl_tpu.ensemble import ensure_capacity, init_ensemble
    from gbrl_tpu.optimizers import OptimizerSpec
    from gbrl_tpu.parallel import hosts
    from gbrl_tpu.rl.jit_awr import AWRHyper
    from gbrl_tpu.utils.host_mirror import HostMirror

    hosts.initialize()
    pid = jax.process_index()
    nproc = jax.process_count()
    mesh = hosts.global_mesh()

    F, A = 3, 1
    log_std = -0.5
    gamma, lam, beta = 0.99, 0.95, 0.5
    acfg = TreeConfig(input_dim=F, output_dim=A, n_num_features=F,
                      max_depth=3, n_bins=32, grow_policy="oblivious",
                      split_score_func="cosine")
    ccfg = TreeConfig(input_dim=F, output_dim=1, n_num_features=F,
                      max_depth=3, n_bins=32, grow_policy="oblivious",
                      split_score_func="cosine")
    actor_specs = (OptimizerSpec(algo="SGD", init_lr=0.05, start_idx=0,
                                 stop_idx=A),)
    critic_specs = (OptimizerSpec(algo="SGD", init_lr=0.1, start_idx=0,
                                  stop_idx=1),)
    hp = AWRHyper(act_dim=A, beta=beta, max_weight=20.0, learn_std=False,
                  log_std_init=log_std, grad_clip=10.0)

    rows_local = N_STEPS * N_ENVS
    rows_global = rows_local * nproc
    iters = -(-total_steps // rows_global)
    actor_ens = ensure_capacity(init_ensemble(acfg, capacity=64),
                                iters * ACTOR_UPDATES)
    critic_ens = ensure_capacity(init_ensemble(ccfg, capacity=64),
                                 iters * CRITIC_UPDATES)
    actor_ens = hosts.replicate(mesh, actor_ens)
    critic_ens = hosts.replicate(mesh, critic_ens)
    fw = hosts.replicate(mesh, np.ones(F, dtype=np.float32))

    ashim = SimpleNamespace(cfg=acfg, specs=actor_specs, ens=actor_ens)
    cshim = SimpleNamespace(cfg=ccfg, specs=critic_specs, ens=critic_ens)
    amirror, cmirror = HostMirror(ashim), HostMirror(cshim)

    envs = gym.vector.SyncVectorEnv(
        [lambda: gym.make("Pendulum-v1")] * N_ENVS)
    low = envs.single_action_space.low
    high = envs.single_action_space.high
    obs, _ = envs.reset(seed=seed + 100 * pid)
    prev_done = np.zeros(N_ENVS, dtype=bool)
    ep_ret = np.zeros(N_ENVS)
    ep_rewards = []
    rng_local = np.random.default_rng(seed * 977 + pid)

    t0 = time.time()
    for it in range(iters):
        # ---------------- local rollout (fixed-std Gaussian sampling)
        O_b = np.zeros((N_STEPS, N_ENVS, F), np.float32)
        NO_b = np.zeros((N_STEPS, N_ENVS, F), np.float32)
        A_b = np.zeros((N_STEPS, N_ENVS, A), np.float32)
        R_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        T_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        D_b = np.zeros((N_STEPS, N_ENVS), np.float32)
        V_b = np.zeros((N_STEPS, N_ENVS), np.float32)  # valid mask
        for t in range(N_STEPS):
            mu = amirror.predict(obs.astype(np.float32))
            a = mu + np.exp(log_std) * rng_local.standard_normal(
                mu.shape).astype(np.float32)
            a = np.clip(a, low, high)
            next_obs, rew, term, trunc, _ = envs.step(a)
            done = np.logical_or(term, trunc)
            O_b[t], NO_b[t], A_b[t], R_b[t] = obs, next_obs, a, rew
            T_b[t] = term.astype(np.float32)
            D_b[t] = done.astype(np.float32)
            V_b[t] = 1.0 - prev_done.astype(np.float32)
            ep_ret += np.where(prev_done, 0.0, rew)
            for i in range(N_ENVS):
                if done[i] and not prev_done[i]:
                    ep_rewards.append(ep_ret[i])
                    ep_ret[i] = 0.0
            prev_done = done
            obs = next_obs

        # -------- local TD(lambda) advantages with the CURRENT critic
        v = cmirror.predict(O_b.reshape(-1, F))[:, 0].reshape(N_STEPS,
                                                              N_ENVS)
        vn = cmirror.predict(NO_b.reshape(-1, F))[:, 0].reshape(N_STEPS,
                                                                N_ENVS)
        delta = R_b + gamma * (1.0 - T_b) * vn - v
        adv = np.zeros_like(R_b)
        gae = np.zeros(N_ENVS, np.float32)
        for t in reversed(range(N_STEPS)):
            gae = delta[t] + gamma * lam * (1.0 - D_b[t]) * gae
            adv[t] = gae
        ret = adv + v

        # keep shard sizes equal across hosts: invalid (post-done autoreset)
        # rows stay in the batch but must contribute ~zero gradient on BOTH
        # heads — critic: ret=v zeroes (v-ret); actor: action target = the
        # CURRENT policy mean, so w*(a-mu) ~ 0 regardless of the row's
        # standardized-advantage weight
        keep = V_b.reshape(-1) > 0.5
        X_l = O_b.reshape(-1, F)
        mu_cur = amirror.predict(X_l)[:, :A]
        acts_l = np.where(keep[:, None], A_b.reshape(-1, A), mu_cur)
        rets_l = np.where(keep, ret.reshape(-1), v.reshape(-1))
        advs_l = np.where(keep, adv.reshape(-1), 0.0)

        # ------------- global minibatch plans: SAME seed on every host
        prng = np.random.default_rng(seed * 100_003 + it)
        cmb = prng.integers(0, rows_global,
                            (CRITIC_UPDATES, BATCH)).astype(np.int32)
        amb = prng.integers(0, rows_global,
                            (ACTOR_UPDATES, BATCH)).astype(np.int32)

        actor_ens, critic_ens, _ = hosts.host_awr_update(
            acfg, ccfg, hp, mesh, actor_ens, critic_ens,
            X_l, acts_l.astype(np.float32), rets_l.astype(np.float32),
            advs_l.astype(np.float32), cmb, amb, (actor_specs,
                                                  critic_specs), fw)
        ashim.ens, cshim.ens = actor_ens, critic_ens
        amirror.sync()
        cmirror.sync()

    m100 = float(np.mean(ep_rewards[-100:])) if ep_rewards else 0.0
    result = dict(
        process=pid, n_processes=nproc, devices=len(jax.devices()),
        total_steps=iters * rows_global, wall_s=time.time() - t0,
        env_steps_per_s=iters * rows_global / (time.time() - t0),
        final_mean100=m100,
        actor_trees=int(np.asarray(actor_ens.n_trees)),
        critic_trees=int(np.asarray(critic_ens.n_trees)),
        ensemble_digest=[float(np.asarray(actor_ens.leaf_values).sum()),
                         float(np.asarray(critic_ens.leaf_values).sum()),
                         float(np.asarray(actor_ens.thr).sum()),
                         int(np.asarray(critic_ens.feat).sum())])
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    hosts.shutdown()


def launch(total_steps: int, seed: int, nproc: int, out: str) -> None:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    here = os.path.abspath(__file__)
    outs, procs = [], []
    for pid in range(nproc):
        o = f"/tmp/multihost_awr_{pid}.json"
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
            "Multi-host AWR with per-host sharded replay (BASELINE config "
            "5 sharding clause): each process owns its own vector envs + "
            "device shard; update phases run through parallel/hosts."
            "host_awr_update with only local replay slices; actor AND "
            "critic ensemble digests asserted identical across processes."),
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
    ap.add_argument("--steps", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--out", default="examples/results_multihost_awr.json")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.steps, args.seed)
    else:
        launch(args.steps, args.seed, args.nproc, args.out)


if __name__ == "__main__":
    main()
