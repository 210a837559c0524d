"""SAC tests: parametric Q-forms, tanh-Gaussian log-probs, the critic
regression / actor improvement plumbing, and a short end-to-end Pendulum
run (the reference delegates SAC to GBRL_SB3; here it is in-repo)."""
import gymnasium as gym
import numpy as np
import pytest
import torch as th

from gbrl_tpu.rl.sac import (SAC, q_from_params, q_param_dim,
                             squashed_gaussian_sample)


def test_q_forms_analytic():
    rng = np.random.default_rng(0)
    N, A = 17, 3
    w = th.as_tensor(rng.normal(size=(N, A)).astype(np.float32))
    a = th.as_tensor(rng.normal(size=(N, A)).astype(np.float32))
    b2 = th.as_tensor(rng.normal(size=(N, 2)).astype(np.float32))
    b1 = b2[:, :1]
    s = (w * a).sum(-1)
    assert th.allclose(q_from_params(w, b1, a, "linear"), s + b1[:, 0])
    assert th.allclose(q_from_params(w, b2, a, "quadratic"),
                       -((s - b2[:, 0]) ** 2) + b2[:, 1])
    assert th.allclose(q_from_params(w, b1, a, "tanh"),
                       b1[:, 0] * th.tanh(s))
    assert q_param_dim("linear", A) == A + 1
    assert q_param_dim("quadratic", A) == A + 2
    assert q_param_dim("tanh", A) == A + 1


def test_squashed_logp_matches_torch_transformed():
    """Our tanh-corrected log-prob must match torch's
    TransformedDistribution (up to the numeric epsilon in the Jacobian)."""
    from torch.distributions import (Independent, Normal,
                                     TransformedDistribution)
    from torch.distributions.transforms import TanhTransform

    g = th.Generator().manual_seed(0)
    mu = th.randn((64, 2), generator=g)
    log_std = th.randn((64, 2), generator=g) * 0.3 - 0.5
    eps = th.randn((64, 2), generator=g)
    a, logp = squashed_gaussian_sample(mu, log_std, eps)
    ref = TransformedDistribution(
        Independent(Normal(mu, th.exp(log_std)), 1),
        [TanhTransform(cache_size=1)])
    u = mu + th.exp(log_std) * eps
    ref_logp = ref.log_prob(th.tanh(u))
    assert th.allclose(logp, ref_logp, atol=2e-3), \
        float((logp - ref_logp).abs().max())
    assert (a.abs() < 1.0).all()


class _BanditEnv(gym.Env):
    """One-step continuous bandit.

    ``monotone=False``: r = -(a - tanh(2*s_0))^2 — interior optimum
    mu(s) = tanh(2*s_0) (representable by the linear/quadratic Q-forms).
    ``monotone=True``: r = a * tanh(2*s_0) — boundary optimum
    a = sign(s_0) (the tanh Q-form is monotone in <w, a>, so it can only
    represent monotone reward surfaces)."""

    def __init__(self, monotone: bool = False):
        self.observation_space = gym.spaces.Box(-1, 1, (2,), np.float32)
        self.action_space = gym.spaces.Box(-1, 1, (1,), np.float32)
        self.monotone = monotone
        self._rng = np.random.default_rng(0)

    def reset(self, *, seed=None, options=None):
        if seed is not None:
            self._rng = np.random.default_rng(seed)
        self._obs = self._rng.uniform(-1, 1, 2).astype(np.float32)
        return self._obs, {}

    def step(self, action):
        target = np.tanh(2.0 * self._obs[0])
        if self.monotone:
            r = float(action[0] * target)
        else:
            r = -float((action[0] - target) ** 2)
        obs, _ = self.reset()
        return obs, r, True, False, {}


@pytest.mark.parametrize("q_func_type,jit_train", [
    ("linear", True), ("linear", False),
    ("quadratic", True), ("tanh", True)])
def test_sac_bandit_improves(q_func_type, jit_train):
    monotone = q_func_type == "tanh"
    env = gym.vector.SyncVectorEnv(
        [lambda: _BanditEnv(monotone=monotone)] * 8)
    algo = SAC(env, q_func_type=q_func_type, jit_train=jit_train,
               tree_struct=dict(max_depth=3, n_bins=32, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"),
               actor_lr=0.1, critic_lr=0.1, batch_size=256,
               learning_starts=256, train_freq=1, target_update_interval=10,
               log_std_init=-0.7, device="cpu")
    algo.learn(total_timesteps=4000, seed=0)
    env.close()
    assert algo.actor.get_num_trees() > 0
    assert all(c.learner.get_num_trees() > 0 for c in algo.critics)
    n = len(algo.episode_rewards)
    early = np.mean(algo.episode_rewards[: n // 4])
    late = np.mean(algo.episode_rewards[-n // 4:])
    if monotone:
        # random play averages ~0; the boundary policy averages ~0.76
        assert late > early + 0.2, f"no improvement: {early} -> {late}"
    else:
        # rewards are <= 0; late mean must at least halve the regret
        assert late > early * 0.5, f"no improvement: {early} -> {late}"
    assert np.isfinite(algo.alpha)


def test_sac_pendulum_runs():
    env = gym.vector.SyncVectorEnv([lambda: gym.make("Pendulum-v1")] * 4)
    algo = SAC(env, tree_struct=dict(max_depth=3, n_bins=32,
                                     min_data_in_leaf=0, par_th=2,
                                     grow_policy="oblivious"),
               learning_starts=200, batch_size=128, train_freq=8,
               device="cpu")
    algo.learn(total_timesteps=1500, seed=0)
    env.close()
    assert algo.actor.get_num_trees() > 0
    assert np.isfinite(algo.mean_reward())
    # action rescaling must respect the env bounds ([-2, 2] for Pendulum)
    g = th.Generator().manual_seed(0)
    obs = np.zeros((4, algo.obs_dim), dtype=np.float32)
    a_env = algo._env_action(algo._act(obs, g))
    assert (np.abs(a_env) <= 2.0 + 1e-6).all()


def test_nstep_accumulator_returns_and_boundaries():
    """NStepAccumulator: steady-state k=n windows with gamma^i-discounted
    reward sums; terminations flush everything with done=1; truncations
    flush with done=0 (bootstrap through the final observation)."""
    from gbrl_tpu.rl.buffers import NStepAccumulator
    g, n = 0.9, 3
    acc = NStepAccumulator(n_envs=1, n_step=n, gamma=g)
    obs = [np.float32([t]) for t in range(10)]
    rews = [1.0, 2.0, 3.0, 4.0, 5.0]
    out = []
    for t in range(4):
        out += acc.add(0, obs[t], np.float32([0.1 * t]), rews[t],
                       obs[t + 1], False, False)
    # first window matures at t=2: R = r0 + g*r1 + g^2*r2, next = obs[3]
    assert len(out) == 2
    s, a, R, nxt, done, disc = out[0]
    assert np.allclose(R, 1.0 + g * 2.0 + g * g * 3.0)
    assert np.allclose(nxt, obs[3]) and done == 0.0
    assert np.allclose(disc, g ** n)
    assert np.allclose(out[1][2], 2.0 + g * 3.0 + g * g * 4.0)

    # termination flushes the two pending windows with done=1
    out_t = acc.add(0, obs[4], np.float32([0.0]), rews[4], obs[5],
                    True, False)
    assert len(out_t) == 3 and all(e[4] == 1.0 for e in out_t)
    assert np.allclose(out_t[0][2], 3.0 + g * 4.0 + g * g * 5.0)
    assert np.allclose(out_t[-1][2], 5.0)          # 1-step remainder
    assert np.allclose(out_t[-1][5], g)            # disc = gamma^1
    assert acc._pend[0] == []

    # truncation flushes with done=0 so targets bootstrap
    out0 = acc.add(0, obs[5], np.float32([0.0]), 7.0, obs[6], False, True)
    assert len(out0) == 1 and out0[0][4] == 0.0
    assert np.allclose(out0[0][2], 7.0) and np.allclose(out0[0][5], g)


def test_nstep_1_matches_plain_transitions():
    from gbrl_tpu.rl.buffers import NStepAccumulator
    acc = NStepAccumulator(n_envs=1, n_step=1, gamma=0.99)
    o0, o1 = np.float32([0.0]), np.float32([1.0])
    out = acc.add(0, o0, np.float32([0.5]), 2.0, o1, False, False)
    assert len(out) == 1
    s, a, R, nxt, done, disc = out[0]
    assert R == 2.0 and done == 0.0 and np.allclose(disc, 0.99)
