"""Parity of the device-resident PPO update loop vs the torch facade path:
same rollout + same rng => same trees (up to f32 summation order)."""
from types import SimpleNamespace

import gymnasium as gym
import numpy as np
import pytest

from gbrl_tpu.rl.buffers import RolloutBuffer
from gbrl_tpu.rl.ppo import PPO


def _fake_env(obs_dim=4, n_actions=3, n_envs=8):
    return SimpleNamespace(
        num_envs=n_envs,
        single_observation_space=gym.spaces.Box(-1, 1, (obs_dim,),
                                                np.float32),
        single_action_space=gym.spaces.Discrete(n_actions))


def _make_ppo(jit_update: bool, **kw):
    env = _fake_env()
    return PPO(env, tree_struct=dict(max_depth=3, n_bins=16,
                                     min_data_in_leaf=0, par_th=2,
                                     grow_policy=kw.pop("grow_policy",
                                                        "oblivious")),
               n_steps=32, batch_size=64, n_epochs=2,
               policy_lr=0.1, value_lr=0.05, device="cpu",
               jit_update=jit_update, **kw)


def _synthetic_buffer(ppo, seed=0):
    rng = np.random.default_rng(seed)
    T, E = ppo.n_steps, ppo.n_envs
    buf = RolloutBuffer(T, E, ppo.obs_dim)
    buf.obs = rng.normal(size=(T, E, ppo.obs_dim)).astype(np.float32)
    buf.actions = rng.integers(0, ppo.n_actions, (T, E)).astype(np.int64)
    buf.rewards = rng.normal(size=(T, E)).astype(np.float32)
    buf.dones = np.zeros((T, E), np.float32)
    buf.values = rng.normal(size=(T, E)).astype(np.float32)
    buf.log_probs = (-np.log(ppo.n_actions)
                     * np.ones((T, E), np.float32))
    buf.advantages = rng.normal(size=(T, E)).astype(np.float32)
    buf.returns = buf.advantages + buf.values
    return buf


@pytest.mark.parametrize("grow_policy", ["oblivious", "greedy"])
def test_jit_update_matches_torch_path(grow_policy):
    ppo_a = _make_ppo(True, grow_policy=grow_policy)
    ppo_b = _make_ppo(False, grow_policy=grow_policy)
    assert ppo_a._can_jit_update()
    buf = _synthetic_buffer(ppo_a)

    ppo_a.update(buf, np.random.default_rng(7))
    buf_b = _synthetic_buffer(ppo_b)
    ppo_b.update(buf_b, np.random.default_rng(7))

    na = ppo_a.model.get_num_trees()
    nb = ppo_b.model.get_num_trees()
    assert na == nb == 2 * (32 * 8 // 64)

    probe = np.random.default_rng(1).normal(
        size=(128, ppo_a.obs_dim)).astype(np.float32)
    pa, va = ppo_a.model(probe, requires_grad=False, tensor=False)
    pb, vb = ppo_b.model(probe, requires_grad=False, tensor=False)
    # greedy argmax can flip a near-tied split from f32-level gradient
    # differences (jax softmax-grad vs torch Categorical backward); the
    # resulting predictions still agree to ~1e-4
    tol = dict(rtol=2e-4, atol=2e-5) if grow_policy == "oblivious" \
        else dict(rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), **tol)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), **tol)


def test_jit_update_partial_minibatch_masked():
    """n not divisible by batch_size: the padded tail minibatch must not
    perturb results vs the facade path's short minibatches."""
    env = _fake_env(n_envs=5)          # 32*5 = 160 = 64+64+32
    kw = dict(tree_struct=dict(max_depth=2, n_bins=8, min_data_in_leaf=0,
                               par_th=2, grow_policy="oblivious"),
              n_steps=32, batch_size=64, n_epochs=1,
              policy_lr=0.1, value_lr=0.05, device="cpu")
    ppo_a = PPO(_fake_env(n_envs=5), jit_update=True, **kw)
    ppo_b = PPO(_fake_env(n_envs=5), jit_update=False, **kw)
    rng = np.random.default_rng(3)
    T, E = 32, 5
    for ppo in (ppo_a, ppo_b):
        buf = RolloutBuffer(T, E, ppo.obs_dim)
        r = np.random.default_rng(11)
        buf.obs = r.normal(size=(T, E, ppo.obs_dim)).astype(np.float32)
        buf.actions = r.integers(0, ppo.n_actions, (T, E)).astype(np.int64)
        buf.log_probs = np.full((T, E), -1.1, np.float32)
        buf.advantages = r.normal(size=(T, E)).astype(np.float32)
        buf.values = r.normal(size=(T, E)).astype(np.float32)
        buf.returns = buf.advantages + buf.values
        ppo.update(buf, np.random.default_rng(5))
    assert ppo_a.model.get_num_trees() == ppo_b.model.get_num_trees() == 3
    probe = np.random.default_rng(2).normal(
        size=(64, ppo_a.obs_dim)).astype(np.float32)
    pa, _ = ppo_a.model(probe, requires_grad=False, tensor=False)
    pb, _ = ppo_b.model(probe, requires_grad=False, tensor=False)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                               rtol=2e-4, atol=2e-5)


def test_jit_ppo_cartpole_learns():
    """End-to-end: the jitted update must actually learn CartPole."""
    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * 8)
    algo = PPO(env, n_steps=64, batch_size=256, n_epochs=4,
               policy_lr=0.17, value_lr=0.01, device="cpu",
               jit_update=True)
    assert algo._can_jit_update()
    algo.learn(total_timesteps=15000, seed=0)
    env.close()
    assert algo.model.get_num_trees() == 240
    r = algo.mean_reward()
    assert r > 55, f"jit-PPO CartPole mean reward {r} <= 55"


def test_ppo_env_groups_pipelined_learns():
    """Pipelined multi-group rollout: same on-policy semantics, same
    learning behavior; buffers from all groups merge into the update."""
    groups = [gym.vector.SyncVectorEnv(
        [lambda: gym.make("CartPole-v1")] * 4) for _ in range(2)]
    algo = PPO(groups, n_steps=64, batch_size=256, n_epochs=4,
               policy_lr=0.17, value_lr=0.01, device="cpu")
    algo.learn(total_timesteps=15000, seed=0)
    for g in groups:
        g.close()
    assert algo.model.get_num_trees() > 0
    r = algo.mean_reward()
    assert r > 55, f"grouped PPO mean reward {r} <= 55"
