"""RL algorithm tests (BASELINE configs 3-5, short-budget versions):
PPO with a shared policy/value tree learns CartPole; A2C with Adam +
control variates runs and improves; AWR drives a Gaussian actor + critic
on continuous control."""
import gymnasium as gym
import numpy as np
import pytest

from gbrl_tpu.rl.ppo import PPO
from gbrl_tpu.rl.a2c import A2C
from gbrl_tpu.rl.awr import AWR


def _cartpole(n=8):
    return gym.vector.SyncVectorEnv([lambda: gym.make("CartPole-v1")] * n)


def test_ppo_cartpole_learns():
    env = _cartpole()
    algo = PPO(env, n_steps=64, batch_size=256, n_epochs=4,
               policy_lr=0.17, value_lr=0.01, device="cpu")
    algo.learn(total_timesteps=15000, seed=0)
    env.close()
    assert algo.model.get_num_trees() == 240
    r = algo.mean_reward()
    assert r > 55, f"PPO CartPole mean reward {r} <= 55 after 15k steps"
    # learning trend: late third must beat the first third
    n = len(algo.episode_rewards)
    early = np.mean(algo.episode_rewards[: n // 3])
    late = np.mean(algo.episode_rewards[-n // 3:])
    assert late > early * 1.5


def test_a2c_adam_cv_runs_and_improves():
    env = _cartpole()
    algo = A2C(env, n_steps=32, policy_lr=0.3, value_lr=0.02,
               policy_algo="Adam", control_variates=True, device="cpu")
    algo.learn(total_timesteps=10000, seed=0)
    env.close()
    r = algo.mean_reward()
    assert np.isfinite(r)
    assert r > 30, f"A2C mean reward {r} <= 30"


def test_awr_pendulum_runs():
    env = gym.vector.SyncVectorEnv(
        [lambda: gym.make("Pendulum-v1")] * 4)
    algo = AWR(env, n_steps=512, actor_updates=4, critic_updates=4,
               batch_size=256, beta=0.5, device="cpu",
               tree_struct=dict(max_depth=3, n_bins=32, min_data_in_leaf=0,
                                par_th=2, grow_policy="oblivious"))
    algo.learn(total_timesteps=4096, seed=0)
    env.close()
    assert algo.actor.get_num_trees() > 0
    assert algo.critic.get_num_trees() > 0
    assert np.isfinite(algo.mean_reward())
