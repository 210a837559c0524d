"""Rollout storage with GAE(lambda) advantage estimation.

The reference delegates RL plumbing to the companion repo GBRL_SB3
(README.md:19) built on stable-baselines3; this is a self-contained
equivalent so the framework ships runnable PPO/A2C/AWR out of the box.
"""
from __future__ import annotations

import numpy as np


class RolloutBuffer:
    def __init__(self, n_steps: int, n_envs: int, obs_dim: int,
                 gamma: float = 0.99, gae_lambda: float = 0.95):
        self.n_steps = n_steps
        self.n_envs = n_envs
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self.obs = np.zeros((n_steps, n_envs, obs_dim), dtype=np.float32)
        self.actions = np.zeros((n_steps, n_envs), dtype=np.int64)
        self.cont_actions = None
        self.rewards = np.zeros((n_steps, n_envs), dtype=np.float32)
        self.dones = np.zeros((n_steps, n_envs), dtype=np.float32)
        self.values = np.zeros((n_steps, n_envs), dtype=np.float32)
        self.log_probs = np.zeros((n_steps, n_envs), dtype=np.float32)
        self.pos = 0

    def add(self, obs, action, reward, done, value, log_prob):
        t = self.pos
        self.obs[t] = obs
        if action.dtype.kind == "f":
            if self.cont_actions is None:
                self.cont_actions = np.zeros(
                    (self.n_steps, self.n_envs) + action.shape[1:],
                    dtype=np.float32)
            self.cont_actions[t] = action
        else:
            self.actions[t] = action
        self.rewards[t] = reward
        self.dones[t] = done
        self.values[t] = value
        self.log_probs[t] = log_prob
        self.pos += 1

    def compute_returns(self, last_values: np.ndarray,
                        last_dones: np.ndarray):
        """GAE(lambda): delta_t = r_t + gamma*V(s_{t+1})*(1-d_t) - V(s_t)."""
        adv = np.zeros_like(self.rewards)
        gae = np.zeros(self.n_envs, dtype=np.float32)
        next_value = last_values
        next_nonterminal = 1.0 - last_dones
        for t in reversed(range(self.n_steps)):
            delta = (self.rewards[t] + self.gamma * next_value
                     * next_nonterminal - self.values[t])
            gae = delta + self.gamma * self.gae_lambda * next_nonterminal * gae
            adv[t] = gae
            next_value = self.values[t]
            next_nonterminal = 1.0 - self.dones[t]
        self.advantages = adv
        self.returns = adv + self.values
        self.pos = 0

    def flat(self, continuous: bool = False):
        """Flattened rollout + a ``valid`` mask: rows where the env
        auto-reset this step (gymnasium >=1.0 NextStep semantics: the
        stored done flag marks the episode boundary BEFORE the row, the
        action was ignored and the reward is 0) carry valid = 0 and must
        not contribute to updates."""
        n = self.n_steps * self.n_envs
        acts = (self.cont_actions.reshape(n, -1) if continuous
                else self.actions.reshape(n))
        return (self.obs.reshape(n, -1), acts,
                self.log_probs.reshape(n), self.advantages.reshape(n),
                self.returns.reshape(n), self.values.reshape(n),
                1.0 - self.dones.reshape(n))


class ReplayBuffer:
    """Uniform off-policy ring buffer (for SAC)."""

    def __init__(self, capacity: int, obs_dim: int, act_dim: int):
        self.capacity = capacity
        self.obs = np.zeros((capacity, obs_dim), dtype=np.float32)
        self.actions = np.zeros((capacity, act_dim), dtype=np.float32)
        self.rewards = np.zeros(capacity, dtype=np.float32)
        self.next_obs = np.zeros((capacity, obs_dim), dtype=np.float32)
        self.dones = np.zeros(capacity, dtype=np.float32)
        self.pos = 0
        self.full = False

    def __len__(self) -> int:
        return self.capacity if self.full else self.pos

    def add(self, obs, action, reward, next_obs, done):
        """Add a batch of [n_envs, ...] transitions."""
        n = len(obs)
        idx = (self.pos + np.arange(n)) % self.capacity
        self.obs[idx] = obs.reshape(n, -1)
        self.actions[idx] = action.reshape(n, -1)
        self.rewards[idx] = reward
        self.next_obs[idx] = next_obs.reshape(n, -1)
        self.dones[idx] = done
        self.pos += n
        if self.pos >= self.capacity:
            self.full = True
            self.pos %= self.capacity

    def sample(self, batch_size: int, rng):
        idx = rng.integers(0, len(self), batch_size)
        return (self.obs[idx], self.actions[idx], self.rewards[idx],
                self.next_obs[idx], self.dones[idx])
