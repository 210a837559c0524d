"""AWR (Advantage-Weighted Regression) with GBT actor and critic
(BASELINE config 5: continuous control with a GaussianActor + value critic,
feature weights supported, data-parallel over the mesh for large batches).

AWR (Peng et al. 2019): critic regresses returns; actor maximizes
log pi(a|s) * exp(A / beta) over replayed experience.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import torch as th
from torch.distributions import Normal

from ..models.actor import GaussianActor
from ..models.gbt import GBTModel


class AWR:
    def __init__(self, env, tree_struct: Dict = None, params: Dict = None,
                 actor_lr: float = 0.05, critic_lr: float = 0.5,
                 beta: float = 1.0, max_weight: float = 20.0,
                 n_steps: int = 2048, gamma: float = 0.99,
                 gae_lambda: float = 0.95,
                 actor_updates: int = 10, critic_updates: int = 10,
                 batch_size: int = 512, buffer_size: int = 50000,
                 log_std_init: float = -0.5,
                 feature_weights=None,
                 log_interval: int = 0, device: str = "tpu",
                 jit_update: bool = True):
        self.env = env
        self.n_envs = env.num_envs
        obs_dim = int(np.prod(env.single_observation_space.shape))
        act_dim = int(np.prod(env.single_action_space.shape))
        self.obs_dim, self.act_dim = obs_dim, act_dim
        tree_struct = dict(tree_struct or dict(
            max_depth=4, n_bins=256, min_data_in_leaf=0, par_th=2,
            grow_policy="oblivious"))
        params = dict(params or dict(split_score_func="cosine",
                                     generator_type="Quantile"))
        if feature_weights is not None:
            params["feature_weights"] = feature_weights
        self.actor = GaussianActor(
            tree_struct=tree_struct, input_dim=obs_dim, output_dim=2 * act_dim,
            mu_optimizer={"mu_algo": "SGD", "mu_lr": actor_lr,
                          "start_idx": 0, "stop_idx": act_dim},
            std_optimizer={"std_algo": "SGD", "std_lr": actor_lr * 0.1,
                           "start_idx": act_dim, "stop_idx": 2 * act_dim},
            log_std_init=log_std_init, params=params, device=device)
        self.critic = GBTModel(
            tree_struct=tree_struct, input_dim=obs_dim, output_dim=1,
            optimizers={"algo": "SGD", "lr": critic_lr, "start_idx": 0,
                        "stop_idx": 1}, params=params, device=device)
        self.beta = beta
        self.max_weight = max_weight
        self.n_steps = n_steps
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self.actor_updates = actor_updates
        self.critic_updates = critic_updates
        self.batch_size = batch_size
        self.buffer_size = buffer_size
        self.log_interval = log_interval
        self.jit_update = jit_update
        self.episode_rewards = []
        self._ep_ret = np.zeros(self.n_envs, dtype=np.float64)
        self._replay = []   # list of (obs, act, ret) batches

    def _act(self, obs: np.ndarray, rng):
        mu, log_std = self.actor(obs, requires_grad=False)
        std = th.exp(log_std)
        dist = Normal(mu, std)
        a = dist.sample()
        return a.numpy()

    def _rollout(self, obs, rng):
        O, A, R, D = [], [], [], []
        for _ in range(self.n_steps // self.n_envs):
            a = self._act(obs, rng)
            low = self.env.single_action_space.low
            high = self.env.single_action_space.high
            a_clip = np.clip(a, low, high)
            next_obs, rew, term, trunc, _ = self.env.step(a_clip)
            done = np.logical_or(term, trunc)
            # replay the EXECUTED (clipped) actions (AWR regresses onto them)
            O.append(obs); A.append(a_clip); R.append(rew)
            D.append(done.astype(np.float32))
            self._ep_ret += rew
            for i in range(self.n_envs):
                if done[i]:
                    self.episode_rewards.append(self._ep_ret[i])
                    self._ep_ret[i] = 0.0
            obs = next_obs
        return (np.asarray(O, dtype=np.float32), np.asarray(A, np.float32),
                np.asarray(R, np.float32), np.asarray(D, np.float32), obs)

    def _monte_carlo_returns(self, R, D, last_obs):
        """TD(lambda)-style bootstrapped returns using the current critic."""
        T = R.shape[0]
        v_last = np.asarray(
            self.critic(last_obs, requires_grad=False, tensor=False)
        ).reshape(-1)
        ret = np.zeros_like(R)
        running = v_last
        for t in reversed(range(T)):
            running = R[t] + self.gamma * (1.0 - D[t]) * running
            ret[t] = running
        return ret

    def learn(self, total_timesteps: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        obs, _ = self.env.reset(seed=seed)
        steps, it = 0, 0
        while steps < total_timesteps:
            O, A, R, D, obs = self._rollout(obs, rng)
            ret = self._monte_carlo_returns(R, D, obs)
            n = O.shape[0] * O.shape[1]
            flat_obs = O.reshape(n, -1)
            flat_act = A.reshape(n, -1)
            flat_ret = ret.reshape(n)
            self._replay.append((flat_obs, flat_act, flat_ret))
            total = sum(len(x[0]) for x in self._replay)
            while total > self.buffer_size and len(self._replay) > 1:
                total -= len(self._replay.pop(0)[0])
            r_obs = np.concatenate([x[0] for x in self._replay])
            r_act = np.concatenate([x[1] for x in self._replay])
            r_ret = np.concatenate([x[2] for x in self._replay])

            if self.jit_update and self.actor.learner.vocab is None:
                # fused device loop: all critic + actor boosting steps of
                # this iteration in one jit call (rl/jit_awr.py)
                from .jit_awr import run_awr_update
                run_awr_update(self, r_obs, r_act, r_ret, rng)
                steps += self.n_steps
                it += 1
                if self.log_interval and it % self.log_interval == 0:
                    mean100 = (np.mean(self.episode_rewards[-100:])
                               if self.episode_rewards else float("nan"))
                    print(f"iter {it} steps {steps} actor_trees "
                          f"{self.actor.get_num_trees()} "
                          f"ep_rew_mean {mean100:.1f}")
                continue

            # critic updates: one tree per minibatch regression step
            for _ in range(self.critic_updates):
                mb = rng.integers(0, len(r_obs), self.batch_size)
                v = self.critic(r_obs[mb], requires_grad=True)
                loss = 0.5 * ((v - th.as_tensor(r_ret[mb])) ** 2).mean()
                loss.backward()
                self.critic.step()

            # actor updates: advantage-weighted log-prob regression with
            # batch-standardized advantages (raw return scales saturate the
            # exponential weights otherwise)
            for _ in range(self.actor_updates):
                mb = rng.integers(0, len(r_obs), self.batch_size)
                v = np.asarray(self.critic(r_obs[mb], requires_grad=False,
                                           tensor=False)).reshape(-1)
                adv = r_ret[mb] - v
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
                w = np.exp(np.minimum(adv / self.beta,
                                      np.log(self.max_weight)))
                mu, log_std = self.actor(r_obs[mb], requires_grad=True)
                dist = Normal(mu, th.exp(log_std))
                logp = dist.log_prob(th.as_tensor(r_act[mb])).sum(-1)
                loss = -(th.as_tensor(w, dtype=th.float32) * logp).mean()
                loss.backward()
                self.actor.step()

            steps += self.n_steps
            it += 1
            if self.log_interval and it % self.log_interval == 0:
                mean100 = (np.mean(self.episode_rewards[-100:])
                           if self.episode_rewards else float("nan"))
                print(f"iter {it} steps {steps} actor_trees "
                      f"{self.actor.get_num_trees()} ep_rew_mean {mean100:.1f}")
        return self

    def mean_reward(self, last: int = 100) -> float:
        if not self.episode_rewards:
            return float("nan")
        return float(np.mean(self.episode_rewards[-last:]))
