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

    # ----------------------------------------------------------- host mirror
    def _get_mirrors(self):
        """Host-resident ensemble mirrors (utils/host_mirror.py) serving
        per-env-step actor forwards and critic bootstrap values in
        microseconds instead of a device round trip per step."""
        if not hasattr(self, "_mirrors"):
            from ..utils.host_mirror import HostMirror
            alr, clr = self.actor.learner, self.critic.learner
            ok = (all(s.algo == "SGD" for s in alr.specs)
                  and all(s.algo == "SGD" for s in clr.specs)
                  and alr.vocab is None)
            self._mirrors = (HostMirror(alr), HostMirror(clr)) if ok else None
        return self._mirrors

    def _sync_mirrors(self):
        m = self._get_mirrors()
        if m:
            m[0].sync()
            m[1].sync()

    def _act(self, obs: np.ndarray, rng):
        m = self._get_mirrors()
        if m:
            # numpy sampling: torch per-op overhead dominates tiny rollout
            # batches (see rl/ppo.py _sample_np)
            theta = m[0].predict(np.asarray(obs, dtype=np.float32))
            A = self.act_dim
            mu, log_std = theta[:, :A], theta[:, A:]
            return mu + np.exp(log_std) * rng.standard_normal(
                mu.shape).astype(np.float32)
        mu, log_std = self.actor(obs, requires_grad=False)
        std = th.exp(log_std)
        dist = Normal(mu, std)
        a = dist.sample()
        return a.numpy()

    def _values(self, obs: np.ndarray) -> np.ndarray:
        m = self._get_mirrors()
        if m:
            return m[1].predict(np.asarray(obs, dtype=np.float32)).reshape(-1)
        return np.asarray(self.critic(obs, requires_grad=False,
                                      tensor=False)).reshape(-1)

    def _rollout(self, obs, rng):
        """Collect n_steps transitions under gymnasium >=1.0 NextStep
        autoreset semantics: the observation returned WITH a done flag is
        the episode's FINAL observation (used to bootstrap truncations),
        and the following step() call resets that env ignoring the action —
        that row is recorded with valid=0 and excluded from training."""
        E = self.n_envs
        O, A, R, Term, Trunc, FinalV, Valid = [], [], [], [], [], [], []
        prev_done = self._prev_done
        for _ in range(self.n_steps // E):
            a = self._act(obs, rng)
            low = self.env.single_action_space.low
            high = self.env.single_action_space.high
            a_clip = np.clip(a, low, high)
            next_obs, rew, term, trunc, _ = self.env.step(a_clip)
            done = np.logical_or(term, trunc)
            # truncated episodes bootstrap from the final observation
            # (which IS next_obs under NextStep autoreset)
            fv = np.zeros(E, dtype=np.float32)
            tr_only = np.logical_and(trunc, ~term)
            if tr_only.any():
                fv[tr_only] = self._values(next_obs[tr_only])
            O.append(obs); A.append(a_clip); R.append(rew)
            Term.append(term.astype(np.float32))
            Trunc.append(trunc.astype(np.float32))
            FinalV.append(fv)
            Valid.append(1.0 - prev_done.astype(np.float32))
            rew_eff = np.where(prev_done, 0.0, rew)
            self._ep_ret += rew_eff
            for i in range(E):
                if done[i] and not prev_done[i]:
                    self.episode_rewards.append(self._ep_ret[i])
                    self._ep_ret[i] = 0.0
            prev_done = done
            obs = next_obs
        self._prev_done = prev_done
        return (np.asarray(O, dtype=np.float32), np.asarray(A, np.float32),
                np.asarray(R, np.float32), np.asarray(Term, np.float32),
                np.asarray(Trunc, np.float32),
                np.asarray(FinalV, np.float32),
                np.asarray(Valid, np.float32), obs)

    def _td_lambda(self, O, R, Term, Trunc, FinalV, last_obs):
        """TD(lambda) advantages + targets (AWR paper section 4 / GAE):
        delta_t = r_t + gamma * V(s_{t+1}) * cont - V(s_t);
        adv = GAE(lambda); target = adv + V(s_t).

        Terminations cut the chain; truncations bootstrap with
        V(final_obs) (time-limit-aware, under NextStep autoreset the final
        observation is the obs delivered with the done flag).  lambda < 1
        is what makes AWR workable here: the lambda=1 MC-return-minus-V
        advantage is dominated by critic error (~episode-return scale)
        rather than per-action signal, and the exponential weights then
        rank samples by critic noise."""
        T, E = R.shape
        v = self._values(O.reshape(T * E, -1)).reshape(T, E)
        v_next = np.empty_like(v)
        v_next[:-1] = v[1:]
        v_next[-1] = self._values(last_obs)
        adv = np.zeros_like(R)
        gae = np.zeros(E, dtype=np.float32)
        for t in reversed(range(T)):
            done = np.maximum(Term[t], Trunc[t])
            boot = (1.0 - done) * v_next[t] + Trunc[t] * (1 - Term[t]) \
                * FinalV[t]
            delta = R[t] + self.gamma * boot - v[t]
            gae = delta + self.gamma * self.gae_lambda * (1.0 - done) * gae
            adv[t] = gae
        return adv, adv + v

    def learn(self, total_timesteps: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        obs, _ = self.env.reset(seed=seed)
        self._prev_done = np.zeros(self.n_envs, dtype=bool)
        self.curve = []
        # preallocate capacity for the whole run (avoids jit recompiles of
        # the donated update loop at every power-of-two capacity crossing)
        from ..ensemble import ensure_capacity
        iters_planned = -(-total_timesteps // self.n_steps)
        for model, per_iter in ((self.actor, self.actor_updates),
                                (self.critic, self.critic_updates)):
            lr = model.learner
            lr.ens = ensure_capacity(
                lr.ens, int(lr.ens.n_trees) + iters_planned * per_iter)
        steps, it = 0, 0
        while steps < total_timesteps:
            O, A, R, Term, Trunc, FinalV, Valid, obs = self._rollout(obs, rng)
            adv, ret = self._td_lambda(O, R, Term, Trunc, FinalV, obs)
            keep = Valid.reshape(-1) > 0.5
            flat_obs = O.reshape(len(keep), -1)[keep]
            flat_act = A.reshape(len(keep), -1)[keep]
            flat_ret = ret.reshape(-1)[keep]
            flat_adv = adv.reshape(-1)[keep]
            self._replay.append((flat_obs, flat_act, flat_ret, flat_adv))
            total = sum(len(x[0]) for x in self._replay)
            while total > self.buffer_size and len(self._replay) > 1:
                total -= len(self._replay.pop(0)[0])
            r_obs = np.concatenate([x[0] for x in self._replay])
            r_act = np.concatenate([x[1] for x in self._replay])
            r_ret = np.concatenate([x[2] for x in self._replay])
            r_adv = np.concatenate([x[3] for x in self._replay])

            if self.jit_update and self.actor.learner.vocab is None:
                # fused device loop: all critic + actor boosting steps of
                # this iteration in one jit call (rl/jit_awr.py)
                from .jit_awr import run_awr_update
                run_awr_update(self, r_obs, r_act, r_ret, rng, r_adv)
                self._sync_mirrors()
                steps += self.n_steps
                it += 1
                self.curve.append(dict(
                    steps=steps, mean_reward_100=self.mean_reward(),
                    trees=self.actor.get_num_trees()))
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
                adv = r_adv[mb]
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
                w = np.exp(np.minimum(adv / self.beta,
                                      np.log(self.max_weight)))
                mu, log_std = self.actor(r_obs[mb], requires_grad=True)
                dist = Normal(mu, th.exp(log_std))
                logp = dist.log_prob(th.as_tensor(r_act[mb])).sum(-1)
                loss = -(th.as_tensor(w, dtype=th.float32) * logp).mean()
                loss.backward()
                self.actor.step()

            self._sync_mirrors()
            steps += self.n_steps
            it += 1
            self.curve.append(dict(
                steps=steps, mean_reward_100=self.mean_reward(),
                trees=self.actor.get_num_trees()))
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
