// Reference-backed A2C on CartPole-v1: drives the UNMODIFIED reference C++
// core (mounted read-only) through the same A2C algorithm and hyperparameters
// as gbrl_tpu.rl.A2C — BASELINE config 4's algorithm (A2C + Adam leaf
// optimizer + control variates), on the CartPole harness from ppo_ref.cpp so
// both sides are driven by identical env physics and budgets (the VERDICT
// criterion is curve parity within seed variance, not absolute score).
//
// One boosting tree per rollout (n_steps x n_envs rows), policy columns under
// Adam(Const), value column under SGD(Const), oblivious trees + cosine +
// quantile, control variates enabled (fitter.cpp:585-633).
//
// Usage: a2c_ref <total_steps> <seed> <out.json>
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <deque>
#include <random>
#include <string>
#include <vector>

#include "gbrl.h"
#include "types.h"

struct CartPole {
    static constexpr float gravity = 9.8f, masscart = 1.0f, masspole = 0.1f;
    static constexpr float total_mass = masspole + masscart;
    static constexpr float length = 0.5f;
    static constexpr float polemass_length = masspole * length;
    static constexpr float force_mag = 10.0f, tau = 0.02f;
    static constexpr float theta_thresh = 12.0f * 2.0f * (float)M_PI / 360.0f;
    static constexpr float x_thresh = 2.4f;

    float s[4];
    int t = 0;
    std::mt19937 rng;

    explicit CartPole(unsigned seed) : rng(seed) { reset(); }

    void reset() {
        std::uniform_real_distribution<float> u(-0.05f, 0.05f);
        for (int i = 0; i < 4; ++i) s[i] = u(rng);
        t = 0;
    }

    std::pair<float, bool> step(int action) {
        float x = s[0], x_dot = s[1], th = s[2], th_dot = s[3];
        float force = action == 1 ? force_mag : -force_mag;
        float costh = std::cos(th), sinth = std::sin(th);
        float temp = (force + polemass_length * th_dot * th_dot * sinth)
                     / total_mass;
        float thacc = (gravity * sinth - costh * temp)
                      / (length * (4.0f / 3.0f
                                   - masspole * costh * costh / total_mass));
        float xacc = temp - polemass_length * thacc * costh / total_mass;
        s[0] = x + tau * x_dot;
        s[1] = x_dot + tau * xacc;
        s[2] = th + tau * th_dot;
        s[3] = th_dot + tau * thacc;
        t += 1;
        bool terminated = s[0] < -x_thresh || s[0] > x_thresh
                          || s[2] < -theta_thresh || s[2] > theta_thresh;
        bool truncated = t >= 500;
        if (terminated || truncated) reset();
        return {1.0f, terminated || truncated};
    }
};

int main(int argc, char **argv) {
    const int total_steps = (argc > 1) ? atoi(argv[1]) : 300000;
    const unsigned seed = (argc > 2) ? (unsigned)atoi(argv[2]) : 0;
    const std::string out = (argc > 3) ? argv[3] : "results_a2c_ref.json";

    const int n_envs = 16, n_steps = 64;
    const int F = 4, A = 2, O = 3;
    const float gamma = 0.99f, lam = 0.95f;
    const float ent_coef = 0.01f, vf_coef = 0.5f;
    const float policy_lr = 0.05f, value_lr = 0.01f;
    const int R = n_steps * n_envs;

    GBRL model(F, O, A, /*max_depth=*/4, /*min_data_in_leaf=*/0,
               /*n_bins=*/256, /*par_th=*/2, /*cv_beta=*/0.9f,
               std::string("cosine"), std::string("Quantile"),
               /*use_control_variates=*/true, R,
               std::string("oblivious"), /*verbose=*/0, std::string("cpu"));
    model.set_optimizer(Adam, Const, policy_lr, 0, A, 1.0e-4f, 10000,
                        0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
    model.set_optimizer(SGD, Const, value_lr, A, O, 1.0e-4f, 10000,
                        0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
    std::vector<float> fw(F, 1.0f);
    dataHolder<float> fwh{fw.data(), cpu};
    model.set_feature_weights(&fwh, F);

    std::vector<CartPole> envs;
    for (int e = 0; e < n_envs; ++e) envs.emplace_back(seed + 1000 + e);
    std::mt19937 rng(seed);

    std::vector<float> obs_buf(R * F), rew(R), done(R), val(R);
    std::vector<int> act(R);
    std::vector<float> adv(R), ret(R), grads(R * O);
    std::vector<float> obs_now(n_envs * F), dones_now(n_envs, 0.0f);
    for (int e = 0; e < n_envs; ++e)
        for (int k = 0; k < F; ++k) obs_now[e * F + k] = envs[e].s[k];

    std::deque<double> ep_rewards;
    std::vector<double> ep_ret(n_envs, 0.0);
    std::vector<std::pair<long, double>> curve;

    auto predict_rows = [&](const float *rows, int n) {
        dataHolder<const float> o{rows, cpu};
        dataHolder<const char> c{nullptr, cpu};
        return model.predict(&o, &c, n, F, 0, 0, 0);
    };

    auto t0 = std::chrono::steady_clock::now();
    long steps = 0;
    int iter = 0;
    while (steps < total_steps) {
        for (int t = 0; t < n_steps; ++t) {
            float *preds = predict_rows(obs_now.data(), n_envs);
            for (int e = 0; e < n_envs; ++e) {
                const float *p = preds + e * O;
                float mx = std::max(p[0], p[1]);
                float e0 = std::exp(p[0] - mx), e1 = std::exp(p[1] - mx);
                float p1 = e1 / (e0 + e1);
                std::uniform_real_distribution<float> u(0.0f, 1.0f);
                int a = u(rng) < p1 ? 1 : 0;
                int row = t * n_envs + e;
                for (int k = 0; k < F; ++k)
                    obs_buf[row * F + k] = obs_now[e * F + k];
                act[row] = a;
                val[row] = p[2];
                done[row] = dones_now[e];
                auto [r, d] = envs[e].step(a);
                rew[row] = r;
                ep_ret[e] += r;
                if (d) {
                    ep_rewards.push_back(ep_ret[e]);
                    if (ep_rewards.size() > 100) ep_rewards.pop_front();
                    ep_ret[e] = 0.0;
                }
                dones_now[e] = d ? 1.0f : 0.0f;
                for (int k = 0; k < F; ++k) obs_now[e * F + k] = envs[e].s[k];
            }
            delete[] preds;
        }
        // bootstrap + GAE (matches rl/buffers.py:45-61)
        float *lastp = predict_rows(obs_now.data(), n_envs);
        std::vector<float> gae(n_envs, 0.0f), nv(n_envs), nnt(n_envs);
        for (int e = 0; e < n_envs; ++e) {
            nv[e] = lastp[e * O + 2];
            nnt[e] = 1.0f - dones_now[e];
        }
        delete[] lastp;
        for (int t = n_steps - 1; t >= 0; --t) {
            for (int e = 0; e < n_envs; ++e) {
                int row = t * n_envs + e;
                float delta = rew[row] + gamma * nv[e] * nnt[e] - val[row];
                gae[e] = delta + gamma * lam * nnt[e] * gae[e];
                adv[row] = gae[e];
                ret[row] = adv[row] + val[row];
                nv[e] = val[row];
                nnt[e] = 1.0f - done[row];
            }
        }
        // -------- A2C update: ONE tree on the whole rollout (rl/a2c.py)
        float *preds = predict_rows(obs_buf.data(), R);
        double m = 0.0, s2 = 0.0;
        for (int i = 0; i < R; ++i) m += adv[i];
        m /= R;
        for (int i = 0; i < R; ++i) {
            double d = adv[i] - m;
            s2 += d * d;
        }
        float sd = (float)std::sqrt(s2 / (R - 1)) + 1e-8f;  // torch unbiased
        for (int i = 0; i < R; ++i) {
            const float *p = preds + i * O;
            float mx = std::max(p[0], p[1]);
            float e0 = std::exp(p[0] - mx), e1 = std::exp(p[1] - mx);
            float z = e0 + e1;
            float sm[2] = {e0 / z, e1 / z};
            float a_n = (float)((adv[i] - m) / sd);
            float H = 0.0f;
            for (int j = 0; j < A; ++j)
                if (sm[j] > 0) H -= sm[j] * std::log(sm[j]);
            for (int j = 0; j < A; ++j) {
                float dlogp = (j == act[i] ? 1.0f : 0.0f) - sm[j];
                // -(adv*logp).mean  +  ent_coef * (-H).mean, per sample
                float g = -a_n * dlogp
                          + ent_coef * sm[j] * (std::log(std::max(sm[j],
                                                                  1e-12f))
                                                + H);
                grads[i * O + j] = g;
            }
            grads[i * O + A] = vf_coef * (p[2] - ret[i]);
        }
        delete[] preds;
        dataHolder<const float> o{obs_buf.data(), cpu};
        dataHolder<const char> c{nullptr, cpu};
        dataHolder<float> g{grads.data(), cpu};
        model.step(&o, &c, &g, R, F, 0);

        steps += (long)R;
        iter += 1;
        double mean100 = 0.0;
        for (double r : ep_rewards) mean100 += r;
        mean100 = ep_rewards.empty() ? 0.0 : mean100 / ep_rewards.size();
        curve.emplace_back(steps, mean100);
        if (iter % 25 == 0)
            fprintf(stderr, "iter %d steps %ld trees %d ep_rew_mean %.1f\n",
                    iter, steps, model.get_num_trees(), mean100);
    }
    auto t1 = std::chrono::steady_clock::now();
    double wall = std::chrono::duration<double>(t1 - t0).count();

    FILE *f = fopen(out.c_str(), "w");
    fprintf(f, "{\n \"config\": \"reference-C++ A2C shared-AC oblivious "
               "cosine d4 b256 Adam(0.05)/SGD(0.01) cv\",\n"
               " \"env\": \"CartPole-v1 (C++)\",\n"
               " \"seed\": %u,\n \"total_steps\": %d,\n \"wall_s\": %.1f,\n"
               " \"trees\": %d,\n \"curve\": [", seed, total_steps, wall,
            model.get_num_trees());
    for (size_t i = 0; i < curve.size(); ++i)
        fprintf(f, "%s[%ld, %.2f]", i ? ", " : "",
                curve[i].first, curve[i].second);
    fprintf(f, "]\n}\n");
    fclose(f);
    printf("done: steps=%d trees=%d mean100=%.1f wall=%.1fs\n", total_steps,
           model.get_num_trees(), curve.back().second, wall);
    return 0;
}
