// Timing driver for the UNMODIFIED reference C++ core (mounted read-only at
// /root/reference) — measures the baseline trees-fit/s that bench.py's
// vs_baseline compares against (BASELINE.md: reference numbers must be
// measured by us).  Mirrors bench.py's workload: N=4096, F=16, O=3,
// greedy + cosine + quantile, depth 4, 256 bins, predict + step per iter.
#include <chrono>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include "gbrl.h"
#include "types.h"

int main(int argc, char **argv) {
    const int N = 4096, F = 16, O = 3;
    int iters = (argc > 1) ? atoi(argv[1]) : 100;
    const int warmup = 10;

    GBRL model(/*input_dim=*/F, /*output_dim=*/O, /*policy_dim=*/O - 1,
               /*max_depth=*/4, /*min_data_in_leaf=*/0,
               /*n_bins=*/256, /*par_th=*/10, /*cv_beta=*/0.9f,
               std::string("cosine"), std::string("Quantile"),
               /*use_control_variates=*/false, /*batch_size=*/5000,
               std::string("greedy"), /*verbose=*/0, std::string("cpu"));
    model.set_optimizer(SGD, Const, 0.1f, 0, O, 1.0e-4f, 10000,
                        0.9f, 0.999f, 1.0e-8f, 1.0e-5f);

    std::mt19937 g(0);
    std::normal_distribution<float> dist(0.f, 1.f);
    std::vector<float> X(N * F), y(N * O), grads(N * O);
    for (auto &v : X) v = dist(g);
    for (auto &v : y) v = dist(g);

    dataHolder<const float> obs{X.data(), cpu};
    dataHolder<const char> cat_obs{nullptr, cpu};
    dataHolder<float> grads_h{grads.data(), cpu};

    auto one_step = [&]() {
        float *preds = model.predict(&obs, &cat_obs, N, F, 0, 0, 0);
        for (int i = 0; i < N * O; ++i) grads[i] = preds[i] - y[i];
        delete[] preds;
        model.step(&obs, &cat_obs, &grads_h, N, F, 0);
    };

    for (int i = 0; i < warmup; ++i) one_step();
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < iters; ++i) one_step();
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();
    printf("{\"trees_fit_per_s\": %.3f, \"device\": \"cpu-openmp\", \"iters\": %d}\n",
           iters / dt, iters);
    return 0;
}
