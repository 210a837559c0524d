// Supervised-fit golden generator: runs the UNMODIFIED reference core's
// multi-iteration GBRL::fit (gbrl.cpp:983-1104 -> fitter.cpp:117-261) with
// shuffle=false on fixed data, for the two BASELINE.json supervised configs:
//   A: single-output  MultiRMSE, oblivious + L2     + SGD(Const),  quantile
//   B: multi-output   MultiRMSE, greedy   + cosine  + SGD(Linear+Const), quantile
// Dumps X, targets, per-iteration batch losses (the verbose prints routed to
// a file), final full-data loss, and final predictions, so a pytest can
// verify this framework's fit_loop reproduces the reference head-to-head.
#include <cstdio>
#include <fstream>
#include <iomanip>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "gbrl.h"
#include "types.h"

static void dump_mat(const std::string &path, const float *m, int n, int o) {
    FILE *f = fopen(path.c_str(), "w");
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < o; ++j) fprintf(f, "%.9g ", m[i * o + j]);
        fprintf(f, "\n");
    }
    fclose(f);
}

int main(int argc, char **argv) {
    std::string outdir = (argc > 1) ? argv[1] : ".";
    const int N = 512, F = 8, ITERS = 60, BS = 200;

    std::mt19937 g(42);
    std::normal_distribution<float> dist(0.f, 1.f);
    std::vector<float> X(N * F);
    for (auto &v : X) v = dist(g);
    dump_mat(outdir + "/fit_X.txt", X.data(), N, F);

    // ---- config A: O=1, oblivious + L2 + SGD Const ----
    {
        const int O = 1;
        std::vector<float> y(N * O);
        for (int i = 0; i < N; ++i)
            y[i] = std::sin(X[i * F]) + 0.5f * X[i * F + 1] * X[i * F + 2]
                   + 0.1f * dist(g);
        dump_mat(outdir + "/fit_yA.txt", y.data(), N, O);

        GBRL model(F, O, 0, 4, 0, 16, 10, 0.9f,
                   std::string("L2"), std::string("Quantile"), false,
                   BS, std::string("oblivious"), 1, std::string("cpu"));
        model.set_optimizer(SGD, Const, 0.1f, 0, 1, 1.0e-4f, 10000,
                            0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
        // the Python learner layer always sets unit feature weights
        // (learners/base.py:101-115); the raw ctor zero-inits them
        std::vector<float> fw(F, 1.0f);
        dataHolder<float> fwh{fw.data(), cpu};
        model.set_feature_weights(&fwh, F);
        dataHolder<float> obs{X.data(), cpu};
        dataHolder<char> cat{nullptr, cpu};
        dataHolder<float> tg{y.data(), cpu};

        std::ofstream lf(outdir + "/fit_losses_A.txt");
        auto *old = std::cout.rdbuf(lf.rdbuf());
        std::cout << std::setprecision(9);
        float full_loss = model.fit(&obs, &cat, &tg, ITERS, N, F, 0,
                                    false, std::string("MultiRMSE"));
        std::cout.rdbuf(old);
        lf.close();

        dataHolder<const float> cobs{X.data(), cpu};
        dataHolder<const char> ccat{nullptr, cpu};
        float *preds = model.predict(&cobs, &ccat, N, F, 0, 0, 0);
        dump_mat(outdir + "/fit_preds_A.txt", preds, N, O);
        delete[] preds;
        FILE *f = fopen((outdir + "/fit_loss_A.txt").c_str(), "w");
        fprintf(f, "%.9g\n", full_loss);
        fclose(f);
        model.saveToFile(outdir + "/fit_A.gbrl_model");
    }

    // ---- config B: O=3, greedy + cosine + SGD Linear [0,2) + Const [2,3) --
    {
        const int O = 3;
        std::vector<float> y(N * O);
        for (int i = 0; i < N; ++i) {
            y[i * O + 0] = std::cos(X[i * F + 3]) + X[i * F + 4];
            y[i * O + 1] = 0.3f * X[i * F] * X[i * F] - X[i * F + 5];
            y[i * O + 2] = std::tanh(X[i * F + 6] + X[i * F + 7]) + 0.05f * dist(g);
        }
        dump_mat(outdir + "/fit_yB.txt", y.data(), N, O);

        GBRL model(F, O, 2, 4, 0, 16, 10, 0.9f,
                   std::string("cosine"), std::string("Quantile"), false,
                   BS, std::string("greedy"), 1, std::string("cpu"));
        model.set_optimizer(SGD, Linear, 0.1f, 0, 2, 0.01f, ITERS,
                            0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
        model.set_optimizer(SGD, Const, 0.05f, 2, 3, 1.0e-4f, 10000,
                            0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
        std::vector<float> fw(F, 1.0f);
        dataHolder<float> fwh{fw.data(), cpu};
        model.set_feature_weights(&fwh, F);
        dataHolder<float> obs{X.data(), cpu};
        dataHolder<char> cat{nullptr, cpu};
        dataHolder<float> tg{y.data(), cpu};

        std::ofstream lf(outdir + "/fit_losses_B.txt");
        auto *old = std::cout.rdbuf(lf.rdbuf());
        std::cout << std::setprecision(9);
        float full_loss = model.fit(&obs, &cat, &tg, ITERS, N, F, 0,
                                    false, std::string("MultiRMSE"));
        std::cout.rdbuf(old);
        lf.close();

        dataHolder<const float> cobs{X.data(), cpu};
        dataHolder<const char> ccat{nullptr, cpu};
        float *preds = model.predict(&cobs, &ccat, N, F, 0, 0, 0);
        dump_mat(outdir + "/fit_preds_B.txt", preds, N, O);
        delete[] preds;
        FILE *f = fopen((outdir + "/fit_loss_B.txt").c_str(), "w");
        fprintf(f, "%.9g\n", full_loss);
        fclose(f);
        model.saveToFile(outdir + "/fit_B.gbrl_model");
    }
    printf("fit golden files written to %s\n", outdir.c_str());
    return 0;
}
