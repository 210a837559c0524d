// SHAP debug harness: fits a tiny reference model (few trees, small depth),
// saves the checkpoint, dumps ensemble_shap + per-tree shap_data internals
// (print_shap_data) for root-causing conventions against our device TreeSHAP.
// Usage: shap_debug <dir> [iters] [depth] [grow_policy]
#include <cstdio>
#include <cmath>
#include <fstream>
#include <iostream>
#include <random>
#include <string>
#include <vector>

#include "gbrl.h"
#include "shap.h"
#include "types.h"

static std::vector<float> load_floats(const std::string &path) {
    std::vector<float> v;
    FILE *f = fopen(path.c_str(), "r");
    if (!f) { fprintf(stderr, "missing %s\n", path.c_str()); exit(1); }
    float x;
    while (fscanf(f, "%f", &x) == 1) v.push_back(x);
    fclose(f);
    return v;
}

int main(int argc, char **argv) {
    std::string dir = (argc > 1) ? argv[1] : ".";
    int ITERS = (argc > 2) ? atoi(argv[2]) : 1;
    int DEPTH = (argc > 3) ? atoi(argv[3]) : 2;
    std::string POLICY = (argc > 4) ? argv[4] : "oblivious";
    const int N = 64, F = 4, O = 1;

    std::mt19937 g(7);
    std::normal_distribution<float> dist(0.f, 1.f);
    std::vector<float> X(N * F), y(N * O);
    for (auto &v : X) v = dist(g);
    for (int i = 0; i < N; ++i)
        y[i] = std::sin(X[i * F]) + 0.5f * X[i * F + 1] + 0.1f * dist(g);

    FILE *fx = fopen((dir + "/dbg_X.txt").c_str(), "w");
    for (int i = 0; i < N * F; ++i) fprintf(fx, "%.9g\n", X[i]);
    fclose(fx);

    GBRL model(F, O, 0, DEPTH, 0, 8, 10, 0.9f,
               std::string("L2"), std::string("Quantile"), false,
               N, POLICY, 0, std::string("cpu"));
    model.set_optimizer(SGD, Const, 0.1f, 0, 1, 1.0e-4f, 10000,
                        0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
    std::vector<float> fw(F, 1.0f);
    dataHolder<float> fwh{fw.data(), cpu};
    model.set_feature_weights(&fwh, F);
    dataHolder<float> obs{X.data(), cpu};
    dataHolder<char> cat{nullptr, cpu};
    dataHolder<float> tg{y.data(), cpu};
    model.fit(&obs, &cat, &tg, ITERS, N, F, 0, false,
              std::string("MultiRMSE"));
    model.saveToFile(dir + "/dbg.gbrl_model");

    std::vector<float> base = load_floats(dir + "/shap_poly_base.txt");
    std::vector<float> norm = load_floats(dir + "/shap_poly_norm.txt");
    std::vector<float> offset = load_floats(dir + "/shap_poly_offset.txt");

    float *shap = model.ensemble_shap(X.data(), nullptr, N, norm.data(),
                                      base.data(), offset.data());
    FILE *f = fopen((dir + "/dbg_shap.txt").c_str(), "w");
    for (int i = 0; i < N * F * O; ++i) fprintf(f, "%.9g\n", shap[i]);
    fclose(f);
    delete[] shap;

    // per-tree internals (printf -> stdout; capture via shell redirect)
    {
        ensembleMetaData *md = model.metadata;
        ensembleData *ed = model.edata;
        for (int t = 0; t < md->n_trees; ++t) {
            shapData *sd = alloc_shap_data(md, ed, t);
            printf("=== tree %d ===\n", t);
            print_shap_data(sd, md);
            dealloc_shap_data(sd);
        }
    }
    model.print_ensemble_metadata();
    printf("debug artifacts in %s\n", dir.c_str());
    return 0;
}
