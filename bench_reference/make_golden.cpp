// Golden-file generator: trains small models with the UNMODIFIED reference
// core and saves (a) .gbrl_model checkpoints and (b) its own predictions,
// so tests can verify this framework's importer reproduces the reference's
// outputs exactly.
#include <cstdio>
#include <random>
#include <string>
#include <vector>

#include "gbrl.h"
#include "types.h"

static void dump_preds(const char *path, float *preds, int n, int o) {
    FILE *f = fopen(path, "w");
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < o; ++j) fprintf(f, "%.9g ", preds[i * o + j]);
        fprintf(f, "\n");
    }
    fclose(f);
}

int main(int argc, char **argv) {
    std::string outdir = (argc > 1) ? argv[1] : ".";
    printf("{\"sizeof_metadata\": %zu, \"sizeof_header\": %zu}\n",
           sizeof(ensembleMetaData), sizeof(serializationHeader));
    const int N = 64, F = 5, O = 2, T = 6;
    std::mt19937 g(7);
    std::normal_distribution<float> dist(0.f, 1.f);
    std::vector<float> X(N * F), grads(N * O);
    for (auto &v : X) v = dist(g);

    FILE *fx = fopen((outdir + "/golden_X.txt").c_str(), "w");
    for (int i = 0; i < N * F; ++i) fprintf(fx, "%.9g\n", X[i]);
    fclose(fx);

    const char *policies[2] = {"greedy", "oblivious"};
    for (int pi = 0; pi < 2; ++pi) {
        GBRL model(F, O, O - 1, 3, 0, 8, 10, 0.9f,
                   std::string("cosine"), std::string("Quantile"), false,
                   5000, std::string(policies[pi]), 0, std::string("cpu"));
        model.set_optimizer(SGD, Linear, 0.5f, 0, 1, 0.05f, 100,
                            0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
        model.set_optimizer(SGD, Const, 0.1f, 1, 2, 1.0e-4f, 10000,
                            0.9f, 0.999f, 1.0e-8f, 1.0e-5f);
        float bias[O] = {0.5f, -0.25f};
        dataHolder<const float> bias_h{bias, cpu};
        model.set_bias(&bias_h, O);

        dataHolder<const float> obs{X.data(), cpu};
        dataHolder<const char> cat{nullptr, cpu};
        std::mt19937 g2(13 + pi);
        for (int t = 0; t < T; ++t) {
            for (auto &v : grads) v = dist(g2);
            dataHolder<float> gh{grads.data(), cpu};
            model.step(&obs, &cat, &gh, N, F, 0);
        }
        float *preds = model.predict(&obs, &cat, N, F, 0, 0, 0);
        std::string tag = std::string(policies[pi]);
        dump_preds((outdir + "/golden_preds_" + tag + ".txt").c_str(),
                   preds, N, O);
        delete[] preds;
        model.saveToFile(outdir + "/golden_" + tag + ".gbrl_model");
    }
    printf("golden files written to %s\n", outdir.c_str());
    return 0;
}
