// Loads a .gbrl_model file with the UNMODIFIED reference core and prints
// predictions for a feature matrix read from stdin — used to verify that
// checkpoints exported by gbrl_tpu are readable by the reference.
#include <cstdio>
#include <string>
#include <vector>

#include "gbrl.h"
#include "types.h"

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s model.gbrl_model\n", argv[0]); return 1; }
    std::string fname(argv[1]);
    GBRL model(fname);
    int n, f;
    if (scanf("%d %d", &n, &f) != 2) return 1;
    std::vector<float> X(n * f);
    for (int i = 0; i < n * f; ++i) {
        double v; if (scanf("%lf", &v) != 1) return 1;
        X[i] = (float)v;
    }
    dataHolder<const float> obs{X.data(), cpu};
    dataHolder<const char> cat{nullptr, cpu};
    float *preds = model.predict(&obs, &cat, n, f, 0, 0, 0);
    int o = model.metadata->output_dim;
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < o; ++j) printf("%.9g ", preds[i * o + j]);
        printf("\n");
    }
    delete[] preds;
    return 0;
}
