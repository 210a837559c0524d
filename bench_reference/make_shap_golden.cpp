// SHAP golden generator: loads the models saved by make_fit_golden from the
// UNMODIFIED reference core and dumps GBRL::ensemble_shap values
// (linear TreeSHAP, shap.cpp) for the shared X, so our device TreeSHAP can
// be cross-validated against the reference implementation (the reference
// itself validates against the `shap` package at rtol=1e-3,
// tests/test_gbt_single.py:226-250; that package is not available here, so
// the compiled reference serves as the cross-library oracle).
//
// Usage: make_shap_golden <dir>   (expects fit_X.txt, fit_{A,B}.gbrl_model,
// shap_poly_{base,norm,offset}.txt written by the pytest fixture)
#include <cstdio>
#include <string>
#include <vector>

#include "gbrl.h"
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
    const int N = 512, F = 8;

    std::vector<float> X = load_floats(dir + "/fit_X.txt");
    std::vector<float> base = load_floats(dir + "/shap_poly_base.txt");
    std::vector<float> norm = load_floats(dir + "/shap_poly_norm.txt");
    std::vector<float> offset = load_floats(dir + "/shap_poly_offset.txt");

    for (const std::string tag : {"A", "B"}) {
        GBRL model(dir + "/fit_" + tag + ".gbrl_model");
        float *shap = model.ensemble_shap(X.data(), nullptr, N, norm.data(),
                                          base.data(), offset.data());
        int O = (tag == "A") ? 1 : 3;
        FILE *f = fopen((dir + "/fit_shap_" + tag + ".txt").c_str(), "w");
        for (int i = 0; i < N * F * O; ++i) fprintf(f, "%.9g\n", shap[i]);
        fclose(f);
        delete[] shap;
    }
    printf("shap goldens written to %s\n", dir.c_str());
    return 0;
}
