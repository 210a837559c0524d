// C-ABI shim over the UNMODIFIED reference C++ core (mounted read-only at
// /root/reference) so Python can drive it via ctypes through the IDENTICAL
// algorithm loop as gbrl_tpu's RL classes.  Used for head-to-head baselines
// on gymnasium envs (LunarLander, MuJoCo) that have no C++ physics port —
// both sides then share the exact same Python env stepping, action sampling
// and gradient computation, and the walls compare only the cores.
//
// Harness code (like a2c_ref.cpp / ppo_ref.cpp), not product code.
#include <cstring>
#include <string>

#include "gbrl.h"
#include "types.h"

extern "C" {

void *ref_create(int F, int O, int policy_dim, int max_depth,
                 int min_data_in_leaf, int n_bins, int par_th, float cv_beta,
                 const char *score, const char *generator, int use_cv,
                 int batch_size, const char *grow_policy, int verbose) {
    return new GBRL(F, O, policy_dim, max_depth, min_data_in_leaf, n_bins,
                    par_th, cv_beta, std::string(score),
                    std::string(generator), use_cv != 0, batch_size,
                    std::string(grow_policy), verbose, std::string("cpu"));
}

void ref_set_optimizer(void *h, const char *algo, const char *sched,
                       float init_lr, int start_idx, int stop_idx,
                       float stop_lr, int T, float b1, float b2, float eps,
                       float shrinkage) {
    optimizerAlgo a = std::string(algo) == "Adam" ? Adam : SGD;
    schedulerFunc s = std::string(sched) == "Linear" ? Linear : Const;
    ((GBRL *)h)->set_optimizer(a, s, init_lr, start_idx, stop_idx, stop_lr,
                               T, b1, b2, eps, shrinkage);
}

void ref_set_feature_weights(void *h, const float *w, int F) {
    dataHolder<float> fw{const_cast<float *>(w), cpu};
    ((GBRL *)h)->set_feature_weights(&fw, F);
}

void ref_set_bias(void *h, const float *bias, int O) {
    dataHolder<const float> b{bias, cpu};
    ((GBRL *)h)->set_bias(&b, O);
}

void ref_predict(void *h, const float *obs, int n, int F, int O, float *out) {
    dataHolder<const float> o{obs, cpu};
    dataHolder<const char> c{nullptr, cpu};
    float *p = ((GBRL *)h)->predict(&o, &c, n, F, 0, 0, 0);
    std::memcpy(out, p, sizeof(float) * (size_t)n * O);
    delete[] p;
}

void ref_step(void *h, const float *obs, float *grads, int n, int F) {
    dataHolder<const float> o{obs, cpu};
    dataHolder<const char> c{nullptr, cpu};
    dataHolder<float> g{grads, cpu};
    ((GBRL *)h)->step(&o, &c, &g, n, F, 0);
}

int ref_num_trees(void *h) { return ((GBRL *)h)->get_num_trees(); }

void ref_free(void *h) { delete (GBRL *)h; }

}  // extern "C"
