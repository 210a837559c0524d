"""gbrl_tpu walkthrough — the tutorial.ipynb analog, runnable end to end.

Covers: supervised fitting, the RL-style gradient-boosting loop, shared
actor-critic, SHAP attribution, checkpointing, distillation, C export and
the compiled native serving runtime.

Run: python examples/tutorial.py [--device cpu|tpu]
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu")
    args = ap.parse_args()
    if args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import torch as th
    from torch.nn.functional import mse_loss
    from sklearn import datasets

    from gbrl_tpu.models.gbt import GBTModel
    from gbrl_tpu.models.actor_critic import ActorCritic

    X, y = datasets.load_diabetes(return_X_y=True, as_frame=False,
                                  scaled=False)
    X = X.astype(np.float32)
    y = y.astype(np.float32)[:, None]

    # ---------------------------------------------------------- supervised
    print("== supervised fit ==")
    model = GBTModel(
        tree_struct={"max_depth": 4, "n_bins": 128, "grow_policy": "greedy"},
        input_dim=X.shape[1], output_dim=1,
        optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0, "stop_idx": 1},
        params={"split_score_func": "cosine"}, device=args.device)
    loss = model.fit(X, y, iterations=60)
    print(f"final MultiRMSE: {loss:.2f}  trees: {model.get_num_trees()}")

    # ------------------------------------------------- RL-style boosting loop
    print("== torch-autograd boosting loop ==")
    model2 = GBTModel(
        tree_struct={"max_depth": 4, "n_bins": 128},
        input_dim=X.shape[1], output_dim=1,
        optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0, "stop_idx": 1},
        device=args.device)
    model2.set_bias_from_targets(y)
    y_t = th.tensor(y, dtype=th.float32).squeeze()
    for epoch in range(30):
        y_pred = model2(X, requires_grad=True)
        l = 0.5 * mse_loss(y_pred, y_t)
        l.backward()
        model2.step()
    print(f"loop RMSE: {l.sqrt().item():.2f}")

    # --------------------------------------------------------- actor-critic
    print("== shared actor-critic ==")
    ac = ActorCritic(
        tree_struct={"max_depth": 4, "n_bins": 64}, input_dim=X.shape[1],
        output_dim=4,
        policy_optimizer={"policy_lr": 0.5, "start_idx": 0, "stop_idx": 3},
        value_optimizer={"value_lr": 0.05, "start_idx": 3, "stop_idx": 4},
        device=args.device)
    theta, value = ac(X)
    (0.5 * mse_loss(theta, th.zeros_like(theta)) * 3).backward()
    (0.5 * mse_loss(value, y_t)).backward()
    ac.step()
    print(f"policy shape {tuple(theta.shape)}, value shape "
          f"{tuple(value.shape)}, trees {ac.get_num_trees()}")

    # ----------------------------------------------------------------- SHAP
    print("== SHAP ==")
    sv = model2.shap(X[:5])
    print(f"shap values shape: {sv.shape} "
          f"(sum over features + E[f] == prediction)")

    # ----------------------------------------------------------- checkpoint
    print("== save / load / continue ==")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "model")
        model2.save_learner(p)
        loaded = GBTModel.load_learner(p, device=args.device)
        print("loaded trees:", loaded.get_num_trees())
        # exported C header + native runtime
        from gbrl_tpu.utils.c_runtime import CompiledModel
        rt = CompiledModel.from_learner(loaded.learner)
        native = rt(X[:3])
        jaxp = loaded(X[:3], requires_grad=False, tensor=False)
        print("native vs jax max diff:",
              float(np.abs(native.squeeze() - jaxp).max()))

    # ----------------------------------------------------------- distil
    print("== distillation ==")
    teacher_preds = model2(X, requires_grad=False, tensor=False)
    dloss, _ = model2.distil(X, teacher_preds[:, None],
                             {"max_depth": 2, "lr": 0.5, "distil_budget": 40})
    print(f"student loss {dloss:.2f}, trees {model2.get_num_trees()}")


if __name__ == "__main__":
    main()
