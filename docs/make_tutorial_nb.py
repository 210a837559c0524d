"""Build docs/tutorial.ipynb — the narrative notebook analog of the
reference's tutorial.ipynb — and execute it on the CPU backend so outputs
are committed.  Regenerate: ``python docs/make_tutorial_nb.py``."""
import os
import sys

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def md(text):
    return nbf.v4.new_markdown_cell(text.strip())


def code(text):
    return nbf.v4.new_code_cell(text.strip())


CELLS = [
    md("""
# gbrl_tpu tutorial

**gbrl_tpu** is a TPU-native Gradient Boosted Trees library specialized for
reinforcement learning — a from-scratch JAX/XLA/Pallas re-design of
[NVlabs/gbrl](https://github.com/NVlabs/gbrl).  Two ideas make it "for RL"
rather than another XGBoost:

1. **Trees are fit to per-sample policy/value gradients**, not residuals of
   a fixed loss: each `step()` fits one tree whose leaves hold the mean
   gradient of the samples routed there.
2. **Learning rates apply at *prediction* time** via optimizer objects over
   output-column ranges, so one shared ensemble can carry policy columns
   and a value column with different learning rates — the mechanism behind
   the shared actor-critic tree.

This notebook covers supervised fitting, the torch-autograd boosting loop,
the shared actor-critic, SHAP attribution, checkpointing, native C serving,
and distillation.  Everything runs on the host CPU backend here; pass
`device="tpu"` on a TPU host.
"""),
    code("""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")   # host CPU backend
sys.path.insert(0, os.path.abspath(".."))   # repo root
import numpy as np
import torch as th
from torch.nn.functional import mse_loss
from sklearn import datasets

X, y = datasets.load_diabetes(return_X_y=True, as_frame=False, scaled=False)
X = X.astype(np.float32)
y = y.astype(np.float32)[:, None]
X.shape, y.shape
"""),
    md("""
## 1. Supervised fitting

`GBTModel.fit` runs the multi-iteration MultiRMSE loop (cycling
mini-batches, one tree per iteration) fully on the device as a single jit
program with incrementally-maintained predictions.
"""),
    code("""
from gbrl_tpu.models.gbt import GBTModel

model = GBTModel(
    tree_struct={"max_depth": 4, "n_bins": 128, "grow_policy": "greedy"},
    input_dim=X.shape[1], output_dim=1,
    optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0, "stop_idx": 1},
    params={"split_score_func": "cosine"}, device="cpu")
loss = model.fit(X, y, iterations=60)
print(f"final MultiRMSE: {loss:.2f}  trees: {model.get_num_trees()}")
"""),
    md("""
## 2. The RL-style boosting loop

The torch facade returns *leaf tensors*: call the model, build any torch
loss, `backward()`, then `step()` harvests `params.grad` and fits one tree
to those gradients.  This is exactly how the RL algorithms drive the
ensemble.
"""),
    code("""
model2 = GBTModel(
    tree_struct={"max_depth": 4, "n_bins": 128},
    input_dim=X.shape[1], output_dim=1,
    optimizers={"algo": "SGD", "lr": 1.0, "start_idx": 0, "stop_idx": 1},
    device="cpu")
model2.set_bias_from_targets(y)
y_t = th.tensor(y, dtype=th.float32).squeeze()
for epoch in range(30):
    y_pred = model2(X, requires_grad=True)
    l = 0.5 * mse_loss(y_pred, y_t)
    l.backward()
    model2.step()
print(f"loop RMSE: {l.sqrt().item():.2f}")
"""),
    md("""
## 3. Shared actor-critic

One ensemble, two optimizers over disjoint output-column ranges: policy
logits on `[0, 3)` with its own learning rate, the value on `[3, 4)`.
Gradients for both heads are harvested from two `backward()` calls.
"""),
    code("""
from gbrl_tpu.models.actor_critic import ActorCritic

ac = ActorCritic(
    tree_struct={"max_depth": 4, "n_bins": 64}, input_dim=X.shape[1],
    output_dim=4,
    policy_optimizer={"policy_lr": 0.5, "start_idx": 0, "stop_idx": 3},
    value_optimizer={"value_lr": 0.05, "start_idx": 3, "stop_idx": 4},
    device="cpu")
theta, value = ac(X)
(0.5 * mse_loss(theta, th.zeros_like(theta)) * 3).backward()
(0.5 * mse_loss(value, y_t)).backward()
ac.step()
print(f"policy {tuple(theta.shape)}, value {tuple(value.shape)}, "
      f"trees {ac.get_num_trees()}")
"""),
    md("""
For full RL training, `gbrl_tpu.rl` ships PPO / A2C / AWR / SAC built on
this model layer, with device-resident update loops and host-mirror rollout
forwards (`examples/ppo_cartpole.py`, `examples/ppo_vs_ref.py`).
"""),
    md("""
## 4. SHAP attribution

The default `shap()` computes **exact** path-dependent TreeSHAP on device
(verified against brute-force Shapley enumeration).
`shap(..., ref_compat=True)` instead reproduces the reference C++
implementation bit-for-bit — including its nearest-ancestor convention for
repeated path features — for users migrating reference models.
"""),
    code("""
sv = model2.shap(X[:5])
print("shap shape [samples, features, outputs]:", sv.shape)
ranking = np.argsort(-np.abs(sv[:, :, 0]).mean(axis=0))
print("most influential features:", ranking[:4].tolist())
# local accuracy (sum of attributions + expectation == prediction) is
# asserted against brute-force Shapley enumeration in tests/test_shap.py
"""),
    md("""
## 5. Checkpointing and native serving

Models save to a single `.gbrl_model` file (npz + JSON) and support
continued training after load.  `CompiledModel.from_learner` exports the
ensemble to a self-contained C header, compiles it, and serves predictions
at ~microseconds/sample — the deployment path.
"""),
    code("""
import tempfile
from gbrl_tpu.utils.c_runtime import CompiledModel

with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "model")
    model2.save_learner(p)
    loaded = GBTModel.load_learner(p, device="cpu")
    print("loaded trees:", loaded.get_num_trees())
    try:
        rt = CompiledModel.from_learner(loaded.learner)
        native = rt(X[:3])
        jaxp = loaded(X[:3], requires_grad=False, tensor=False)
        print("native vs jax max diff:",
              float(np.abs(native.squeeze() - jaxp).max()))
    except RuntimeError as e:
        print("no C compiler in this environment:", e)
"""),
    md("""
Reference-format interop: `gbrl_tpu.utils.reference_import.load_reference_model`
loads a `.gbrl_model` checkpoint written by NVlabs/gbrl directly into a
ready `GBTLearner`; `reference_export` writes our ensembles back into the
reference's binary format.
"""),
    md("""
## 6. Distillation

`distil()` trains a smaller student ensemble on the teacher's outputs and
swaps it in — the reference's model-compression path.
"""),
    code("""
teacher_preds = model2(X, requires_grad=False, tensor=False)
dloss, _ = model2.distil(X, teacher_preds[:, None],
                         {"max_depth": 2, "lr": 0.5, "distil_budget": 40})
print(f"student loss {dloss:.2f}, trees {model2.get_num_trees()}")
"""),
    md("""
## Where to next

- `docs/API.md` — generated API reference.
- `docs/architecture.md` — the TPU-first design (histogram fitting on the
  MXU, heap-layout ensembles, lr-at-predict optimizers).
- `examples/` — PPO/A2C/AWR/SAC training scripts, reference head-to-heads,
  multi-host PPO with sharded rollouts.
"""),
]


def main():
    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    out = os.path.join(HERE, "tutorial.ipynb")
    if "--no-exec" not in sys.argv:
        from nbclient import NotebookClient
        client = NotebookClient(nb, timeout=600, kernel_name="python3",
                                resources={"metadata": {"path": HERE}})
        client.execute()
    with open(out, "w") as f:
        nbf.write(nb, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
