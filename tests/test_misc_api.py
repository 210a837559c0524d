"""Distillation, introspection, verbose metadata, scheduler lr queries."""
import numpy as np
import pytest

from gbrl_tpu.models.gbt import GBTModel


def _model(lr=1.0, **ts):
    tree_struct = dict({"max_depth": 3, "n_bins": 8}, **ts)
    return GBTModel(tree_struct=tree_struct, input_dim=4, output_dim=2,
                    optimizers={"algo": "SGD", "lr": lr, "start_idx": 0,
                                "stop_idx": 2}, device="cpu")


def _trained(n=6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(60, 4)).astype(np.float32)
    m = _model()
    for _ in range(n):
        m.step(X, grads=rng.normal(size=(60, 2)).astype(np.float32))
    return m, X


def test_distillation_swaps_in_student():
    m, X = _trained(10)
    teacher_preds = m(X, requires_grad=False, tensor=False)
    loss, params = m.distil(X, teacher_preds,
                            {"max_depth": 2, "lr": 0.5, "distil_budget": 60})
    assert np.isfinite(loss)
    # the swapped-in student is a fresh compact ensemble trained on the
    # teacher's outputs (gbt_learner.py:502-551)
    assert m.get_num_trees() == 60
    student_preds = m(X, requires_grad=False, tensor=False)
    corr = np.corrcoef(teacher_preds.reshape(-1),
                       student_preds.reshape(-1))[0, 1]
    assert corr > 0.5, f"student barely tracks teacher: corr={corr}"


def test_get_ensemble_data_and_metadata():
    m, X = _trained(4)
    data = m.learner.get_ensemble_data()
    assert data["n_trees"] == 4
    assert data["feat"].shape == (4, 7)
    assert data["leaf_values"].shape == (4, 8, 2)
    md = m.learner.get_metadata()
    assert md["n_trees"] == 4 and md["max_depth"] == 3
    assert md["split_score_func"] == "cosine"


def test_print_tree_and_metadata(capsys):
    m, X = _trained(2)
    m.print_tree(0)
    m.learner.print_ensemble_metadata()
    out = capsys.readouterr().out
    assert "Tree 0" in out and "trees=2" in out


def test_plot_tree_writes_output(tmp_path):
    m, X = _trained(1)
    out = tmp_path / "tree0.png"
    m.plot_tree(0, str(out))
    import os
    assert os.path.exists(out) or os.path.exists(str(out).replace(
        ".png", ".dot"))


def test_schedule_learning_rates():
    m, _ = _trained(3)
    assert m.get_schedule_learning_rates() == 1.0
    m2 = GBTModel(tree_struct={"max_depth": 2, "n_bins": 4},
                  input_dim=4, output_dim=1,
                  optimizers={"algo": "SGD", "lr": "lin_1.0", "stop_lr": 0.1,
                              "T": 10, "start_idx": 0, "stop_idx": 1},
                  device="cpu")
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 4)).astype(np.float32)
    for _ in range(5):
        m2.step(X, grads=rng.normal(size=(30, 1)).astype(np.float32))
    lr = m2.get_schedule_learning_rates()
    # lr(t=5) = 1.0 + (6/10)*(0.1-1.0) = 0.46
    np.testing.assert_allclose(lr, 0.46, rtol=1e-5)
    assert m2.get_total_iterations() == 5


def test_get_optimizers_roundtrip():
    """get_optimizers() exports the reference binding's dict fields
    (binding.cpp:393-419) and the dicts reconstruct an identical learner."""
    m = GBTModel(tree_struct={"max_depth": 2, "n_bins": 4},
                 input_dim=4, output_dim=3,
                 optimizers=[{"algo": "SGD", "lr": "lin_0.7", "stop_lr": 0.05,
                              "T": 20, "start_idx": 0, "stop_idx": 2},
                             {"algo": "Adam", "lr": 0.3, "beta_1": 0.8,
                              "beta_2": 0.95, "eps": 1e-6,
                              "start_idx": 2, "stop_idx": 3}],
                 device="cpu")
    opts = m.learner.get_optimizers()
    assert [o["algo"] for o in opts] == ["SGD", "Adam"]
    assert opts[0] == dict(algo="SGD", init_lr=0.7, start_idx=0, stop_idx=2,
                           scheduler_func="Linear", stop_lr=0.05, T=20,
                           beta_1=0.9, beta_2=0.999, eps=1e-8)
    assert opts[1]["beta_1"] == 0.8 and opts[1]["beta_2"] == 0.95
    assert opts[1]["scheduler_func"] == "Const"

    # reconstruct: Linear schedulers travel via the 'lin_<lr>' convention
    # (setup_optimizer, common/utils.py — same rule as the reference)
    def to_ctor(o):
        lr = f"lin_{o['init_lr']}" if o["scheduler_func"] == "Linear" \
            else o["init_lr"]
        return dict(algo=o["algo"], lr=lr, stop_lr=o["stop_lr"], T=o["T"],
                    start_idx=o["start_idx"], stop_idx=o["stop_idx"],
                    beta_1=o["beta_1"], beta_2=o["beta_2"], eps=o["eps"])

    m2 = GBTModel(tree_struct={"max_depth": 2, "n_bins": 4},
                  input_dim=4, output_dim=3,
                  optimizers=[to_ctor(o) for o in opts], device="cpu")
    assert m2.learner.get_optimizers() == opts
    assert m2.learner.specs == m.learner.specs


def test_get_optimizers_multi_learner():
    from gbrl_tpu.learners.multi_gbt_learner import MultiGBTLearner
    ml = MultiGBTLearner(
        input_dim=4, output_dim=[1, 2],
        tree_struct={"max_depth": 2, "n_bins": 4},
        optimizers=[[{"algo": "SGD", "lr": 0.5, "start_idx": 0,
                      "stop_idx": 1}],
                    [{"algo": "SGD", "lr": 0.25, "start_idx": 0,
                      "stop_idx": 2}]],
        params={}, n_learners=2, device="cpu")
    ml.reset()
    opts = ml.get_optimizers()
    assert [o["init_lr"] for o in opts] == [0.5, 0.25]
    assert ml.get_optimizers(model_idx=1)[0]["stop_idx"] == 2
