"""End-to-end multi-host PPO with per-host sharded rollouts
(examples/multihost_ppo.py): 2 localhost jax.distributed processes, each
driving its OWN gymnasium vector envs, updating one shared ensemble through
parallel/hosts.host_ppo_update.  Asserts the launcher's own ensemble-digest
identity check plus basic learning-signal sanity."""
import json
import os
import shutil
import subprocess
import sys

import pytest

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "multihost_ppo.py")

pytestmark = pytest.mark.skipif(
    shutil.which(sys.executable) is None, reason="needs python")


def test_multihost_ppo_sharded_rollout(tmp_path):
    out = tmp_path / "mh.json"
    env = dict(os.environ)
    # the launcher sets worker env itself; keep the parent light
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, EXAMPLE, "--steps", "8192", "--out", str(out)],
        env=env, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    with open(out) as f:
        d = json.load(f)
    assert d["ensembles_identical"] is True
    assert len(d["per_process"]) == 2
    for r in d["per_process"]:
        assert r["trees"] > 0
        assert r["total_steps"] >= 8192
    # both processes observed real episodes
    assert all(r["final_mean100"] > 0 for r in d["per_process"])
