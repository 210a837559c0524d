"""End-to-end multi-host AWR with per-host sharded replay
(examples/multihost_awr.py, BASELINE config 5's sharding clause): 2
localhost jax.distributed processes, each driving its OWN gymnasium vector
envs, updating one shared GaussianActor + critic pair through
parallel/hosts.host_awr_update.  Asserts the launcher's own
ensemble-digest identity check plus basic shape sanity."""
import json
import os
import shutil
import subprocess
import sys

import pytest

EXAMPLE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "multihost_awr.py")

pytestmark = pytest.mark.skipif(
    shutil.which(sys.executable) is None, reason="needs python")


def test_multihost_awr_sharded_replay(tmp_path):
    out = tmp_path / "mh_awr.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, EXAMPLE, "--steps", "4096", "--out", str(out)],
        env=env, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()[-3000:]
    with open(out) as f:
        d = json.load(f)
    assert d["ensembles_identical"] is True
    assert len(d["per_process"]) == 2
    for r in d["per_process"]:
        assert r["actor_trees"] > 0
        assert r["critic_trees"] > 0
        assert r["total_steps"] >= 4096
        # Pendulum rewards are negative; episodes must have been observed
        assert r["final_mean100"] < 0
