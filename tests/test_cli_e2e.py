"""End-to-end CLI dry runs on the committed image fixtures.

Exercises the user-facing surfaces the reference README documents
(demo.py --imagedir --calib, evaluation_scripts/test_tum.py) without any
network or external datasets: tiny committed PNG sequences under
tests/fixtures/.  Random weights mean the trajectories are geometrically
meaningless; these tests assert that every stage executes and emits
well-formed output (reference README.md:85-89 demo contract).
"""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
FIX = osp.join(ROOT, "tests", "fixtures")

ENV = dict(
    os.environ if (os := __import__("os")) else {},
    JAX_PLATFORMS="cpu",
)


def _run(args):
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=ENV,
        capture_output=True, text=True, timeout=1500,
    )


@pytest.mark.slow
def test_demo_imagedir_fixture(tmp_path):
    out = str(tmp_path / "traj.txt")
    r = _run([
        "demo.py", "--imagedir", osp.join(FIX, "tiny_seq"),
        "--calib", osp.join(FIX, "tiny_seq", "calib.txt"),
        "--target_area", str(96 * 128), "--buffer", "32",
        "--warmup", "5", "--filter_thresh", "0",
        "--backend_steps", "1", "1", "--output", out,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    traj = np.loadtxt(out)
    assert traj.shape == (12, 8)
    # unit quaternions
    qn = np.linalg.norm(traj[:, 4:], axis=1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-4)


@pytest.mark.slow
def test_tum_eval_script_fixture():
    r = _run([
        osp.join("evaluation_scripts", "test_tum.py"),
        "--datapath", osp.join(FIX, "tum_tiny"),
        "--stride", "1", "--backend_steps", "1", "1",
        "--image_size", "96", "128", "--buffer", "32",
        "--warmup", "5", "--filter_thresh", "0",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ATE RMSE" in r.stdout, r.stdout
