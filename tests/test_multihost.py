"""Multi-process eval gather AND training: 2 CPU processes under
jax.distributed must assemble the same frame (reference ``interface.py:31-51``
all-gather contract) and train to the same loss/params (the reference's
primary multi-process DDP mode, ``run.py:109,129,151``) as a single process."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
DEMO = REPO / "scripts" / "multihost_eval_demo.py"
TRAIN_DEMO = REPO / "scripts" / "multihost_train_demo.py"


def _env():
    return {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_DEFAULT_MATMUL_PRECISION": "highest",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "PYTHONPATH": str(REPO),
    }


def test_process_ray_slice_partition():
    from aon_tpu.parallel.multihost import process_ray_slice

    n = 769  # deliberately not divisible
    blocks = [process_ray_slice(n, pid, 4) for pid in range(4)]
    assert blocks[0][0] == 0
    per = blocks[0][1]
    for pid, (s, e) in enumerate(blocks):
        assert (s, e) == (pid * per, (pid + 1) * per)
    assert blocks[-1][1] >= n  # covers all rays (tail padded)


def test_alter_gather_cat_single_process_reshape():
    from aon_tpu.parallel.multihost import alter_gather_cat

    w, h = 8, 4
    chunks = [
        {"comp_rgb": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
         "acc": np.arange(16, dtype=np.float32)},
        {"comp_rgb": np.arange(48, 16 * 3 + 48, dtype=np.float32).reshape(16, 3),
         "acc": np.arange(16, 32, dtype=np.float32)},
    ]
    out = alter_gather_cat(chunks, (w, h))
    assert out["comp_rgb"].shape == (h, w, 3)
    assert out["acc"].shape == (h, w)
    np.testing.assert_array_equal(out["comp_rgb"].reshape(-1, 3)[:16], chunks[0]["comp_rgb"])


@pytest.mark.slow
def test_two_process_gather_matches_single(tmp_path):
    golden = tmp_path / "single.npz"
    r = subprocess.run(
        [sys.executable, str(DEMO), "--out", str(golden)],
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    procs = []
    outs = [tmp_path / f"p{i}.npz" for i in range(2)]
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(DEMO), "--num_processes", "2",
             "--process_id", str(pid), "--coordinator", "localhost:19233",
             "--out", str(outs[pid])],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err)
        assert p.returncode == 0, err[-2000:]

    want = np.load(golden)
    for out in outs:
        got = np.load(out)
        for k in want.files:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6,
                                       err_msg=f"{out.name}:{k}")


@pytest.mark.slow
def test_two_process_train_matches_single(tmp_path):
    """2-process data-parallel TRAINING (global mesh, XLA cross-process
    gradient reduction) must reach the single-process loss and params."""
    golden = tmp_path / "t_single.npz"
    r = subprocess.run(
        [sys.executable, str(TRAIN_DEMO), "--out", str(golden)],
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    procs = []
    outs = [tmp_path / f"t_p{i}.npz" for i in range(2)]
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(TRAIN_DEMO), "--num_processes", "2",
             "--process_id", str(pid), "--coordinator", "localhost:19245",
             "--out", str(outs[pid])],
            env=_env(), stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for p in procs:
        try:
            _, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        assert p.returncode == 0, err[-2000:]

    want = np.load(golden)
    for out in outs:
        got = np.load(out)
        np.testing.assert_allclose(got["loss"], want["loss"], rtol=1e-5)
        np.testing.assert_allclose(
            got["params_digest"], want["params_digest"], rtol=1e-6
        )
        assert int(got["processes"]) == 2
