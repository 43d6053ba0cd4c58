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
@pytest.mark.parametrize(
    "system,nproc,steps,port",
    [
        ("vanilla", 2, 3, 19245),        # MLP grads across processes
        ("autodecoder", 2, 3, 19246),    # latent-table grads across processes
        ("autodecoder", 4, 3, 19247),
        ("ae", 2, 1, 19248),             # encoder grads + global masked-MSE denom
        ("ae", 4, 1, 19249),
    ],
)
def test_multiprocess_train_matches_single(tmp_path, system, nproc, steps, port):
    """N-process data-parallel TRAINING (global mesh, XLA cross-process
    gradient reduction) must reach the single-process loss and params for
    ALL THREE systems — the reference's primary articulated mode is
    multi-process DDP (run.py:129,151), so the cross-process risk surfaces
    (code_library embedding grads, ResNet encoder grads, whole-batch
    masked-MSE denominator) each get a parity check here.

    The AE runs ONE step: its step-1 loss/digest parity is tight (measured
    2e-9..2e-6 rel), proving the cross-process reduction, but multi-step
    trajectories diverge chaotically — Adam's m/sqrt(v) update is sign-like
    on near-zero conv gradients, so ULP-level reduction-order differences
    between device layouts flip per-param update signs and the random-init
    BCE surface amplifies that to %-level loss deltas by step 3 (measured:
    identical 4-device math, 1 vs 2 processes, loss 2.319 vs 2.329).  The
    same holds for the reference's NCCL DDP vs single-GPU.  The pure-MLP
    systems stay bitwise-stable over 3 steps, so they keep steps=3."""
    golden = tmp_path / "t_single.npz"
    r = subprocess.run(
        [sys.executable, str(TRAIN_DEMO), "--system", system,
         "--steps", str(steps), "--out", str(golden)],
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    procs = []
    outs = [tmp_path / f"t_p{i}.npz" for i in range(nproc)]
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, str(TRAIN_DEMO), "--system", system,
             "--steps", str(steps), "--num_processes", str(nproc),
             "--process_id", str(pid), "--coordinator", f"localhost:{port}",
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
            got["params_digest"], want["params_digest"], rtol=1e-5
        )
        assert int(got["processes"]) == nproc
