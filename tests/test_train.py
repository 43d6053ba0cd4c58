"""Training-system tests: schedule math, state creation, step determinism,
checkpoint roundtrip, end-to-end fit on the fixture dataset."""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_lr_schedule_reference_values():
    """Exact values from the reference formula (model.py:391-419)."""
    from aon_tpu.train.schedule import nerf_lr_schedule

    sched = nerf_lr_schedule(5e-4, 5e-6, 2500, 0.01, 100000)

    def ref(step):
        delay = 0.01 + (1 - 0.01) * np.sin(0.5 * np.pi * np.clip(step / 2500, 0, 1))
        t = np.clip(step / 100000, 0, 1)
        return delay * np.exp(np.log(5e-4) * (1 - t) + np.log(5e-6) * t)

    for step in [0, 100, 1250, 2500, 10000, 50000, 100000, 150000]:
        np.testing.assert_allclose(float(sched(step)), ref(step), rtol=1e-5, err_msg=str(step))

    # no-delay variant
    sched2 = nerf_lr_schedule(5e-4, 5e-6, 0, 0.01, 100000)
    np.testing.assert_allclose(float(sched2(0)), 5e-4, rtol=1e-5)


def _host_batch(batch=64, seed=0):
    g = np.random.default_rng(seed)
    d = g.normal(size=(batch, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": (-4 * d).astype(np.float32),
        "rays_d": d,
        "viewdirs": d,
        "target": g.uniform(size=(batch, 3)).astype(np.float32),
    }


def _vanilla_system(batch=64):
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    cfg = Config(batch_size=batch, N_samples=8, N_importance=8, compute_dtype="float32")
    return VanillaSystem(cfg, 2.0, 6.0, True)


def test_vanilla_train_step_decreases_loss(eight_devices):
    from aon_tpu.parallel import get_mesh, shard_ray_batch

    # 2-dev mesh: 40 sequential steps are execution-bound and an 8-way
    # all-reduce rendezvous crawls on 1-core hosts; full 8-dev parity is
    # covered by test_sharded_matches_single_device.
    mesh = get_mesh(2)
    system = _vanilla_system()
    state = system.init_state(jax.random.PRNGKey(0))
    batch = shard_ray_batch(_host_batch(), mesh)
    losses = []
    for i in range(40):
        state, m = system.train_step(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        losses.append(float(m["train/loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 40


def test_sharded_matches_single_device():
    """Same batch, 1-device vs 8-device mesh: losses must agree closely
    (the multi-chip correctness test from SURVEY.md §4)."""
    from aon_tpu.parallel import get_mesh, shard_ray_batch

    host = _host_batch(batch=64)
    key = jax.random.PRNGKey(0)
    results = []
    for n_dev in (1, 8):
        mesh = get_mesh(n_dev)
        system = _vanilla_system()
        state = system.init_state(key)
        batch = shard_ray_batch(host, mesh)
        for i in range(3):
            state, m = system.train_step(state, batch, jax.random.fold_in(key, i))
        results.append((float(m["train/loss"]), jax.tree.map(np.asarray, state.params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    flat0 = jax.tree.leaves(results[0][1])
    flat1 = jax.tree.leaves(results[1][1])
    for a, b in zip(flat0, flat1):
        # atol 1e-5 (not 1e-6): the 1- and 8-device programs compile with
        # different fusion/reassociation around the compositing cumprod, so
        # a handful of params diverge by a few ULP-scale reductions
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_autodecoder_train_step_updates_latents(eight_devices):
    from aon_tpu.parallel import get_mesh, shard_ray_batch
    from aon_tpu.train.systems import AutoDecoderSystem
    from aon_tpu.utils.config import Config

    cfg = Config(
        N_samples=8, N_importance=8, compute_dtype="float32", N_max_objs=4
    )
    mesh = get_mesh(2)  # sharded path; 8-dev parity covered elsewhere
    system = AutoDecoderSystem(cfg, 2.0, 6.0, False)
    state = system.init_state(jax.random.PRNGKey(0))
    host = _host_batch(batch=64)
    host["instance_id"] = np.int32(1)
    host["articulation_id"] = np.int32(2)
    batch = shard_ray_batch(host, mesh)

    tbl_before = np.asarray(
        state.params["code_library"]["embedding_instance_shape"]["embedding"]
    ).copy()
    state, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    tbl_after = np.asarray(
        state.params["code_library"]["embedding_instance_shape"]["embedding"]
    )
    # only the selected instance row moves
    assert not np.allclose(tbl_before[1], tbl_after[1])
    np.testing.assert_array_equal(tbl_before[0], tbl_after[0])
    assert np.isfinite(float(m["train/loss"]))
    assert float(m["train/loss/reg"]) > 0


def test_autodecoder_art_smoothness_contracts_table(eight_devices):
    """art_code_smoothness pulls consecutive articulation codes together
    (and composes with either loss-fn convention via _with_art_smoothness)."""
    from aon_tpu.parallel import get_mesh, shard_ray_batch
    from aon_tpu.train.systems import AutoDecoderSystem
    from aon_tpu.utils.config import Config

    def gap(state):
        tbl = np.asarray(
            state.params["code_library"]["embedding_instance_articulation"][
                "embedding"
            ]
        )
        return float(np.sum((tbl[1:] - tbl[:-1]) ** 2))

    mesh = get_mesh(2)  # sharded path; 8-dev parity covered elsewhere
    host = _host_batch(batch=64)
    host["instance_id"] = np.int32(1)
    host["articulation_id"] = np.int32(2)

    gaps = {}
    for w in (0.0, 10.0):
        cfg = Config(
            N_samples=8, N_importance=8, compute_dtype="float32", N_max_objs=4,
            art_code_smoothness=w,
        )
        system = AutoDecoderSystem(cfg, 2.0, 6.0, False)
        state = system.init_state(jax.random.PRNGKey(0))
        batch = shard_ray_batch(host, mesh)
        for i in range(3):
            state, m = system.train_step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["train/loss"]))
        gaps[w] = gap(state)
    # the regularized run must contract neighbor distances vs the baseline
    assert gaps[10.0] < gaps[0.0]


def test_art_smoothness_wrapper_adds_analytic_grads():
    """_with_art_smoothness on the in-kernel-grad (v3) convention: the
    smoothness gradient lands on the articulation table only."""
    import jax.numpy as jnp

    from aon_tpu.train.systems import _with_art_smoothness

    tbl = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32))
    params = {
        "code_library": {"embedding_instance_articulation": {"embedding": tbl}},
        "model": {"w": jnp.ones((3,))},
    }

    def base(params, batch, key):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return jnp.float32(1.5), {"reg": jnp.float32(0.25)}, zeros

    base.returns_grads = True
    wrapped = _with_art_smoothness(base, 2.0)
    assert wrapped.returns_grads
    loss, aux, grads = wrapped(params, {}, jax.random.PRNGKey(0))
    d = tbl[1:] - tbl[:-1]
    sval = 2.0 * float(jnp.sum(d * d))
    np.testing.assert_allclose(float(loss), 1.5 + sval, rtol=1e-6)
    np.testing.assert_allclose(float(aux["reg"]), 0.25 + sval, rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(grads["model"]["w"]), np.zeros(3, np.float32)
    )
    g_ref = jax.grad(
        lambda t: 2.0 * jnp.sum((t[1:] - t[:-1]) ** 2)
    )(tbl)
    np.testing.assert_allclose(
        np.asarray(grads["code_library"]["embedding_instance_articulation"]["embedding"]),
        np.asarray(g_ref),
        rtol=1e-6,
    )


def test_checkpoint_roundtrip(tmp_path):
    from aon_tpu.train.checkpoint import CheckpointManager

    system = _vanilla_system()
    state = system.init_state(jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path), save_top_k=2)
    mgr.save_last(state, epoch=0)
    mgr.save_ranked(state, epoch=0, val_psnr=20.0)
    mgr.save_ranked(state, epoch=1, val_psnr=25.0)
    mgr.save_ranked(state, epoch=2, val_psnr=22.0)
    # top-2 retention: epoch 0 (psnr 20) evicted
    names = {r["name"] for r in mgr._index["ranked"]}
    assert names == {"epoch=1.ckpt", "epoch=2.ckpt"}
    assert mgr.best()["epoch"] == 1

    fresh = system.init_state(jax.random.PRNGKey(42))
    restored = mgr.restore(fresh, "last.ckpt")
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_cli_smoke_fit_and_eval(tmp_path):
    """End-to-end: fixture dataset -> run.py fit -> run.py --run_eval."""
    fixture = tmp_path / "data"
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(fixture),
         "--n", "3", "--wh", "32", "24"],
        check=True,
    )
    cfg = {
        "dataset_name": "sapien",
        "root_dir": str(fixture),
        "exp_name": "pytest_smoke",
        "exp_type": "vanilla",
        "img_wh": [32, 24],
        "white_back": True,
        "N_samples": 8,
        "N_importance": 8,
        "batch_size": 128,
        "num_epochs": 1,
        "run_max_steps": 10,
        "log_every_n_steps": 5,
        "compute_dtype": "float32",
        "chunk": 768,
        "output_path": str(tmp_path / "results"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = {
        "JAX_PLATFORMS": "cpu",
        # 2 virtual devices: the smoke test drives the CLI + sharded trainer
        # end-to-end; 8-dev execution is covered by the parity tests and is
        # needlessly slow here on 1-core hosts.
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    r = subprocess.run(
        [sys.executable, str(REPO / "run.py"), "--config", str(cfg_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "results" / "pytest_smoke" / "last.ckpt").is_dir()

    r2 = subprocess.run(
        [sys.executable, str(REPO / "run.py"), "--config", str(cfg_path),
         "--run_eval", "--render_name", "testren"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    results = json.loads((tmp_path / "ckpts" / "pytest_smoke" / "results.json").read_text())
    assert "PSNR" in results and "SSIM" in results


def test_config_routed_optimizer_radam(eight_devices):
    """Config-driven radam + cosine (factories wired through make_optimizer)."""
    from aon_tpu.parallel import get_mesh, shard_ray_batch
    from aon_tpu.train.systems import VanillaSystem
    from aon_tpu.utils.config import Config

    cfg = Config(
        batch_size=64, N_samples=8, N_importance=8, compute_dtype="float32",
        optimizer="radam", lr_scheduler="cosine",
    )
    system = VanillaSystem(cfg, 2.0, 6.0, True)
    # cosine schedule actually routed (nerf_loglerp starts at lr_init*delay_mult)
    np.testing.assert_allclose(float(system.lr_schedule(0)), cfg.lr_init, rtol=1e-6)
    state = system.init_state(jax.random.PRNGKey(0))
    before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    batch = shard_ray_batch(_host_batch(), get_mesh(2))
    state, m = system.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["train/loss"]))
    after = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(before, after)


def test_make_optimizer_default_matches_live_path():
    from aon_tpu.train.schedule import nerf_lr_schedule
    from aon_tpu.train.systems import make_optimizer
    from aon_tpu.utils.config import Config

    cfg = Config()
    _, sched = make_optimizer(cfg)
    ref = nerf_lr_schedule(cfg.lr_init, cfg.lr_final, cfg.lr_delay_steps,
                           cfg.lr_delay_mult, cfg.run_max_steps)
    for step in (0, 500, 2500, 50000):
        np.testing.assert_allclose(float(sched(step)), float(ref(step)), rtol=1e-6)


def test_make_optimizer_ranger_raises():
    from aon_tpu.train.systems import make_optimizer
    from aon_tpu.utils.config import Config

    with pytest.raises(ValueError, match="ranger"):
        make_optimizer(Config(optimizer="ranger"))


def test_resume_stream_not_replayed(tmp_path):
    """A resumed run must draw fresh batches, not replay the step-0 stream
    (VERDICT r1 item 7: fold global_step into the data-iterator seed)."""
    from aon_tpu.train.trainer import Trainer
    from aon_tpu.utils.config import Config

    fixture = tmp_path / "data"
    subprocess.run(
        [sys.executable, str(REPO / "scripts/make_fixture_dataset.py"), str(fixture),
         "--n", "2", "--wh", "16", "12"],
        check=True,
    )
    cfg = Config(
        dataset_name="sapien", root_dir=str(fixture), img_wh=[16, 12],
        N_samples=4, N_importance=4, batch_size=32, compute_dtype="float32",
        output_path=str(tmp_path / "results"), exp_name="resume_seed",
    )
    tr = Trainer(cfg)
    b0 = next(tr._train_iterator())
    tr.global_step = 7
    b7 = next(tr._train_iterator())
    assert not np.allclose(b0["rays_o"], b7["rays_o"])
    tr.global_step = 0
    again = next(tr._train_iterator())
    np.testing.assert_array_equal(b0["rays_o"], again["rays_o"])


def test_collapse_sentinel_trips_on_frozen_val():
    """Bit-identical val/psnr for N consecutive val epochs must abort the run
    (round-4 incident: laptop_ae_aabb24_100k collapsed to an empty render at
    step ~3000, val frozen at 20.491 dB, and burned 70 TPU-minutes)."""
    import pytest

    from aon_tpu.train.trainer import CollapseSentinel, TrainingCollapsed

    s = CollapseSentinel(limit=4)
    for v in [17.8, 20.491, 20.491, 20.491]:  # only a run of 3 equals
        s.update(v, step=0)
    with pytest.raises(TrainingCollapsed, match="bit-identical"):
        s.update(20.491, step=6000)  # 4th consecutive equal value


def test_collapse_sentinel_ignores_healthy_and_disabled():
    from aon_tpu.train.trainer import CollapseSentinel

    s = CollapseSentinel(limit=4)
    for v in [17.887, 18.496, 16.838, 17.39, 17.786, 16.436]:  # real 24k run
        s.update(v, step=0)
    # near-equal but not bit-identical values never count as repeats
    s2 = CollapseSentinel(limit=2)
    for v in [20.4910001, 20.4910002, 20.4910003]:
        s2.update(v, step=0)
    # limit=0 disables entirely, even on a truly frozen stream
    s3 = CollapseSentinel(limit=0)
    for _ in range(64):
        s3.update(20.491, step=0)


def test_plateau_sentinel_trips_on_drift_plateau():
    """Slow-drift plateaus (the collapse sentinel's blind spot, caught live
    in round 4: AE 100k drifted 16.35-16.58 dB for 50k+ steps, never
    bit-identical) must abort when plateau_abort is set."""
    import pytest

    from aon_tpu.train.trainer import PlateauSentinel, TrainingPlateaued

    s = PlateauSentinel(epochs=4, eps_db=0.3, floor_psnr=25.0, start_step=12000, abort=True)
    # pre-start_step values are ignored entirely
    s.update(18.2, step=1500)
    s.update(17.9, step=3000)
    # the actual AE 100k drift pattern: oscillating within ~0.2 dB
    drift = [16.43, 16.58, 16.38, 16.51]
    for i, v in enumerate(drift):
        s.update(v, step=13500 + 1500 * i)
    with pytest.raises(TrainingPlateaued, match="plateaued"):
        s.update(16.47, step=21000)  # 5th epoch: best gained < eps over last 4


def test_plateau_sentinel_spares_healthy_and_converged_runs():
    import warnings

    from aon_tpu.train.trainer import PlateauSentinel

    # a healthy run (the real 24k AE trajectory: sharp transition at ~18k).
    # start_step must sit past the expected transition window — counting
    # from step 0 would flag the normal pre-transition plateau.
    s = PlateauSentinel(epochs=4, eps_db=0.3, floor_psnr=25.0, start_step=12000, abort=True)
    healthy = [17.8, 17.2, 16.9, 17.0, 17.5, 18.1, 17.9, 18.0, 21.3, 28.4, 29.6, 29.8, 30.0, 30.2]
    for i, v in enumerate(healthy):
        s.update(v, step=1500 * (i + 1))
    # a converged run above the floor never trips even when flat
    s2 = PlateauSentinel(epochs=2, eps_db=0.3, floor_psnr=25.0, abort=True)
    for i, v in enumerate([29.6, 29.61, 29.60, 29.62, 29.61, 29.60]):
        s2.update(v, step=1500 * (i + 1))
    # abort=False warns instead of raising
    s3 = PlateauSentinel(epochs=2, eps_db=0.3, floor_psnr=25.0, abort=False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        for i, v in enumerate([16.4, 16.5, 16.45, 16.5]):
            s3.update(v, step=1500 * (i + 1))
        assert any("plateaued" in str(x.message) for x in w)
    # epochs=0 disables
    s4 = PlateauSentinel(epochs=0, abort=True)
    for _ in range(64):
        s4.update(16.4, step=99000)
