"""Config surface tests: reference-compatible CLI + JSON-wins overlay."""

import json

from aon_tpu.utils.config import Config, get_config


def test_defaults_match_reference_live_values():
    cfg = Config()
    assert cfg.N_samples == 64 and cfg.N_importance == 128  # live (dead upstream)
    assert cfg.N_max_objs == 151 and cfg.N_obj_code_length == 128
    assert cfg.chunk == 16 * 240
    assert cfg.lr_init == 5.0e-4 and cfg.lr_final == 5.0e-6
    assert cfg.lr_delay_steps == 2500 and cfg.lr_delay_mult == 0.01
    assert cfg.run_max_steps == 100000
    assert cfg.samples_per_epoch == 4000


def test_json_overrides_cli(tmp_path, capsys):
    """opt.py:210-222 semantics: JSON wins over CLI (we warn)."""
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"exp_name": "from_json", "batch_size": 512}))
    cfg = get_config(["--config", str(p), "--exp_name", "from_cli", "--batch_size", "64"])
    assert cfg.exp_name == "from_json"
    assert cfg.batch_size == 512
    err = capsys.readouterr().err
    assert "overrides CLI" in err


def test_cli_only_values_and_bools(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"dataset_name": "sapien_multi"}))
    cfg = get_config(
        ["--config", str(p), "--run_eval", "--white_back", "--render_name", "x",
         "--img_wh", "320", "240"]
    )
    assert cfg.run_eval is True and cfg.white_back is True
    assert cfg.render_name == "x"
    assert cfg.img_wh == [320, 240]
    assert cfg.dataset_name == "sapien_multi"


def test_num_gpus_maps_to_num_devices(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"num_gpus": 4}))
    cfg = get_config(["--config", str(p)])
    assert cfg.num_devices == 4


def test_unknown_json_keys_ignored_with_warning(tmp_path, capsys):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"use_tcnn": True, "exp_name": "ok"}))  # vestigial ref flag
    cfg = get_config(["--config", str(p)])
    assert cfg.exp_name == "ok"
    assert "ignoring unknown" in capsys.readouterr().err


def test_ae_tightening_anneal_hazard_warning():
    """The AE + interval-tightening collapse hazard (ROADMAP item 5) must
    warn at config time when the anneal does not scale with the schedule."""
    import warnings

    from aon_tpu.utils.config import Config

    hazard = dict(exp_type="vanilla_ae_art", use_aabb=True,
                  run_max_steps=100000, aabb_warmup_steps=8000)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Config(**hazard)
    assert any("aabb_warmup_steps" in str(x.message) for x in w)

    # the proven 1/3 ratio, eval mode, and untightened runs stay silent
    for ok in (
        dict(hazard, aabb_warmup_steps=33000),
        dict(hazard, run_eval=True),
        dict(hazard, use_aabb=False),
        dict(exp_type="vanilla_autodecoder", use_aabb=True),
    ):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Config(**ok)
        assert not [x for x in w if "aabb_warmup_steps" in str(x.message)], ok
