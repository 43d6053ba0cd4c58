"""Pluggable metric sinks (aon_tpu/train/sinks.py).

The TensorBoard sink hand-encodes Event protos + masked-crc32c record
framing with no tensorboard/TF dependency; validated here against the REAL
tensorboard event-file loader (installed in this image).  Reference logs
the same scalars to wandb (run.py:12,75; utils/train_helper.py:138-159).
"""

import json

import numpy as np
import pytest

from aon_tpu.train.logging import MetricLogger
from aon_tpu.train.sinks import (
    Sink,
    _crc32c,
    make_sink,
    register_sink,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_tensorboard_sink_readable_by_real_loader(tmp_path):
    from tensorboard.backend.event_processing import event_file_loader

    logger = MetricLogger(str(tmp_path), sinks=["jsonl", "tensorboard"])
    logger.log(10, {"train/loss": 0.5, "train/psnr1": 21.25})
    logger.log(20, {"val/psnr": 30.5, "note": "skip-me"})  # non-float skipped
    logger.close()

    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert len(files) == 1
    events = list(
        event_file_loader.EventFileLoader(str(files[0])).Load()
    )
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            # the loader's data-compat pass migrates simple_value into a
            # rank-0 tensor proto with "scalars" plugin metadata
            val = (v.tensor.float_val[0] if v.tensor.float_val
                   else v.simple_value)
            scalars[(ev.step, v.tag)] = val
    assert scalars[(10, "train/loss")] == pytest.approx(0.5)
    assert scalars[(10, "train/psnr1")] == pytest.approx(21.25)
    assert scalars[(20, "val/psnr")] == pytest.approx(30.5)
    assert (20, "note") not in scalars

    # jsonl sink wrote the same records (the evidence format)
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[0]["step"] == 10 and recs[0]["train/loss"] == 0.5


def test_registry_and_custom_sink(tmp_path):
    seen = []

    class Capture(Sink):
        def __init__(self, logdir):
            pass

        def log_scalars(self, step, rec):
            seen.append((step, rec.get("x")))

    register_sink("capture", Capture)
    logger = MetricLogger(str(tmp_path), sinks=["capture"])
    logger.log(3, {"x": 1.5})
    logger.close()
    assert seen == [(3, 1.5)]

    with pytest.raises(ValueError, match="unknown metric sink"):
        make_sink("nope", str(tmp_path))


def test_logger_defaults_unchanged(tmp_path, capsys):
    """Default sink set (jsonl + stdout) preserves the round-1..3 contract:
    metrics.jsonl records + stdout lines on force_stdout."""
    logger = MetricLogger(str(tmp_path), stdout_every=50)
    logger.log(7, {"train/loss": np.float32(0.25)}, force_stdout=True)
    logger.close()
    out = capsys.readouterr().out
    assert "train/loss=0.25" in out
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().splitlines()[0])
    assert rec == {"step": 7, "time": rec["time"], "train/loss": 0.25}
