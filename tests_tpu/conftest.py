"""Hardware-gated kernel parity tests (VERDICT r1 item 5).

Unlike tests/ (which forces an 8-device virtual CPU mesh), this tree runs
against the REAL backend: every Pallas kernel is compiled by Mosaic and
compared to its flax/XLA reference at fp32, so hardware numerics (sine
range reduction, bf16 MXU passes) are CI facts rather than bench folklore.

Run with:  python -m pytest tests_tpu/ -q      (skips itself off-TPU)
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a real TPU backend")
        for item in items:
            item.add_marker(skip)
