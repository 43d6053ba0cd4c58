"""Tracing / profiling hooks (SURVEY §5 aux subsystems).

The reference's only profiling is Lightning ``profiler="simple"`` on one
GPU (run.py:108).  TPU-native replacements:

* ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  Perfetto/TensorBoard-compatible trace of device execution
  (``tensorboard --logdir ...`` or ui.perfetto.dev);
* ``annotate(name)``: TraceAnnotation for custom spans;
* per-step ``rays/sec`` counters are logged by the Trainer already
  (train/trainer.py).

NaN debugging (the reference runs Lightning's ``detect_anomaly=True``): the
Trainer raises on host-visible NaN losses every log interval; for
first-NaN-origin debugging set ``AON_DEBUG_NANS=1`` (or config
``debug_nans``) which enables ``jax_debug_nans`` — every primitive output
is checked and the faulting operation re-run eagerly.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def maybe_enable_debug_nans(flag: bool = False) -> None:
    if flag or os.environ.get("AON_DEBUG_NANS", "0") == "1":
        import jax

        jax.config.update("jax_debug_nans", True)


def start_server(port: int = 9999) -> None:
    """Live profiling server for ``xprof``/TensorBoard capture."""
    import jax

    jax.profiler.start_server(port)
