"""aon_tpu runner — reference-compatible CLI surface.

Same public surface as the reference ``run.py`` (``/root/reference/run.py``):

    python run.py --config configs/nerf_training.json [flags]
    python run.py --config configs/nerf_eval.json --run_eval --render_name X

exp_type dispatch (run.py:20-34): vanilla | vanilla_autodecoder |
vanilla_ae_art; output layout: results/{exp_name} checkpoints + metrics,
ckpts/{exp_name}/{render_name} eval artifacts + results.json.
"""

import os

if os.environ.get("JAX_PLATFORMS"):
    # The image's axon sitecustomize force-registers the TPU backend at
    # interpreter start, which makes jax ignore the JAX_PLATFORMS env var;
    # the programmatic config override still wins (same trick as
    # tests/conftest.py).  Lets `JAX_PLATFORMS=cpu python run.py ...` run
    # on host while the chip is busy.
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from aon_tpu.parallel.mesh import maybe_initialize_distributed
from aon_tpu.train.trainer import Trainer
from aon_tpu.utils.config import get_config


# Error-message markers of TRANSIENT device-relay failures (the axon tunnel
# serves compile/execute over local HTTP and occasionally drops a response
# mid-read or resets the connection).  These are environment hiccups, not
# program bugs: convert them to the watchdog exit code so
# scripts/train_resilient.py relaunches with --ckpt_path last.ckpt.
_TRANSIENT_RELAY_MARKERS = (
    "remote_compile",
    "remote_execute",
    "response body closed",
    "connection reset",
    "connection refused",
    "broken pipe",
    "EOF",
)


def _is_transient_relay_error(e: Exception) -> bool:
    msg = str(e).lower()
    return type(e).__name__ == "JaxRuntimeError" and any(
        m.lower() in msg for m in _TRANSIENT_RELAY_MARKERS
    )


def main(cfg) -> None:
    from aon_tpu.utils.profiling import maybe_enable_debug_nans
    from aon_tpu.train.trainer import Trainer as _T

    maybe_initialize_distributed()
    maybe_enable_debug_nans(cfg.debug_nans)
    try:
        trainer = Trainer(cfg)
        if cfg.run_eval:
            trainer.test()
        else:
            resume = cfg.ckpt_path is not None
            trainer.fit(resume=resume)
    except Exception as e:
        if cfg.watchdog_timeout and _is_transient_relay_error(e):
            print(
                f"[relay] transient device-relay failure: {e}\n"
                f"[relay] exiting {_T.WATCHDOG_EXIT_CODE} for resumable "
                "relaunch (--ckpt_path last.ckpt)",
                flush=True,
            )
            raise SystemExit(_T.WATCHDOG_EXIT_CODE)
        raise


if __name__ == "__main__":
    main(get_config())
