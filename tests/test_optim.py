"""Optimizer/scheduler factory tests (reference utils/__init__.py parity)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aon_tpu.train.optim import get_optimizer, get_scheduler


def test_steplr_schedule():
    s = get_scheduler(1e-3, "steplr", num_epochs=40, steps_per_epoch=10,
                      decay_step=[20], decay_gamma=0.1)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(199)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(200)), 1e-4, rtol=1e-6)


def test_cosine_and_poly_schedules_decay():
    for kind in ("cosine", "poly"):
        s = get_scheduler(1e-3, kind, num_epochs=10, steps_per_epoch=10)
        assert float(s(0)) == pytest.approx(1e-3, rel=1e-6)
        assert float(s(100)) < 1e-5


def test_warmup_multiplier_ramp():
    s = get_scheduler(1e-3, "steplr", num_epochs=10, steps_per_epoch=10,
                      decay_step=[100], warmup_epochs=2, warmup_multiplier=2.0)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(10)), 1.5e-3, rtol=1e-5)  # halfway
    np.testing.assert_allclose(float(s(20)), 2e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(50)), 2e-3, rtol=1e-5)  # saturates


@pytest.mark.parametrize("name", ["sgd", "adam", "radam", "ranger"])
def test_optimizer_factory_updates_params(name):
    from aon_tpu.train.optim import wrap_lookahead_params

    tx = get_optimizer(name, lr=1e-2)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.ones((4,))}
    if name == "ranger":
        params = wrap_lookahead_params(params)
        grads = wrap_lookahead_params(grads).fast
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    leaf = new_params.fast["w"] if name == "ranger" else new_params["w"]
    assert not np.allclose(np.asarray(leaf), 1.0)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        get_optimizer("nope")
    with pytest.raises(ValueError):
        get_scheduler(1e-3, "nope")
