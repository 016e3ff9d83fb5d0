"""EMA: shadow weights ramp toward the online weights and drive eval."""
import jax
import jax.numpy as jnp
import numpy as np

from mm_training_tpu.training.ema import ema_update
from mm_training_tpu.training.train_step import TrainState, _eval_weights
from mm_training_tpu.configs import tiny_test_config


def test_ema_update_ramp():
    ema = {'w': jnp.zeros(3)}
    new = {'w': jnp.ones(3)}
    # early steps: decay ~ 0 -> ema follows new almost exactly
    out1 = ema_update(ema, new, jnp.asarray(1), decay=0.9999)
    np.testing.assert_allclose(np.asarray(out1['w']), 1.0, atol=1e-3)
    # late steps: decay ~ 0.9999 -> ema barely moves
    out2 = ema_update(ema, new, jnp.asarray(100_000), decay=0.9999)
    np.testing.assert_allclose(np.asarray(out2['w']), 1e-4, rtol=0.05)


def test_ema_update_skips_non_float():
    ema = {'w': jnp.zeros(2), 'n': jnp.asarray([1, 2], jnp.int32)}
    new = {'w': jnp.ones(2), 'n': jnp.asarray([3, 4], jnp.int32)}
    out = ema_update(ema, new, jnp.asarray(1000))
    np.testing.assert_array_equal(np.asarray(out['n']), [3, 4])


def test_eval_weights_selects_ema():
    params = {'w': jnp.ones(2)}
    ema = {'w': jnp.full(2, 5.0)}
    state = TrainState(step=jnp.asarray(1), params=params, batch_stats={},
                       opt_state=None, ema_params=ema, ema_batch_stats={})
    cfg = tiny_test_config(use_ema=True)
    w, _ = _eval_weights(cfg, state)
    np.testing.assert_array_equal(np.asarray(w['w']), 5.0)
    cfg = tiny_test_config(use_ema=False)
    w, _ = _eval_weights(cfg, state)
    np.testing.assert_array_equal(np.asarray(w['w']), 1.0)
