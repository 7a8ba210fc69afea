"""Train-layer unit tests: LR schedule parity, train/eval step behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from speech_recognition_tpu.train import TrainState, linear_warmup_decay, make_eval_step, make_train_step


def test_schedule_warmup_then_decay_to_min():
    sched = linear_warmup_decay(1000, 1e-3, 1e-5, warmup_steps=100)
    # linear ramp over warmup (clamped below at min_lr, reference utils.py:35)
    np.testing.assert_allclose(float(sched(0)), 1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)), 0.5e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-5)
    # decays and clamps at min_lr (reference utils.py:11-35 & tests/test_utils.py)
    np.testing.assert_allclose(float(sched(2000)), 1e-5, rtol=1e-5)
    assert float(sched(999)) < float(sched(500))


def test_schedule_offset_resume():
    base = linear_warmup_decay(1000, 1e-3, 1e-5, warmup_steps=100)
    shifted = linear_warmup_decay(1000, 1e-3, 1e-5, warmup_steps=100, offset_steps=300)
    np.testing.assert_allclose(float(shifted(0)), float(base(300)), rtol=1e-6)
    np.testing.assert_allclose(float(shifted(200)), float(base(500)), rtol=1e-6)


def test_schedule_warmup_rate_default():
    sched = linear_warmup_decay(1000, 1e-3, 1e-5, warmup_rate=0.1)
    # warmup = total*rate + 1 = 101
    np.testing.assert_allclose(float(sched(101)), 1e-3, rtol=1e-2)


def test_train_step_reduces_loss():
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, training=False):
            return nn.Dense(4)(x)

    model = Tiny()
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    y = jnp.array([1, 2, 3, 0, 1, 2, 3, 1])
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(y_true, logits):
        return optax.softmax_cross_entropy_with_integer_labels(logits, y_true).mean()

    state = TrainState.create(dict(variables), optax.adam(1e-1))
    step = make_train_step(model, loss_fn)
    losses = []
    for i in range(20):
        state, metrics = step(state, x, y, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5
    assert int(state.step) == 20

    eval_step = make_eval_step(model, loss_fn)
    m = eval_step(state, x, y)
    np.testing.assert_allclose(float(m["loss"]), losses[-1], rtol=0.5)


def test_async_metric_accumulator_defers_and_sums():
    """AsyncMetricAccumulator folds device metrics `depth` steps late and
    drains to exact running totals (train/metrics.py)."""
    import jax.numpy as jnp

    from speech_recognition_tpu.train.metrics import AsyncMetricAccumulator

    acc = AsyncMetricAccumulator(depth=3)
    for i in range(10):
        acc.push({"loss": jnp.float32(i), "acc": jnp.float32(2 * i)})
        # never more than depth steps pending, and nothing folds early
        assert len(acc._pending) <= 3
        if i < 3:
            assert acc._totals == {}
    totals = acc.totals()
    assert not acc._pending
    assert totals["loss"] == sum(range(10))
    assert totals["acc"] == 2 * sum(range(10))
    # drain is idempotent; further pushes keep accumulating
    acc.push({"loss": jnp.float32(100.0), "acc": jnp.float32(0.0)})
    assert acc.totals()["loss"] == sum(range(10)) + 100.0
