"""Pallas RNN sequence kernel parity vs the lax.scan reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.ops.pallas.rnn_kernel import rnn_sequence_pallas
from speech_recognition_tpu.ops.rnn import cell_step, init_state


def _scan_reference(rnn_type, x_proj, mask, rk, rb, init, reverse):
    def body(state, inp):
        x_t, m_t = inp
        h_new, new_state = cell_step(rnn_type, x_t, state, rk, rb, rk.shape[0])
        m = m_t.astype(h_new.dtype)
        new_state = tuple(m * ns + (1.0 - m) * os for ns, os in zip(new_state, state))
        return new_state, h_new * m

    final, outs = jax.lax.scan(body, init, (x_proj, mask), reverse=reverse)
    return outs, final


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_rnn_matches_scan(rnn_type, reverse):
    rng = np.random.default_rng(0)
    T, B, H = 9, 4, 8
    gates = 4 if rnn_type == "lstm" else 3
    x_proj = jnp.asarray(rng.standard_normal((T, B, gates * H)), jnp.float32)
    rk = jnp.asarray(rng.standard_normal((H, gates * H)) * 0.1, jnp.float32)
    rb = jnp.asarray(rng.standard_normal(gates * H) * 0.1, jnp.float32) if rnn_type == "gru" else None
    lengths = np.array([9, 6, 1, 9])
    mask = (np.arange(T)[:, None] < lengths[None, :])[:, :, None]
    mask = jnp.asarray(mask, jnp.float32)
    init = init_state(rnn_type, B, H, jnp.float32)

    out_p, state_p = rnn_sequence_pallas(
        rnn_type, x_proj, mask, rk, rb, initial_state=init, reverse=reverse, interpret=True
    )
    out_s, state_s = _scan_reference(rnn_type, x_proj, mask, rk, rb, init, reverse)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=1e-5, atol=1e-6)
    for a, b in zip(state_p, state_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_pallas_rnn_nonzero_init():
    rng = np.random.default_rng(1)
    T, B, H = 5, 2, 4
    x_proj = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    rk = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
    mask = jnp.ones((T, B, 1), jnp.float32)
    init = (jnp.asarray(rng.standard_normal((B, H)), jnp.float32),
            jnp.asarray(rng.standard_normal((B, H)), jnp.float32))
    out_p, state_p = rnn_sequence_pallas("lstm", x_proj, mask, rk, None, initial_state=init, interpret=True)
    out_s, state_s = _scan_reference("lstm", x_proj, mask, rk, None, init, False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s), rtol=1e-5, atol=1e-6)
