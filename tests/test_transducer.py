"""RNN-T lattice loss: brute-force oracle values, custom-VJP vs autodiff
gradients, padding invariance, and jit/vmap mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.ops.transducer import (
    _alpha_scan,
    _loss_core,
    transducer_loss,
    transducer_loss_oracle,
)


def _random_planes(key, B, T, U):
    kb, ke = jax.random.split(key)
    # realistic: rows are log-probs of disjoint events, keep them negative
    lp_blank = jax.nn.log_sigmoid(jax.random.normal(kb, (B, T, U + 1)))
    lp_emit = jax.nn.log_sigmoid(jax.random.normal(ke, (B, T, U)))
    return lp_blank.astype(jnp.float32), lp_emit.astype(jnp.float32)


def test_loss_matches_bruteforce_oracle():
    B, T, U = 3, 5, 3
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(0), B, T, U)
    frame_lens = jnp.array([5, 4, 3], jnp.int32)
    label_lens = jnp.array([3, 2, 0], jnp.int32)
    got = jax.jit(transducer_loss)(lp_blank, lp_emit, frame_lens, label_lens)
    want = transducer_loss_oracle(lp_blank, lp_emit, frame_lens, label_lens)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_loss_single_path_closed_form():
    """U = 0: the only path is all blanks — loss = -sum(lp_blank[:, u=0])."""
    B, T = 2, 6
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(1), B, T, 2)
    frame_lens = jnp.array([6, 4], jnp.int32)
    label_lens = jnp.zeros((B,), jnp.int32)
    got = transducer_loss(lp_blank, lp_emit, frame_lens, label_lens)
    t = np.arange(T)[None, :]
    mask = t < np.asarray(frame_lens)[:, None]
    want = -(np.asarray(lp_blank)[:, :, 0] * mask).sum(axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff():
    """The analytic occupancy backward == autodiff of the same alpha scan."""
    B, T, U = 4, 7, 4
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(2), B, T, U)
    frame_lens = jnp.array([7, 6, 5, 7], jnp.int32)
    label_lens = jnp.array([4, 3, 1, 0], jnp.int32)
    cot = jax.random.normal(jax.random.PRNGKey(3), (B,))

    def plain(lb, le):
        return _loss_core(lb, le, frame_lens, label_lens)[0]

    def fused(lb, le):
        return transducer_loss(lb, le, frame_lens, label_lens)

    gb_a, ge_a = jax.vjp(plain, lp_blank, lp_emit)[1](cot)
    gb_f, ge_f = jax.vjp(fused, lp_blank, lp_emit)[1](cot)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_a), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ge_f), np.asarray(ge_a), rtol=1e-4, atol=1e-6)
    # out-of-range slots get exactly zero gradient
    assert np.all(np.asarray(gb_f)[2, :, 2:] == 0)  # label_len 1 -> u <= 1
    assert np.all(np.asarray(ge_f)[1, 6:, :] == 0)  # frame_len 6


def test_gradients_are_occupancies():
    """With g = 1 the emit/blank grads are minus edge-occupancy
    probabilities: each lattice anti-chain's occupancies sum to 1 — check
    the per-t cut: sum_u occ_blank[t] + "emit edges crossing t" == 1 is
    complex; instead verify total blank occupancy == E[#blanks] == T_b."""
    B, T, U = 2, 6, 3
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(4), B, T, U)
    frame_lens = jnp.array([6, 5], jnp.int32)
    label_lens = jnp.array([3, 2], jnp.int32)
    gb, ge = jax.grad(
        lambda lb, le: transducer_loss(lb, le, frame_lens, label_lens).sum(),
        argnums=(0, 1),
    )(lp_blank, lp_emit)
    # every path consumes exactly T_b blanks and U_b emits
    np.testing.assert_allclose(
        -np.asarray(gb).sum(axis=(1, 2)), np.asarray(frame_lens, np.float32), rtol=1e-5
    )
    np.testing.assert_allclose(
        -np.asarray(ge).sum(axis=(1, 2)), np.asarray(label_lens, np.float32), rtol=1e-5
    )


def test_padding_invariance():
    """Extra padded frames/labels beyond the lens change nothing."""
    B, T, U = 2, 4, 2
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(5), B, T, U)
    frame_lens = jnp.array([4, 3], jnp.int32)
    label_lens = jnp.array([2, 1], jnp.int32)
    base = transducer_loss(lp_blank, lp_emit, frame_lens, label_lens)

    pb = jnp.pad(lp_blank, ((0, 0), (0, 3), (0, 2)), constant_values=-0.37)
    pe = jnp.pad(lp_emit, ((0, 0), (0, 3), (0, 2)), constant_values=-0.11)
    padded = transducer_loss(pb, pe, frame_lens, label_lens)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(base), rtol=1e-6)

    gb = jax.grad(lambda x: transducer_loss(x, pe, frame_lens, label_lens).sum())(pb)
    assert np.all(np.asarray(gb)[:, 4:, :] == 0)


def test_alpha_scan_recursion_identity():
    """alpha satisfies the two-edge recursion pointwise."""
    B, T, U = 1, 4, 3
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(6), B, T, U)
    alpha = np.asarray(_alpha_scan(lp_blank, lp_emit))
    lb, le = np.asarray(lp_blank), np.asarray(lp_emit)
    for t in range(1, T):
        for u in range(U + 1):
            acc = alpha[0, t - 1, u] + lb[0, t - 1, u]
            if u > 0:
                acc = np.logaddexp(acc, alpha[0, t, u - 1] + le[0, t, u - 1])
            np.testing.assert_allclose(alpha[0, t, u], acc, rtol=1e-5)


def test_bf16_inputs_and_finite_at_scale():
    """bf16 planes work (cotangents come back bf16), larger shapes stay
    finite under jit."""
    B, T, U = 8, 64, 16
    lp_blank, lp_emit = _random_planes(jax.random.PRNGKey(7), B, T, U)
    frame_lens = jnp.full((B,), T, jnp.int32)
    label_lens = jnp.full((B,), U, jnp.int32)
    loss = jax.jit(transducer_loss)(lp_blank, lp_emit, frame_lens, label_lens)
    assert np.all(np.isfinite(np.asarray(loss)))

    lb16, le16 = lp_blank.astype(jnp.bfloat16), lp_emit.astype(jnp.bfloat16)
    gb, ge = jax.grad(
        lambda a, b: transducer_loss(a, b, frame_lens, label_lens).sum(), argnums=(0, 1)
    )(lb16, le16)
    assert gb.dtype == jnp.bfloat16 and ge.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(gb, np.float32)))


# ---------------------------------------------------------------------------
# Fused streaming joint planes
# ---------------------------------------------------------------------------


def _joint_setup(key, B, T, U, J, V, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    enc_proj = jax.random.normal(ks[0], (B, T, J), dtype) * 0.5
    pred_proj = jax.random.normal(ks[1], (B, U + 1, J), dtype) * 0.5
    wo = jax.random.normal(ks[2], (J, V), dtype) * 0.3
    bo = jax.random.normal(ks[3], (V,), dtype) * 0.1
    ids = jax.random.randint(ks[4], (B, U), 1, V)
    return enc_proj, pred_proj, wo, bo, ids


def test_joint_planes_match_dense():
    from speech_recognition_tpu.ops.transducer import (
        joint_log_planes,
        joint_log_planes_dense,
    )

    B, T, U, J, V = 2, 5, 3, 8, 11
    args = _joint_setup(jax.random.PRNGKey(20), B, T, U, J, V)
    lpb_f, lpe_f = jax.jit(joint_log_planes, static_argnums=0)(4, *args)
    lpb_d, lpe_d = joint_log_planes_dense(4, *args)
    np.testing.assert_allclose(np.asarray(lpb_f), np.asarray(lpb_d), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lpe_f), np.asarray(lpe_d), rtol=1e-5, atol=1e-6)


def test_joint_planes_custom_vjp_matches_dense_autodiff():
    from speech_recognition_tpu.ops.transducer import (
        joint_log_planes,
        joint_log_planes_dense,
    )

    B, T, U, J, V = 2, 4, 3, 8, 11
    enc_proj, pred_proj, wo, bo, ids = _joint_setup(jax.random.PRNGKey(21), B, T, U, J, V)
    kb, ke = jax.random.split(jax.random.PRNGKey(22))
    cot = (
        jax.random.normal(kb, (B, T, U + 1)),
        jax.random.normal(ke, (B, T, U)),
    )

    def fused(e, p, w, b):
        return joint_log_planes(4, e, p, w, b, ids)

    def dense(e, p, w, b):
        return joint_log_planes_dense(4, e, p, w, b, ids)

    gf = jax.vjp(fused, enc_proj, pred_proj, wo, bo)[1](cot)
    gd = jax.vjp(dense, enc_proj, pred_proj, wo, bo)[1](cot)
    for name, a, b in zip(("enc", "pred", "wo", "bo"), gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6, err_msg=name
        )


def test_joint_planes_end_to_end_loss_grads():
    """Full composition: joint planes -> transducer_loss, fused == dense,
    values and all gradients."""
    from speech_recognition_tpu.ops.transducer import (
        joint_log_planes,
        joint_log_planes_dense,
        transducer_loss,
    )

    B, T, U, J, V = 3, 6, 4, 8, 9
    enc_proj, pred_proj, wo, bo, ids = _joint_setup(jax.random.PRNGKey(23), B, T, U, J, V)
    frame_lens = jnp.array([6, 5, 3], jnp.int32)
    label_lens = jnp.array([4, 2, 0], jnp.int32)

    def loss(planes_fn, e, p, w, b):
        lpb, lpe = planes_fn(0, e, p, w, b, ids)
        return transducer_loss(lpb, lpe, frame_lens, label_lens).sum()

    lf, gf = jax.value_and_grad(lambda *a: loss(joint_log_planes, *a), argnums=(0, 1, 2, 3))(
        enc_proj, pred_proj, wo, bo
    )
    ld, gd = jax.value_and_grad(
        lambda *a: loss(joint_log_planes_dense, *a), argnums=(0, 1, 2, 3)
    )(enc_proj, pred_proj, wo, bo)
    np.testing.assert_allclose(float(lf), float(ld), rtol=1e-6)
    for name, a, b in zip(("enc", "pred", "wo", "bo"), gf, gd):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-5, atol=2e-6, err_msg=name
        )
