"""Transducer model family: forward shapes, loss finiteness + gradient
flow, dense-lattice loss equivalence, greedy decode mechanics, config
registry, and a full train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speech_recognition_tpu.models import Transducer


def _mini_model(**over):
    kw = dict(
        vocab_size=23,
        encoder_dim=16,
        num_encoder_layers=2,
        num_attention_heads=2,
        conv_kernel_size=5,
        ffn_expansion=2,
        subsample_channels=(4, 4),
        pred_dim=8,
        num_pred_layers=1,
        joint_dim=12,
        dropout=0.0,
        blank_index=0,
        pad_index=0,
    )
    kw.update(over)
    return Transducer(**kw)


def _batch(key, B=2, T=50, F=20, C=3, U=5, V=23):
    ka, kt = jax.random.split(key)
    audio = jax.random.uniform(ka, (B, T, F, C), minval=0.1)
    audio = audio.at[1, 37:].set(0.0)  # padded tail
    # BOS=1-led prediction input, EOS=2-led targets, 0-padded
    tokens = jnp.array([[1, 5, 9, 12, 2, 0], [1, 7, 2, 0, 0, 0]], jnp.int32)
    return audio, tokens[:, :-1], tokens[:, 1:]


def test_forward_output_structure():
    model = _mini_model()
    audio, dec_in, y_true = _batch(jax.random.PRNGKey(0))
    variables = model.init({"params": jax.random.PRNGKey(1)}, (audio, dec_in))
    out = model.apply(variables, (audio, dec_in))
    B, U1 = dec_in.shape
    assert out["enc_proj"].shape[0] == B and out["enc_proj"].shape[2] == model.joint_dim
    assert out["pred_proj"].shape == (B, U1, model.joint_dim)
    assert out["joint_kernel"].shape == (model.joint_dim, model.vocab_size)
    assert out["frame_lens"].shape == (B,)
    assert int(out["frame_lens"][0]) > int(out["frame_lens"][1]) > 0


def test_loss_matches_dense_lattice():
    """The model loss (streamed joint + lattice DP) equals the same loss
    computed from the dense [B, T', U1, V] log-softmax lattice."""
    from speech_recognition_tpu.ops.transducer import (
        joint_log_planes_dense,
        transducer_loss,
    )

    model = _mini_model()
    audio, dec_in, y_true = _batch(jax.random.PRNGKey(2))
    variables = model.init({"params": jax.random.PRNGKey(3)}, (audio, dec_in))
    out = model.apply(variables, (audio, dec_in))
    loss = model.get_loss_fn()(y_true, out)

    # EOS is not a transducer label (see Transducer.get_loss_fn)
    ids = jnp.where(y_true == 0, 0, y_true)[:, :-1]
    label_lens = jnp.sum(y_true != 0, axis=-1) - 1
    lpb, lpe = joint_log_planes_dense(
        0, out["enc_proj"], out["pred_proj"], out["joint_kernel"], out["joint_bias"], ids
    )
    per = transducer_loss(lpb, lpe, out["frame_lens"], label_lens)
    want = jnp.mean(per / label_lens)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_train_step_runs_and_grads_flow():
    from speech_recognition_tpu.train import TrainState, make_train_step

    model = _mini_model(dropout=0.1)
    audio, dec_in, y_true = _batch(jax.random.PRNGKey(4))
    variables = model.init({"params": jax.random.PRNGKey(5)}, (audio, dec_in))
    state = TrainState.create(dict(variables), optax.adam(1e-3))
    # the train step donates its input state -> snapshot params to host first
    before = jax.tree_util.tree_map(np.asarray, state.params)
    step = make_train_step(model, model.get_loss_fn(), model.get_metrics())
    state2, metrics = step(state, (audio, dec_in), y_true, jax.random.PRNGKey(6))
    assert np.isfinite(float(metrics["loss"]))
    # every parameter leaf moved (gradient flow through enc/pred/joint)
    moved = [
        bool(np.any(a != np.asarray(b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(state2.params)
        )
    ]
    assert all(moved), f"{sum(moved)}/{len(moved)} leaves updated"


def test_padded_rows_contribute_nothing():
    """An all-pad row (short final batch padding) leaves loss unchanged."""
    model = _mini_model()
    audio, dec_in, y_true = _batch(jax.random.PRNGKey(7))
    variables = model.init({"params": jax.random.PRNGKey(8)}, (audio, dec_in))
    loss_fn = model.get_loss_fn()
    base = loss_fn(y_true, model.apply(variables, (audio, dec_in)))

    pad_audio = jnp.concatenate([audio, jnp.full_like(audio[:1], 1e-3)], axis=0)
    pad_dec = jnp.concatenate([dec_in, jnp.zeros_like(dec_in[:1])], axis=0)
    pad_y = jnp.concatenate([y_true, jnp.zeros_like(y_true[:1])], axis=0)
    padded = loss_fn(pad_y, model.apply(variables, (pad_audio, pad_dec)))
    # mean over valid rows only -> adding an all-pad row with SOME audio
    # changes nothing
    np.testing.assert_allclose(float(padded), float(base), rtol=1e-5)


def test_greedy_search_mechanics():
    from speech_recognition_tpu.search import TransducerSearcher

    model = _mini_model()
    audio, dec_in, _ = _batch(jax.random.PRNGKey(9))
    variables = model.init({"params": jax.random.PRNGKey(10)}, (audio, dec_in))
    searcher = TransducerSearcher(model, dict(variables), max_token_length=8, bos_id=1, eos_id=2)
    tokens, prob = searcher.greedy_search(audio)
    tokens, prob = np.asarray(tokens), np.asarray(prob)
    assert tokens.shape == (2, 8) and prob.shape == (2,)
    assert np.all((prob > 0) & (prob <= 1.0))
    # emitted ids are valid vocab, never blank/pad in the buffer beyond
    # emitted count; buffer tail is pad
    assert tokens.dtype == np.int32
    assert np.all(tokens >= 0) and np.all(tokens < model.vocab_size)


def test_greedy_against_host_reference():
    """Device greedy == a step-by-step numpy/jnp host reference on the same
    params (single example, no padding subtleties)."""
    from speech_recognition_tpu.search import TransducerSearcher

    model = _mini_model()
    rng = jax.random.PRNGKey(11)
    audio = jax.random.uniform(rng, (1, 50, 20, 3), minval=0.1)
    dec_in = jnp.array([[1, 3, 4, 0, 0]], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(12)}, (audio, dec_in))
    L = 6
    searcher = TransducerSearcher(model, dict(variables), max_token_length=L, bos_id=1, eos_id=2)
    got_tokens, got_prob = searcher.greedy_search(audio)

    # host reference using model methods
    enc_proj, frame_lens = model.apply(dict(variables), audio, method=Transducer.encode)
    enc_proj = np.asarray(enc_proj, np.float32)
    T = int(frame_lens[0])
    emb, cells, wp, wo, bo = searcher._pred_params()

    def pred(tok_hist):
        toks = jnp.array([tok_hist], jnp.int32)  # [1, n]
        states = tuple(
            (jnp.zeros((1, model.pred_dim)), jnp.zeros((1, model.pred_dim)))
            for _ in cells
        )
        g = None
        for i in range(toks.shape[1]):
            g, states = searcher._pred_step(toks[:, i], states, emb, cells, wp)
        return np.asarray(g, np.float32)

    hist = [1]
    out, logp, t, emitted = [], 0.0, 0, 0
    while t < T:
        g = pred(hist)
        z = np.tanh(enc_proj[0, t] + g[0]) @ np.asarray(wo, np.float32) + np.asarray(bo)
        lsm = z - np.log(np.exp(z - z.max()).sum()) - z.max()
        tok = int(np.argmax(lsm))
        logp += lsm[tok]
        if tok == 2:  # eos: lane done
            break
        if tok == model.blank_index or emitted >= L:
            t += 1
            continue
        out.append(tok)
        hist.append(tok)
        emitted += 1

    want = np.zeros(L, np.int32)
    want[: len(out)] = out
    np.testing.assert_array_equal(np.asarray(got_tokens)[0], want)
    np.testing.assert_allclose(float(got_prob[0]), np.exp(logp), rtol=1e-4)


def test_beam_search_shapes_and_order():
    from speech_recognition_tpu.search import TransducerSearcher

    model = _mini_model()
    audio, dec_in, _ = _batch(jax.random.PRNGKey(13))
    variables = model.init({"params": jax.random.PRNGKey(14)}, (audio, dec_in))
    searcher = TransducerSearcher(model, dict(variables), max_token_length=8, bos_id=1, eos_id=2)
    tokens, prob = searcher.beam_search(audio, beam_size=4)
    tokens, prob = np.asarray(tokens), np.asarray(prob)
    assert tokens.shape == (2, 4, 8) and prob.shape == (2, 4)
    # sorted best-first, valid probabilities and vocab ids
    assert np.all(np.diff(prob, axis=1) <= 1e-7)
    assert np.all((prob >= 0) & (prob <= 1.0 + 1e-6))
    assert np.all(tokens >= 0) and np.all(tokens < model.vocab_size)


def test_beam_at_least_greedy():
    """The greedy path is in the beam's search space (per-frame budget >=
    greedy's emissions), so the top beam score must be >= greedy's."""
    from speech_recognition_tpu.search import TransducerSearcher

    model = _mini_model()
    audio, dec_in, _ = _batch(jax.random.PRNGKey(15))
    variables = model.init({"params": jax.random.PRNGKey(16)}, (audio, dec_in))
    L = 6
    searcher = TransducerSearcher(model, dict(variables), max_token_length=L, bos_id=1, eos_id=2)
    _, g_prob = searcher.greedy_search(audio)
    _, b_prob = searcher.beam_search(audio, beam_size=8, max_symbols=L + 1)
    assert np.all(np.asarray(b_prob)[:, 0] >= np.asarray(g_prob) * (1 - 1e-5))


def test_beam_matches_exhaustive_oracle():
    """With beam_size >= the whole hypothesis space, TSD beam search is
    exhaustive: its top-1 must equal a host Viterbi oracle that enumerates
    every label sequence and max-plus DPs its best alignment (including
    EOS-terminated paths)."""
    from itertools import product

    from speech_recognition_tpu.search import TransducerSearcher

    # ids: 0 blank/pad, 2 eos; every other id (incl. bos=1) is a label in
    # decode, exactly as in greedy.  T'=1 encoder frame + Lmax=2 keeps the
    # full hypothesis space (42) under beam_size=64 -> zero pruning.
    V, Lmax, LABELS = 6, 2, (1, 3, 4, 5)
    model = _mini_model(vocab_size=V)
    rng = jax.random.PRNGKey(17)
    audio = jax.random.uniform(rng, (1, 8, 20, 3), minval=0.1)  # -> 1 enc frame
    dec_in = jnp.array([[1, 3, 0]], jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(18)}, (audio, dec_in))
    searcher = TransducerSearcher(model, dict(variables), max_token_length=Lmax, bos_id=1, eos_id=2)
    b_tokens, b_prob = searcher.beam_search(audio, beam_size=64, max_symbols=Lmax + 1)

    enc_proj, frame_lens = model.apply(dict(variables), audio, method=Transducer.encode)
    enc = np.asarray(enc_proj, np.float32)[0]
    T = int(frame_lens[0])
    wo = np.asarray(variables["params"]["joint_kernel"], np.float32)
    bo = np.asarray(variables["params"]["joint_bias"], np.float32)

    def lsm_row(t, g_u):
        z = np.tanh(enc[t] + g_u) @ wo + bo
        return z - (np.log(np.exp(z - z.max()).sum()) + z.max())

    best, best_seq = -np.inf, ()
    for m in range(Lmax + 1):
        for y in product(LABELS, repeat=m):
            toks = jnp.array([[1, *y]], jnp.int32)
            g = np.asarray(
                model.apply(dict(variables), toks, method=Transducer.predict_sequence),
                np.float32,
            )[0]  # [m+1, J]
            lsm = np.stack([[lsm_row(t, g[u]) for u in range(m + 1)] for t in range(T)])
            alpha = np.full((T + 1, m + 1), -np.inf)
            alpha[0, 0] = 0.0
            for t in range(T):
                for u in range(m + 1):
                    if alpha[t, u] == -np.inf:
                        continue
                    alpha[t + 1, u] = max(alpha[t + 1, u], alpha[t, u] + lsm[t, u, 0])
                    if u < m:
                        alpha[t, u + 1] = max(alpha[t, u + 1], alpha[t, u] + lsm[t, u, int(y[u])])
            score = alpha[T, m]  # all frames consumed by blanks
            for t in range(T):  # or EOS-terminated at any (t, m) node
                if alpha[t, m] > -np.inf:
                    score = max(score, alpha[t, m] + lsm[t, m, 2])
            if score > best:
                best, best_seq = score, y
    np.testing.assert_allclose(float(np.log(np.asarray(b_prob)[0, 0])), best, atol=1e-4)
    want = np.zeros(Lmax, np.int32)
    want[: len(best_seq)] = best_seq
    np.testing.assert_array_equal(np.asarray(b_tokens)[0, 0], want)


def test_config_registry(tmp_path):
    from speech_recognition_tpu.configs import get_model_config
    from speech_recognition_tpu.configs.data_config import ConfigValidationError

    cfg = tmp_path / "t.yml"
    cfg.write_text(
        "model_name: transducer\nvocab_size: 100\nencoder_dim: 16\n"
        "num_encoder_layers: 1\nnum_attention_heads: 2\nconv_kernel_size: 3\n"
        "ffn_expansion: 2\nsubsample_channels: [4]\npred_dim: 8\n"
        "num_pred_layers: 1\njoint_dim: 8\ndropout: 0.0\nblank_index: 0\npad_index: 0\n"
    )
    mc = get_model_config(str(cfg))
    model = mc.create_model()
    assert isinstance(model, Transducer) and model.vocab_size == 100

    bad = tmp_path / "bad.yml"
    bad.write_text(cfg.read_text().replace("num_attention_heads: 2", "num_attention_heads: 3"))
    with pytest.raises(ConfigValidationError):
        get_model_config(str(bad))
