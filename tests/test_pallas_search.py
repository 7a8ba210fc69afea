"""Fused Pallas greedy-search kernel parity vs the XLA while_loop path.

Interpret-mode math check (the real-chip timing is tools/search_ab.py):
identical tokens and matching perplexities on a bf16 mini LAS, including
padded audio rows (attention masking) and pad-after-EOS feedback.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.models import LAS
from speech_recognition_tpu.search import LASSearcher
from speech_recognition_tpu.ops.pallas.search_kernel import greedy_search_pallas

CHUNK = 8


def _setup(vocab=64, L=12):
    rng = jax.random.PRNGKey(0)
    model = LAS("lstm", vocab, 16, 16, 1, 2, 0.0, 1.0, dtype=jnp.bfloat16)
    audio = jax.random.uniform(rng, (8, 24, 10, 3), maxval=10.0, dtype=jnp.float32)
    # padded tail rows exercise the attention bias path
    audio = audio.at[0, 12:].set(0.0).at[3, 6:].set(0.0)
    tokens = jax.random.randint(rng, (8, L), 0, vocab)
    variables = model.init({"params": rng}, (audio, tokens))
    searcher = LASSearcher(model, variables, max_token_length=L, bos_id=2, eos_id=3)
    return searcher, audio


def _fused_greedy(searcher, audio):
    enc_out, keys, mask, states = searcher._encode(audio)
    emb, qw, qb, ks, rs, bs, vw, vb = searcher._decoder_params()
    with pltpu.force_tpu_interpret_mode():
        return greedy_search_pallas(
            keys, enc_out, mask, qw, qb, emb, vw, vb, ks, rs, bs,
            states[0], states[1], searcher.max_token_length,
            searcher.bos_id, searcher.eos_id, searcher.pad_id, chunk=CHUNK,
        )


def test_pallas_greedy_matches_xla_loop():
    searcher, audio = _setup()
    ref_tokens, ref_ppl = searcher.greedy_search(audio)  # XLA while_loop path
    tok, ppl = _fused_greedy(searcher, audio)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tokens))
    np.testing.assert_allclose(np.asarray(ppl), np.asarray(ref_ppl), rtol=2e-2)


def test_pallas_greedy_pads_after_eos():
    searcher, audio = _setup(vocab=8, L=16)  # tiny vocab -> EOS hits early
    tok, ppl = _fused_greedy(searcher, audio)
    tok = np.asarray(tok)
    assert (tok[:, 0] == searcher.bos_id).all()
    for row in tok:
        eos_pos = np.nonzero(row == searcher.eos_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == searcher.pad_id).all()
    assert np.isfinite(np.asarray(ppl)).all()
