"""Search consistency oracles (mirrors reference tests/test_search.py):
beam_size=1 beam search must match greedy search for both model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_recognition_tpu.models import LAS, DeepSpeech2
from speech_recognition_tpu.search import DeepSpeechSearcher, LASSearcher


def test_las_beam1_equals_greedy():
    rng = jax.random.PRNGKey(0)
    model = LAS("lstm", 100, 32, 32, 1, 1, 0.1, 0.99)
    audio = jax.random.uniform(rng, (8, 10, 20, 3), maxval=100.0)
    tokens = jax.random.randint(rng, (8, 15), 0, 100)
    variables = model.init({"params": rng}, (audio, tokens))

    searcher = LASSearcher(model, variables, max_token_length=17, bos_id=2, eos_id=3)
    greedy_tokens, greedy_ppl = searcher.greedy_search(audio)
    beam_tokens, beam_ppl = searcher.beam_search(audio, 1)

    np.testing.assert_array_equal(np.asarray(beam_tokens[:, 0, :]), np.asarray(greedy_tokens))
    np.testing.assert_allclose(np.asarray(beam_ppl[:, 0]), np.asarray(greedy_ppl), rtol=1e-4)


def test_las_beam_search_shapes_and_ordering():
    rng = jax.random.PRNGKey(1)
    model = LAS("gru", 50, 16, 16, 1, 1, 0.0, 1.0)
    audio = jax.random.uniform(rng, (4, 12, 10, 3), maxval=10.0)
    tokens = jax.random.randint(rng, (4, 6), 0, 50)
    variables = model.init({"params": rng}, (audio, tokens))
    searcher = LASSearcher(model, variables, max_token_length=9, bos_id=2, eos_id=3)
    beams, ppl = searcher.beam_search(audio, 3)
    assert beams.shape == (4, 3, 9)
    assert ppl.shape == (4, 3)
    assert bool((beams[:, :, 0] == 2).all())  # all beams start with BOS


def test_las_greedy_eos_padding():
    rng = jax.random.PRNGKey(2)
    model = LAS("lstm", 20, 8, 8, 1, 1, 0.0, 1.0)
    audio = jax.random.uniform(rng, (3, 10, 8, 3), maxval=10.0)
    tokens = jax.random.randint(rng, (3, 5), 0, 20)
    variables = model.init({"params": rng}, (audio, tokens))
    searcher = LASSearcher(model, variables, max_token_length=12, bos_id=2, eos_id=3, pad_id=0)
    out, ppl = searcher.greedy_search(audio)
    out = np.asarray(out)
    for row in out:
        eos_positions = np.nonzero(row == 3)[0]
        if len(eos_positions):
            assert (row[eos_positions[0] + 1 :] == 0).all()
    assert np.isfinite(np.asarray(ppl)).all()


def _peaked_log_probs(path, vocab, peak=12.0):
    """[T] token path -> [1, T, V] log-softmax with a dominant per-frame token."""
    T = len(path)
    logits = np.zeros((1, T, vocab), np.float32)
    logits[0, np.arange(T), path] = peak
    return jax.nn.log_softmax(jnp.asarray(logits), axis=-1)


def test_ctc_greedy_decode_gold_cases():
    from speech_recognition_tpu.search import ctc_greedy_decode

    blank = 0
    # path a a _ a b b _ _ c -> a a b c  (blank-separated repeat survives)
    lp = _peaked_log_probs([1, 1, 0, 1, 2, 2, 0, 0, 3], 5)
    tokens, logp = ctc_greedy_decode(lp, blank)
    row = np.asarray(tokens)[0]
    np.testing.assert_array_equal(row[row != 0], [1, 1, 2, 3])
    assert float(logp[0]) <= 0.0


def test_ctc_beam1_equals_greedy_on_peaked_logits():
    from speech_recognition_tpu.search import ctc_beam_decode, ctc_greedy_decode

    blank = 4
    rng = np.random.default_rng(0)
    paths = rng.integers(0, 5, (6, 30))
    lps = jnp.concatenate([_peaked_log_probs(p, 6, peak=20.0) for p in paths])
    g_tokens, _ = ctc_greedy_decode(lps, blank)
    b_tokens, _ = ctc_beam_decode(lps, blank, 1)
    np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens[:, 0, :]))


def test_ctc_beam_beats_greedy_on_merged_paths():
    """Classic CTC case: per-frame argmax picks blank, but two non-blank paths
    sum to a higher-probability labeling — prefix beam search must find it."""
    from speech_recognition_tpu.search import ctc_beam_decode, ctc_greedy_decode

    blank = 0
    # frame probs: p(blank)=0.4, p(a)=0.35, p(b)=0.25 at both frames
    probs = np.array([[[0.4, 0.35, 0.25], [0.4, 0.35, 0.25]]], np.float32)
    lp = jnp.log(jnp.asarray(probs))
    g_tokens, _ = ctc_greedy_decode(lp, blank)
    assert (np.asarray(g_tokens) == 0).all()  # greedy: blank blank -> empty
    b_tokens, b_logp = ctc_beam_decode(lp, blank, 2)
    # best labeling is "a": paths (a,a),(a,_),(_,a) sum to 0.35*0.35+2*0.4*0.35 = 0.4025
    top = np.asarray(b_tokens)[0, 0]
    np.testing.assert_array_equal(top[top != 0], [1])
    np.testing.assert_allclose(float(jnp.exp(b_logp)[0, 0]), 0.4025, rtol=1e-5)


def test_ctc_beam_matches_tf_oracle_on_confident_logits():
    """Our device-side prefix beam must agree with tf.nn.ctc_beam_search_decoder
    on well-separated (confident) logits.  On near-uniform logits the two
    algorithms legitimately diverge (different pruning/merging of prefixes);
    the reference used the TF CPU kernel (search.py:279-281)."""
    import pytest

    tf = pytest.importorskip("tensorflow")

    from speech_recognition_tpu.search import ctc_beam_decode

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B, T, V, blank = 3, 12, 8, 0
    # confident logits along a repeat-free, blank-free path, so the collapsed
    # answer is unambiguous and both algorithms must return exactly it
    path = np.zeros((B, T), np.int64)
    for b in range(B):
        path[b, 0] = rng.integers(1, V)
        for t in range(1, T):
            choices = [v for v in range(1, V) if v != path[b, t - 1]]
            path[b, t] = rng.choice(choices)
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 0.1
    for b in range(B):
        logits[b, np.arange(T), path[b]] += 8.0
    log_probs = jax.nn.log_softmax(jnp.asarray(logits))

    tokens, _ = ctc_beam_decode(log_probs, blank_index=blank, beam_size=4)
    ours = np.asarray(tokens)[:, 0, :]

    # TF convention: blank must be the LAST class (reference search.py:269-273)
    remapped = np.concatenate([logits[..., 1:], logits[..., :1]], axis=-1)
    decoded, _ = tf.nn.ctc_beam_search_decoder(
        tf.constant(np.transpose(remapped, (1, 0, 2))),
        tf.fill([B], T),
        beam_width=4,
        top_paths=1,
    )
    theirs = tf.sparse.to_dense(decoded[0]).numpy() + 1  # undo the remap

    width = max(ours.shape[1], theirs.shape[1])
    a = np.zeros((B, width), np.int64)
    o = np.zeros((B, width), np.int64)
    a[:, : theirs.shape[1]] = theirs
    o[:, : ours.shape[1]] = ours
    np.testing.assert_array_equal(o, a)


def _host_prefix_beam_exhaustive(lp, blank):
    """Exact CTC prefix posterior: the standard pb/pnb prefix-beam recursion
    (Hannun et al. 2014) over ALL prefixes — no beam pruning, no candidate
    pruning, full merging by prefix identity.  Returns [(score, prefix)]
    sorted best-first.  Host oracle for ctc_beam_decode."""
    import math
    from collections import defaultdict

    NEG = -math.inf

    def lse(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    T, V = lp.shape
    beams = {(): (0.0, NEG)}  # prefix -> (p_blank, p_nonblank), log domain
    for t in range(T):
        nxt = defaultdict(lambda: (NEG, NEG))
        for prefix, (pb, pnb) in beams.items():
            total = lse(pb, pnb)
            npb, npnb = nxt[prefix]
            npb = lse(npb, total + lp[t, blank])  # blank keeps the prefix
            if prefix:  # repeated last token also keeps it (from pnb only)
                npnb = lse(npnb, pnb + lp[t, prefix[-1]])
            nxt[prefix] = (npb, npnb)
            for c in range(V):
                if c == blank:
                    continue
                ext = prefix + (c,)
                src = pb if (prefix and c == prefix[-1]) else total
                if src == NEG:
                    continue  # unreachable extension (e.g. repeat with no blank mass)
                epb, epnb = nxt[ext]
                nxt[ext] = (epb, lse(epnb, src + lp[t, c]))
        # drop prefixes with no mass at all (created only as merge targets)
        beams = {p: v for p, v in nxt.items() if lse(*v) > NEG}
    return sorted(
        ((lse(pb, pnb), p) for p, (pb, pnb) in beams.items()), key=lambda s: -s[0]
    )


@pytest.mark.parametrize("seed,V,T", [(0, 3, 5), (1, 4, 5), (2, 4, 6), (3, 5, 5), (4, 3, 6)])
def test_ctc_beam_matches_exhaustive_oracle_when_k_covers_space(seed, V, T):
    """With K >= the reachable-prefix count, the device prefix beam IS the
    exhaustive host prefix-beam — merge paths included — on arbitrary
    (near-uniform, unpeaked) logits.  Randomized over seeds/shapes."""
    from speech_recognition_tpu.search import ctc_beam_decode

    rng = np.random.default_rng(seed)
    blank = 0
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T, V)).astype(np.float32))),
        np.float64,
    )
    oracle = _host_prefix_beam_exhaustive(lp, blank)

    K = sum((V - 1) ** l for l in range(T + 1))  # every possible prefix
    tokens, scores = ctc_beam_decode(jnp.asarray(lp, jnp.float32)[None], blank, K)
    tokens, scores = np.asarray(tokens)[0], np.asarray(scores, np.float64)[0]

    device = {}
    for k in range(K):
        if scores[k] < -1e29:
            continue  # dead beam slot
        prefix = tuple(int(x) for x in tokens[k] if x != 0)
        assert prefix not in device, f"duplicate live prefix {prefix}"
        device[prefix] = scores[k]

    # every oracle prefix present with the same total log-prob
    assert len(device) == len(oracle)
    for score, prefix in oracle:
        assert prefix in device, f"missing prefix {prefix}"
        np.testing.assert_allclose(device[prefix], score, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ctc_beam_pruned_is_lower_bound_of_oracle(seed):
    """A pruned beam (small K) can only LOSE probability mass: each returned
    prefix's score is <= its exact posterior, and the top-1 score is <= the
    oracle's best."""
    from speech_recognition_tpu.search import ctc_beam_decode

    rng = np.random.default_rng(100 + seed)
    blank, V, T, K = 0, 5, 6, 3
    lp = np.asarray(
        jax.nn.log_softmax(jnp.asarray(rng.standard_normal((T, V)).astype(np.float32))),
        np.float64,
    )
    exact = {p: s for s, p in _host_prefix_beam_exhaustive(lp, blank)}
    tokens, scores = ctc_beam_decode(jnp.asarray(lp, jnp.float32)[None], blank, K)
    tokens, scores = np.asarray(tokens)[0], np.asarray(scores, np.float64)[0]
    best_exact = max(exact.values())
    for k in range(K):
        prefix = tuple(int(x) for x in tokens[k] if x != 0)
        assert scores[k] <= exact[prefix] + 1e-4
    assert scores[0] <= best_exact + 1e-4


def test_deepspeech_searcher_end_to_end_shapes():
    rng = jax.random.PRNGKey(3)
    blank = 33
    model = DeepSpeech2(1, (8,), ((41, 11),), ((2, 2),), "lstm", 1, 24, 0.1, 0.1, 111, blank, 1)
    audio = jax.random.uniform(rng, (4, 300, 123, 3), maxval=100.0)
    variables = model.init({"params": rng}, audio)

    searcher = DeepSpeechSearcher(model, variables, blank)
    greedy_tokens, greedy_prob = searcher.greedy_search(audio)
    beam_tokens, beam_prob = searcher.beam_search(audio, 3)
    T2 = greedy_tokens.shape[1]
    assert beam_tokens.shape == (4, 3, T2)
    assert beam_prob.shape == (4, 3)
    assert (np.asarray(greedy_tokens) != blank).all()
    # beam scores are sorted descending
    bp = np.asarray(beam_prob)
    assert (np.diff(bp, axis=1) <= 1e-6).all()


def test_topk_inloop_matches_lax_top_k():
    """topk_inloop (the in-loop top-k used by LAS beam search) must match
    jax.lax.top_k bitwise — values, indices, and tie order — on random
    values with duplicates, in f32 and bf16."""
    from speech_recognition_tpu.search import topk_inloop

    rng = jax.random.PRNGKey(7)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jax.random.normal(rng, (16, 1000)).astype(dtype)
        # inject duplicates/ties
        x = x.at[:, 100].set(x[:, 3]).at[:, 500].set(x[:, 3])
        rv, ri = jax.lax.top_k(x, 8)
        pv, pi = topk_inloop(x, 8)
        np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
        np.testing.assert_array_equal(np.asarray(ri), np.asarray(pi))


def test_las_beam_untiled_matches_tiled():
    """The untiled beam attention (models/las.py step_beam, default) must
    produce the same decodes as the reference tiled layout."""
    import os

    rng = jax.random.PRNGKey(5)
    model = LAS("lstm", 80, 24, 24, 2, 2, 0.0, 1.0)
    audio = jax.random.uniform(rng, (3, 20, 12, 3), maxval=20.0)
    tokens = jax.random.randint(rng, (3, 7), 0, 80)
    variables = model.init({"params": rng}, (audio, tokens))

    prev = os.environ.get("SRT_BEAM_UNTILED")
    try:
        os.environ["SRT_BEAM_UNTILED"] = "0"
        tiled = LASSearcher(model, variables, max_token_length=11, bos_id=2, eos_id=3).beam_search(audio, 4)
        os.environ["SRT_BEAM_UNTILED"] = "1"
        untiled = LASSearcher(model, variables, max_token_length=11, bos_id=2, eos_id=3).beam_search(audio, 4)
    finally:
        if prev is None:
            os.environ.pop("SRT_BEAM_UNTILED", None)
        else:
            os.environ["SRT_BEAM_UNTILED"] = prev
    np.testing.assert_array_equal(np.asarray(tiled[0]), np.asarray(untiled[0]))
    np.testing.assert_allclose(np.asarray(tiled[1]), np.asarray(untiled[1]), rtol=1e-4)
