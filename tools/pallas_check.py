"""Validate + time the Pallas RNN kernel on the real TPU vs the scan path."""
import time
import jax, jax.numpy as jnp, numpy as np

from speech_recognition_tpu.ops.pallas.rnn_kernel import rnn_sequence_pallas
from speech_recognition_tpu.ops.rnn import cell_step

assert jax.default_backend() == "tpu", jax.default_backend()

def scan_path(rnn_type, x_proj, mask, rk, rb, reverse=False):
    T, B, GH = x_proj.shape
    gates = {"lstm": 4, "gru": 3}[rnn_type]
    H = GH // gates
    state0 = (jnp.zeros((B, H), x_proj.dtype),) * (2 if rnn_type == "lstm" else 1)
    def body(state, inp):
        x_t, m_t = inp
        h_new, new_state = cell_step(rnn_type, x_t, state, rk, rb, H)
        m = m_t.astype(h_new.dtype)
        new_state = tuple(m * ns + (1.0 - m) * os for ns, os in zip(new_state, state))
        return new_state, h_new * m
    final, out = jax.lax.scan(body, state0, (x_proj, mask), reverse=reverse)
    return out, final

def bench(fn, fetch, n=20):
    fetch(fn())
    t0 = time.perf_counter(); fetch(fn()); t1 = time.perf_counter()
    t2 = time.perf_counter()
    o = None
    for _ in range(n): o = fn()
    fetch(o); t3 = time.perf_counter()
    return ((t3 - t2) - (t1 - t0)) / (n - 1)

for rnn_type in ("lstm", "gru"):
    for (T, B, H) in [(255, 128, 256), (127, 128, 256)]:
        gates = {"lstm": 4, "gru": 3}[rnn_type]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((T, B, gates * H)), jnp.bfloat16) * 0.1
        lengths = rng.integers(T // 2, T + 1, B)
        mask = jnp.asarray((np.arange(T)[:, None] < lengths[None, :])[:, :, None])
        rk = jnp.asarray(rng.standard_normal((H, gates * H)), jnp.bfloat16) * 0.05
        rb = jnp.asarray(rng.standard_normal(gates * H), jnp.bfloat16) * 0.01 if rnn_type == "gru" else None

        scan_j = jax.jit(lambda x, m: scan_path(rnn_type, x, m, rk, rb))
        pal_j = jax.jit(lambda x, m: rnn_sequence_pallas(rnn_type, x, m, rk, rb))

        out_s, fin_s = scan_j(x, mask)
        out_p, fin_p = pal_j(x, mask)
        err = float(jnp.max(jnp.abs(out_s.astype(jnp.float32) - out_p.astype(jnp.float32))))
        err_f = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) for a, b in zip(fin_s, fin_p))
        t_s = bench(lambda: scan_j(x, mask), lambda o: np.asarray(o[0][-1, 0, :1]))
        t_p = bench(lambda: pal_j(x, mask), lambda o: np.asarray(o[0][-1, 0, :1]))
        print(f"{rnn_type} T={T} B={B} H={H}: max_err={err:.4g} final_err={err_f:.4g} "
              f"scan={t_s*1e3:.3f}ms pallas={t_p*1e3:.3f}ms speedup={t_s/t_p:.2f}x")
