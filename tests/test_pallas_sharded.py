"""Sharded Pallas fast paths: multi-device fused kernels == single-device.

Round-1 verdict item 1: the fused Pallas pairs (decoder mega-kernel,
CE+vocab, CTC emissions+vocab) must keep running on multi-device meshes via
shard_map over the 'data' axis instead of silently falling back to XLA.
These tests drive the TPU kernels in interpret mode on the 8-virtual-CPU
mesh and assert:

  * values and gradients match the unsharded kernel run (same math per
    shard; weight grads recombined by one psum), and
  * the dispatch gates pick the expected implementation for each
    mesh/shape combination (no silent fallbacks).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from speech_recognition_tpu.ops import decoder as D
from speech_recognition_tpu.ops.pallas.ce_kernel import (
    ce_vocab_pallas_supported,
    fused_ce_vocab,
)
from speech_recognition_tpu.ops.pallas.ctc_kernel import (
    fused_vocab_emissions,
    vocab_emissions_supported,
)
from speech_recognition_tpu.ops.pallas.decoder_kernel import decoder_fwd_pallas
from speech_recognition_tpu.parallel import get_device_mesh, set_active_mesh

bf = jnp.bfloat16


@pytest.fixture
def data_mesh():
    """4-way data x 2-way model mesh over the virtual CPU devices (the same
    layout as __graft_entry__.dryrun_multichip); active-mesh registration is
    undone afterwards so other tests see the single-shard default."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    mesh = get_device_mesh(data_parallel=4, model_parallel=2)
    yield mesh
    set_active_mesh(None)


def _close(a, b, tol, msg=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=tol * (np.abs(b).max() + 1e-3), err_msg=msg)


@pytest.fixture
def shard_spy(monkeypatch):
    """Record the data-shard count of every shard_over_batch dispatch, so the
    tests can assert the sharded path actually EXECUTED (a trace cached
    under a different mesh once slipped through as a false pass)."""
    from speech_recognition_tpu.ops.pallas import (
        ce_kernel as CEK,
        ctc_kernel as CTK,
        decoder_kernel as DKM,
        sharding as SH,
    )

    seen = []
    orig = SH.shard_over_batch

    def spy(fn, operands, in_dims, out_specs, psum_out=()):
        from speech_recognition_tpu.parallel import data_axis_size

        seen.append(data_axis_size())
        return orig(fn, operands, in_dims, out_specs, psum_out)

    for mod in (CEK, CTK, DKM):
        monkeypatch.setattr(mod, "shard_over_batch", spy)
    return seen


# ------------------------------------------------------------------ CE pair
def test_fused_ce_sharded_matches_unsharded(data_mesh, shard_spy):
    N, B, H, V = 3, 8, 16, 32
    rng = np.random.RandomState(0)
    hid = jnp.asarray(rng.randn(N, B, H).astype(np.float32) * 0.3, bf)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, jnp.float32)
    y = jnp.asarray(rng.randint(0, V, (N, B)), jnp.int32)
    y = jnp.where(jnp.asarray(rng.rand(N, B) > 0.2), y, 0)

    def loss(hid, W, b):
        return fused_ce_vocab(hid, W, b, y, 0)[0]

    with pltpu.force_tpu_interpret_mode():
        set_active_mesh(None)  # unsharded reference: direct kernel call
        l_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1, 2))(hid, W, b)
        _, preds_ref = fused_ce_vocab(hid, W, b, y, 0)
        set_active_mesh(data_mesh)  # sharded: kernels under shard_map
        l_sh, g_sh = jax.value_and_grad(loss, argnums=(0, 1, 2))(hid, W, b)
        _, preds_sh = fused_ce_vocab(hid, W, b, y, 0)

    assert abs(float(l_ref) - float(l_sh)) < 1e-5
    assert np.array_equal(np.asarray(preds_ref), np.asarray(preds_sh))
    for name, r, s in zip(("dhid", "dW", "db"), g_ref, g_sh):
        _close(s, r, tol=1e-3, msg=name)
    assert 4 in shard_spy, "sharded CE run never dispatched through shard_over_batch"


# ----------------------------------------------------------------- CTC pair
def test_fused_ctc_emissions_sharded_matches_unsharded(data_mesh, shard_spy):
    B, T, H, V, K = 8, 6, 16, 32, 5
    rng = np.random.RandomState(1)
    hid = jnp.asarray(rng.randn(B, T, H).astype(np.float32) * 0.3, bf)
    W = jnp.asarray(rng.randn(H, V).astype(np.float32) * 0.3, jnp.float32)
    b = jnp.asarray(rng.randn(V).astype(np.float32) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.randint(0, V, (B, K)), jnp.int32)
    cot = jnp.asarray(rng.randn(B, T, K).astype(np.float32) * 0.5)

    def scalar(hid, W, b):
        return jnp.sum(fused_vocab_emissions(hid, W, b, ids) * cot)

    with pltpu.force_tpu_interpret_mode():
        set_active_mesh(None)
        v_ref, g_ref = jax.value_and_grad(scalar, argnums=(0, 1, 2))(hid, W, b)
        set_active_mesh(data_mesh)
        v_sh, g_sh = jax.value_and_grad(scalar, argnums=(0, 1, 2))(hid, W, b)

    assert abs(float(v_ref) - float(v_sh)) < 1e-4 * (abs(float(v_ref)) + 1.0)
    for name, r, s in zip(("dhid", "dW", "db"), g_ref, g_sh):
        _close(s, r, tol=1e-3, msg=name)
    assert 4 in shard_spy, "sharded CTC run never dispatched through shard_over_batch"


# ----------------------------------------------------- decoder mega-kernel
def _decoder_args(N=4, B=8, He=16, S=8, H=16, Dv=16, n_cells=2):
    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32), bf)
    emb = f(N, B, He) * 0.5
    tm = jnp.asarray((rng.rand(N, B, 1) > 0.2).astype(np.float32), bf)
    pk, val = f(B, S, H) * 0.3, f(B, S, Dv) * 0.3
    bias = jnp.where(jnp.asarray(rng.rand(B, S) > 0.1), 0.0, -1e9).astype(bf)
    qw, qb = f(H, H) * 0.2, f(H) * 0.1
    ks, rs, bs, cms = [], [], [], []
    in_dim = He + Dv
    for _ in range(n_cells):
        ks.append(f(in_dim, 4 * H) * 0.1)
        rs.append(f(H, 4 * H) * 0.1)
        bs.append(f(4 * H) * 0.1)
        cms.append(jnp.ones((B, in_dim), bf))
        in_dim = H
    om = jnp.ones((B, H), bf)
    h0, c0 = f(B, H) * 0.2, f(B, H) * 0.2
    return (emb, tm, pk, val, bias, qw, qb, tuple(ks), tuple(rs), tuple(bs),
            tuple(cms), om, h0, c0)


def test_decoder_kernels_sharded_match_unsharded(data_mesh, monkeypatch, shard_spy):
    args = _decoder_args()
    CHUNK = 8

    monkeypatch.setattr(D, "_use_pallas_decoder", lambda *a: True)
    monkeypatch.setattr(
        "speech_recognition_tpu.ops.pallas.decoder_kernel.decoder_fwd_pallas",
        lambda *a, **k: decoder_fwd_pallas(*a, chunk=CHUNK, **k),
    )
    from speech_recognition_tpu.ops.pallas import decoder_kernel as DK

    bwd_orig = DK.decoder_bwd_pallas
    monkeypatch.setattr(DK, "decoder_bwd_pallas", lambda *a, **k: bwd_orig(*a, chunk=CHUNK, **k))

    def loss(a):
        hidden, h_last, c_last = D.decoder_scan_lstm(*a)
        w = jnp.arange(1, hidden.size + 1, dtype=jnp.float32).reshape(hidden.shape) * 1e-3
        return jnp.sum(hidden.astype(jnp.float32) * w) + jnp.sum(h_last.astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        set_active_mesh(None)
        l_ref, g_ref = jax.value_and_grad(loss)(args)
        set_active_mesh(data_mesh)
        l_sh, g_sh = jax.value_and_grad(loss)(args)

    assert abs(float(l_ref) - float(l_sh)) < 1e-4 * (abs(float(l_ref)) + 1.0)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_sh)
    assert len(flat_r) == len(flat_s)
    for i, (r, s) in enumerate(zip(flat_r, flat_s)):
        _close(s, r, tol=1e-2, msg=f"grad leaf {i}")
    # both the forward and backward mega-kernels must have run sharded
    assert shard_spy.count(4) >= 2, f"sharded decoder run never dispatched: {shard_spy}"


# -------------------------------------------------------- dispatch gating
def test_gates_accept_data_sharded_batches(data_mesh, monkeypatch):
    """On a mesh whose data axis divides the batch, the fused paths stay ON
    (per-shard shape checks); indivisible batches and mesh-less multi-device
    runs fall back.  SRT_PALLAS_FORCE stands in for the TPU backend."""
    monkeypatch.setenv("SRT_PALLAS_FORCE", "1")
    # data axis = 4: B=64 -> 16/shard (ok), B=52 -> indivisible (fallback)
    hid = jnp.zeros((4, 64, 128), bf)
    W = jnp.zeros((128, 256), jnp.float32)
    assert ce_vocab_pallas_supported(hid, W)
    assert not ce_vocab_pallas_supported(jnp.zeros((4, 52, 128), bf), W)

    ids = jnp.zeros((64, 5), jnp.int32)
    assert vocab_emissions_supported(jnp.zeros((64, 8, 128), bf), W, ids)
    assert not vocab_emissions_supported(  # 54 % 4 != 0 -> indivisible
        jnp.zeros((54, 8, 128), bf), W, jnp.zeros((54, 5), jnp.int32)
    )

    emb = jnp.zeros((4, 64, 128), bf)
    pk = jnp.zeros((64, 8, 128), bf)
    val = jnp.zeros((64, 8, 128), bf)
    kernels = (jnp.zeros((256, 512), bf), jnp.zeros((128, 512), bf))
    assert D._use_pallas_decoder(emb, pk, val, kernels)
    # per-shard batch 13 breaks the 16-sublane requirement
    assert not D._use_pallas_decoder(
        jnp.zeros((4, 52, 128), bf), jnp.zeros((52, 8, 128), bf),
        jnp.zeros((52, 8, 128), bf), kernels,
    )

    # mesh-less multi-device: pallas_call would force replication -> OFF
    set_active_mesh(None)
    assert not ce_vocab_pallas_supported(hid, W)
    assert not vocab_emissions_supported(jnp.zeros((64, 8, 128), bf), W, ids)
    assert not D._use_pallas_decoder(emb, pk, val, kernels)
