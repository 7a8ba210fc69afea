"""ops/dw_conv.py: the SPMD-safe depthwise conv custom VJP.

Pins (a) forward == raw grouped conv, (b) custom-VJP grads == plain
autodiff of the raw grouped conv on a single device, and (c) the actual
bug this op exists for: on a multi-axis mesh with the batch sharded over
'data', the RAW grouped conv's kernel grad comes back scaled by the unused
axis size while depthwise_conv1d stays exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_recognition_tpu.ops.dw_conv import depthwise_conv1d


def _raw(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1,), "SAME", feature_group_count=x.shape[-1],
        dimension_numbers=("NTC", "TIO", "NTC"),
    )


@pytest.mark.parametrize("K", [1, 4, 5, 32])
def test_forward_matches_grouped_conv(K):
    x = jax.random.uniform(jax.random.PRNGKey(0), (3, 17, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (K, 1, 8)) * 0.3
    np.testing.assert_allclose(
        np.asarray(depthwise_conv1d(x, k)), np.asarray(_raw(x, k)), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("K", [1, 4, 5, 32])
def test_grads_match_autodiff(K):
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 17, 8))
    k = jax.random.normal(jax.random.PRNGKey(3), (K, 1, 8)) * 0.3
    cot = jax.random.normal(jax.random.PRNGKey(4), (3, 17, 8))

    def scal(f):
        return lambda x, k: jnp.sum(f(x, k) * cot)

    gx0, gk0 = jax.grad(scal(_raw), argnums=(0, 1))(x, k)
    gx1, gk1 = jax.grad(scal(depthwise_conv1d), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), rtol=1e-5, atol=1e-6)


def test_sharded_kernel_grad_exact_where_raw_conv_breaks(monkeypatch):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # the gate must not be steered by leaked CLI hints from earlier tests
    monkeypatch.delenv("SRT_SPMD_SAFE_DWCONV", raising=False)
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 20, 16))
    k = jax.random.normal(jax.random.PRNGKey(6), (5, 1, 16)) * 0.3

    def loss(f):
        return lambda k, x: jnp.sum(f(x, k) ** 2)

    gk_ref = jax.jit(jax.grad(loss(depthwise_conv1d)))(k, x)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    gk_ours = jax.jit(jax.grad(loss(depthwise_conv1d)))(k, xs)
    np.testing.assert_allclose(np.asarray(gk_ours), np.asarray(gk_ref), rtol=1e-5, atol=1e-6)

    # canary, non-fatal: the raw grouped conv is broken here (the XLA SPMD
    # bug this op works around).  A JAX/XLA upgrade that fixes it should
    # read as "workaround removable", not a red suite.
    gk_raw = jax.jit(jax.grad(loss(_raw)))(k, xs)
    if np.allclose(np.asarray(gk_raw), np.asarray(gk_ref), rtol=1e-3):
        import warnings

        warnings.warn(
            "XLA grouped-conv kernel grad is now correct under SPMD -- "
            "ops/dw_conv.py workaround may be removable"
        )


def test_raw_grad_exact_on_single_axis_mesh():
    """Precondition of the auto gate's single-axis fast path: the XLA
    grouped-grad bug needs >1 nontrivial mesh axes — on a pure 'data' mesh
    the plain autodiff kernel grad is exact.  If this ever fails, the gate
    in ops/dw_conv.py _auto_spmd_safe must drop the mesh inspection."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x = jax.random.uniform(jax.random.PRNGKey(9), (8, 20, 16))
    k = jax.random.normal(jax.random.PRNGKey(10), (5, 1, 16)) * 0.3

    def loss(k, x):
        return jnp.sum(_raw(x, k) ** 2)

    gk_ref = jax.jit(jax.grad(loss))(k, x)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    gk = jax.jit(jax.grad(loss))(k, xs)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref), rtol=1e-5, atol=1e-6)


def test_auto_gate_conservative_and_env_scoped(monkeypatch):
    """spmd_safe=None must stay SAFE on any multi-device run regardless of
    what mesh happens to be in the advisory registry (ad-hoc NamedSharding
    bypasses it — registry-based gating mis-fired under suite-order mesh
    leakage); SRT_SPMD_SAFE_DWCONV is the explicit caller opt-out, and
    run/train.py restores it after main() so it cannot leak."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from speech_recognition_tpu.ops.dw_conv import _auto_spmd_safe
    from speech_recognition_tpu.parallel.mesh import active_mesh

    monkeypatch.delenv("SRT_SPMD_SAFE_DWCONV", raising=False)
    assert _auto_spmd_safe()  # multi-device: safe
    with active_mesh(Mesh(np.array(jax.devices()[:8]), ("data",))):
        assert _auto_spmd_safe()  # registry is advisory: STILL safe
    monkeypatch.setenv("SRT_SPMD_SAFE_DWCONV", "0")
    assert not _auto_spmd_safe()  # explicit opt-out wins
    # the train CLI's hint is scoped: main() restores the prior env state
    monkeypatch.delenv("SRT_SPMD_SAFE_DWCONV", raising=False)
    import os

    from speech_recognition_tpu.run import train as train_mod

    def boom(cfg):
        assert os.environ.get("SRT_SPMD_SAFE_DWCONV") is None
        os.environ["SRT_SPMD_SAFE_DWCONV"] = "0"  # what mesh setup does
        raise RuntimeError("stop")

    monkeypatch.setattr(train_mod, "_main_impl", boom)
    with pytest.raises(RuntimeError):
        train_mod.main(None)
    assert os.environ.get("SRT_SPMD_SAFE_DWCONV") is None


def test_explicit_spmd_safe_paths_agree():
    """spmd_safe=False (plain autodiff) and True (custom VJP) give the same
    grads on an unsharded input — the gate only changes the backward route."""
    x = jax.random.uniform(jax.random.PRNGKey(7), (2, 33, 8))
    k = jax.random.normal(jax.random.PRNGKey(8), (5, 1, 8)) * 0.3

    def loss(safe):
        return lambda x, k: jnp.sum(depthwise_conv1d(x, k, spmd_safe=safe) ** 2)

    gx_fast, gk_fast = jax.grad(loss(False), argnums=(0, 1))(x, k)
    gx_safe, gk_safe = jax.grad(loss(True), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_fast), np.asarray(gx_safe), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gk_fast), np.asarray(gk_safe), rtol=1e-5, atol=1e-6)


def test_dkernel_accumulates_in_f32():
    """bf16 inputs, many-term reduction: bf16 accumulation would plateau at
    ~256 (8-bit mantissa); the tap-sum must accumulate in f32."""
    B, T, C = 8, 512, 4  # 4096 terms of 1.0 per (k, c)
    x = jnp.ones((B, T, C), jnp.bfloat16)
    k = jnp.ones((3, 1, C), jnp.bfloat16)

    def loss(k, x):
        return jnp.sum(depthwise_conv1d(x, k, spmd_safe=True).astype(jnp.float32))

    gk = np.asarray(jax.grad(loss)(k, x), np.float32)
    # center tap sees all B*T ones; bf16 accumulation would give ~256
    assert gk[1, 0, 0] > 3000, gk[1, 0, 0]
