"""Expert parallelism (parallel/expert.py) equivalence pins.

expert_parallel_moe() must be a pure re-placement of the dense routed FFN:
outputs AND gradients identical to moe_ffn() on one device when capacity
does not bind, and identical to the per-source-shard oracle when it does —
the same contract the dp/tp/pp/sp paths are held to.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from speech_recognition_tpu.parallel.expert import (
    expert_parallel_moe,
    init_moe_params,
    moe_ffn,
)

D, H, E = 8, 16, 4


def _params(seed=0):
    return init_moe_params(jax.random.PRNGKey(seed), E, D, H)


def _ep_mesh(n_expert, n_data=1):
    devices = np.asarray(jax.devices()[: n_expert * n_data])
    if n_data > 1:
        return Mesh(devices.reshape(n_data, n_expert), ("data", "expert"))
    return Mesh(devices.reshape(n_expert), ("expert",))


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("n_expert", [2, 4])
def test_ep_matches_dense_when_capacity_free(k, n_expert):
    params = _params()
    x = jax.random.normal(jax.random.PRNGKey(1), (16, D))
    mesh = _ep_mesh(n_expert)
    # capacity >= all tokens: nothing drops on either path
    want, _ = jax.jit(lambda p, x: moe_ffn(p, x, k=k, capacity=16))(params, x)
    got, aux = jax.jit(
        lambda p, x: expert_parallel_moe(p, x, mesh, k=k, capacity=16)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    assert np.isfinite(float(aux))


def test_ep_drop_semantics_match_per_shard_oracle():
    """When capacity binds, each source shard ranks its own tokens — the
    oracle is moe_ffn() run independently per shard with the same capacity."""
    params = _params(2)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, D))
    mesh = _ep_mesh(2)
    cap = 2  # 8 tokens/shard over 4 experts: ~2/expert, ties WILL overflow
    got, aux = jax.jit(
        lambda p, x: expert_parallel_moe(p, x, mesh, capacity=cap)
    )(params, x)
    halves = [moe_ffn(params, x[i * 8 : (i + 1) * 8], capacity=cap) for i in range(2)]
    want = jnp.concatenate([h[0] for h in halves])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    want_aux = float(np.mean([float(h[1]) for h in halves]))
    np.testing.assert_allclose(float(aux), want_aux, rtol=1e-6)
    # capacity 2 with 8 tokens/shard must actually drop for this seed —
    # otherwise the test is vacuous (bump the seed if routing evens out)
    dense_free, _ = moe_ffn(params, x, capacity=16)
    assert not np.allclose(np.asarray(got), np.asarray(dense_free))


def test_ep_gradients_match_dense():
    params = _params(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, D))
    mesh = _ep_mesh(4)

    # aux is group-local on the EP path by design (GShard groups), so the
    # compared objective is the y-part only; EP aux grads are checked finite
    def loss_dense(p, x):
        y, _ = moe_ffn(p, x, k=2, capacity=16)
        return jnp.sum(y**2)

    def loss_ep(p, x):
        y, _ = expert_parallel_moe(p, x, mesh, k=2, capacity=16)
        return jnp.sum(y**2)

    ld, gd = jax.jit(jax.value_and_grad(loss_dense, argnums=(0, 1)))(params, x)
    le, ge = jax.jit(jax.value_and_grad(loss_ep, argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(ge), jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(le), float(ld), rtol=1e-6)

    aux_grads = jax.jit(
        jax.grad(lambda p, x: expert_parallel_moe(p, x, mesh, k=2, capacity=16)[1])
    )(params, x)
    assert all(
        np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(aux_grads)
    )


def test_ep_composes_with_data_parallel():
    params = _params(6)
    x = jax.random.normal(jax.random.PRNGKey(7), (8, 4, D))  # [B, T, D]
    mesh = _ep_mesh(n_expert=2, n_data=4)
    want, _ = jax.jit(lambda p, x: moe_ffn(p, x, capacity=32))(params, x)
    got, _ = jax.jit(
        lambda p, x: expert_parallel_moe(p, x, mesh, data_axis="data", capacity=32)
    )(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_ep_validates_divisibility():
    params = _params()
    mesh = _ep_mesh(2)
    with pytest.raises(ValueError, match="tokens"):
        expert_parallel_moe(params, jnp.zeros((3, D)), mesh)
    p3 = init_moe_params(jax.random.PRNGKey(0), 3, D, H)
    with pytest.raises(ValueError, match="experts"):
        expert_parallel_moe(p3, jnp.zeros((4, D)), mesh)
