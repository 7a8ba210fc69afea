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


def test_sharded_kernel_grad_exact_where_raw_conv_breaks():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 20, 16))
    k = jax.random.normal(jax.random.PRNGKey(6), (5, 1, 16)) * 0.3

    def loss(f):
        return lambda k, x: jnp.sum(f(x, k) ** 2)

    gk_ref = jax.jit(jax.grad(loss(depthwise_conv1d)))(k, x)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    gk_ours = jax.jit(jax.grad(loss(depthwise_conv1d)))(k, xs)
    np.testing.assert_allclose(np.asarray(gk_ours), np.asarray(gk_ref), rtol=1e-5, atol=1e-6)

    # the raw grouped conv really is broken here (XLA SPMD bug this op
    # works around); if this starts PASSING, the workaround can go
    gk_raw = jax.jit(jax.grad(loss(_raw)))(k, xs)
    assert not np.allclose(np.asarray(gk_raw), np.asarray(gk_ref), rtol=1e-3), (
        "XLA grouped-conv kernel grad is now correct under SPMD -- "
        "ops/dw_conv.py workaround may be removable"
    )
