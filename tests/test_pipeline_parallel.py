"""Pipeline parallelism (parallel/pipeline.py) equivalence pins.

gpipe() must be a pure re-scheduling: outputs AND gradients identical (up to
float tolerance) to running the layer stack sequentially on one device —
the same contract the dp/tp paths are held to in tests/test_parallel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from speech_recognition_tpu.parallel.pipeline import gpipe, stack_params, stack_stage_fn


def _dense_layer(params, x, *const):
    W, b = params["w"], params["b"]
    return jnp.tanh(x @ W + b)


def _make_dense_stack(key, n_layers, width):
    layers = []
    for i in range(n_layers):
        k1, k2, key = jax.random.split(key, 3)
        layers.append(
            {
                "w": jax.random.normal(k1, (width, width)) / np.sqrt(width),
                "b": jax.random.normal(k2, (width,)) * 0.1,
            }
        )
    return layers


def _sequential(layer_fn, layers, x, *const):
    for p in layers:
        x = layer_fn(p, x, *const)
    return x


def _pipe_mesh(n_pipe, n_data=1):
    devices = np.asarray(jax.devices()[: n_pipe * n_data])
    if n_data > 1:
        return Mesh(devices.reshape(n_data, n_pipe), ("data", "pipe"))
    return Mesh(devices.reshape(n_pipe), ("pipe",))


@pytest.mark.parametrize("n_pipe,n_micro", [(2, 4), (4, 8)])
def test_gpipe_dense_stack_matches_sequential(n_pipe, n_micro):
    key = jax.random.PRNGKey(0)
    layers = _make_dense_stack(key, 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    mesh = _pipe_mesh(n_pipe)
    stage_params = stack_params(layers, n_pipe)
    stage_fn = stack_stage_fn(_dense_layer)

    want = _sequential(_dense_layer, layers, x)
    got = jax.jit(lambda p, x: gpipe(stage_fn, p, x, n_micro, mesh))(stage_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match_sequential():
    n_pipe, n_micro = 4, 8
    layers = _make_dense_stack(jax.random.PRNGKey(2), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 8))
    mesh = _pipe_mesh(n_pipe)
    stage_params = stack_params(layers, n_pipe)
    stage_fn = stack_stage_fn(_dense_layer)

    def loss_pipe(p, x):
        y = gpipe(stage_fn, p, x, n_micro, mesh)
        return jnp.sum(y**2)

    def loss_seq(p, x):
        # identical stage-major layout, run as a flat sequential stack
        def body(h, layer_params):
            return _dense_layer(layer_params, h), None

        flat = jax.tree_util.tree_map(lambda l: l.reshape((-1,) + l.shape[2:]), p)
        y, _ = jax.lax.scan(body, x, flat)
        return jnp.sum(y**2)

    lp, gp = jax.jit(jax.value_and_grad(loss_pipe, argnums=(0, 1)))(stage_params, x)
    ls, gs = jax.jit(jax.value_and_grad(loss_seq, argnums=(0, 1)))(stage_params, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_gpipe_composes_with_data_parallel():
    n_data, n_pipe, n_micro = 2, 4, 4
    layers = _make_dense_stack(jax.random.PRNGKey(4), 4, 8)
    x = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
    stage_fn = stack_stage_fn(_dense_layer)

    want = _sequential(_dense_layer, layers, x)
    mesh = _pipe_mesh(n_pipe, n_data)
    stage_params = stack_params(layers, n_pipe)
    got = jax.jit(
        lambda p, x: gpipe(stage_fn, p, x, n_micro, mesh, data_axis="data")
    )(stage_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_gpipe_birnn_trunk_matches_sequential():
    """The real target shape: a DS2-style homogeneous BiGRU trunk
    (reference models/deepspeech.py:40-60) — input width == 2*units so
    every layer maps [B,T,2H] -> [B,T,2H]."""
    from speech_recognition_tpu.ops.rnn import BiRNN

    units, width = 4, 8  # 2*units == width
    B, T = 8, 6
    n_pipe, n_micro = 2, 4
    module = BiRNN("gru", units)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, width))
    mask = jnp.arange(T)[None, :] < jnp.array([6, 5, 4, 6, 3, 6, 2, 6])[:, None]

    layers = [
        module.init(jax.random.PRNGKey(10 + i), x, mask)["params"] for i in range(2)
    ]

    def layer_fn(params, h, mask):
        return module.apply({"params": params}, h, mask)[0]

    want = _sequential(layer_fn, layers, x, mask)
    mesh = _pipe_mesh(n_pipe)
    stage_params = stack_params(layers, n_pipe)
    got = jax.jit(
        lambda p, x, m: gpipe(
            stack_stage_fn(layer_fn), p, x, n_micro, mesh, const=(m,)
        )
    )(stage_params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_gpipe_validates_microbatching():
    layers = _make_dense_stack(jax.random.PRNGKey(7), 2, 4)
    mesh = _pipe_mesh(2)
    stage_params = stack_params(layers, 2)
    x = jnp.zeros((6, 4))
    with pytest.raises(ValueError, match="not divisible"):
        gpipe(stack_stage_fn(_dense_layer), stage_params, x, 4, mesh)
    with pytest.raises(ValueError, match="n_micro"):
        gpipe(stack_stage_fn(_dense_layer), stage_params, x, 1, mesh)
    with pytest.raises(ValueError, match="not divisible"):
        stack_params(layers, 4)
