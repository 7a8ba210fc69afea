"""Sparse image warp (polyharmonic spline + dense bilinear warp) in JAX.

Faithful reimplementation of the tfa.image.sparse_image_warp pipeline the
reference uses for SpecAugment time warping (reference data.py:275-280 with
num_boundary_points=3 — "8 point as boundary points" per the reference's
own comment, i.e. a 3x3 boundary grid minus the center):

1. control-point flows = dest - source locations,
2. zero-flow control points pinned on the image boundary,
3. a dense flow field interpolated with an order-2 polyharmonic (thin
   plate) spline: phi(r^2) = 0.5 * r^2 * log(r^2) = r^2 * log(r),
4. dense_image_warp: output[y, x] = bilinear(image, (y, x) - flow[y, x]).

The spline solver matches scipy.interpolate.RBFInterpolator
(kernel='thin_plate_spline', degree=1) — tested against it in
tests/test_spec_augment_warp.py.  Everything is static-shaped and jittable:
one (n+3) x (n+3) solve per image plus a [H*W, n] phi evaluation.
"""

import jax
import jax.numpy as jnp

_EPSILON = 1e-10


def _phi_order2(r_sq):
    """0.5 * r^2 * log(r^2), the order-2 polyharmonic kernel (tfa _phi)."""
    return 0.5 * r_sq * jnp.log(jnp.maximum(r_sq, _EPSILON))


def _pairwise_sq_dist(a, b):
    """[n,2] x [m,2] -> [n,m] squared euclidean distances."""
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def polyharmonic_interpolate(train_points, train_values, query_points):
    """Order-2 polyharmonic spline interpolation (tfa interpolate_spline).

    :param train_points: [n, 2] float control-point locations
    :param train_values: [n, v] values at the control points
    :param query_points: [m, 2] locations to interpolate at
    :return: [m, v] interpolated values
    """
    n = train_points.shape[0]
    matrix_a = _phi_order2(_pairwise_sq_dist(train_points, train_points))  # [n,n]
    matrix_b = jnp.concatenate([train_points, jnp.ones((n, 1), train_points.dtype)], axis=1)  # [n,3]

    top = jnp.concatenate([matrix_a, matrix_b], axis=1)  # [n, n+3]
    bottom = jnp.concatenate([matrix_b.T, jnp.zeros((3, 3), train_points.dtype)], axis=1)
    lhs = jnp.concatenate([top, bottom], axis=0)  # [n+3, n+3]
    rhs = jnp.concatenate([train_values, jnp.zeros((3, train_values.shape[1]), train_values.dtype)], axis=0)

    coeffs = jnp.linalg.solve(lhs, rhs)  # [n+3, v]
    w, v = coeffs[:n], coeffs[n:]

    phi_q = _phi_order2(_pairwise_sq_dist(query_points, train_points))  # [m,n]
    query_b = jnp.concatenate(
        [query_points, jnp.ones((query_points.shape[0], 1), query_points.dtype)], axis=1
    )
    return phi_q @ w + query_b @ v


def _boundary_locations(height: int, width: int):
    """3x3 grid over the image minus the center -> 8 zero-flow points
    (tfa _get_boundary_locations for the reference's num_boundary_points=3).
    Static (numpy) so it stays a compile-time constant under jit."""
    import numpy as np

    ys = np.linspace(0.0, height - 1.0, 3)
    xs = np.linspace(0.0, width - 1.0, 3)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    pts = np.stack([yy.ravel(), xx.ravel()], axis=-1)  # [9, 2]
    keep = np.array([True, True, True, True, False, True, True, True, True])
    return jnp.asarray(pts[keep], jnp.float32)


def _bilinear_sample(image: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Sample image [H, W, C] at query [H*W, 2] (y, x) with edge clamping."""
    H, W = image.shape[0], image.shape[1]
    y = jnp.clip(query[:, 0], 0.0, H - 1.0)
    x = jnp.clip(query[:, 1], 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2) if H > 1 else jnp.zeros_like(y, jnp.int32)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2) if W > 1 else jnp.zeros_like(x, jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (y - y0.astype(y.dtype))[:, None]
    wx = (x - x0.astype(x.dtype))[:, None]
    top = image[y0, x0] * (1.0 - wx) + image[y0, x1] * wx
    bot = image[y1, x0] * (1.0 - wx) + image[y1, x1] * wx
    return top * (1.0 - wy) + bot * wy


def sparse_image_warp(
    image: jnp.ndarray,
    source_points: jnp.ndarray,
    dest_points: jnp.ndarray,
) -> jnp.ndarray:
    """Warp image [H, W, C] so pixels at ``source_points`` move to
    ``dest_points`` ([k, 2] (y, x) float), boundary pinned with 8 zero-flow
    points (tfa.sparse_image_warp with num_boundary_points=3).
    """
    H, W = image.shape[0], image.shape[1]
    dtype = jnp.float32
    boundary = _boundary_locations(H, W).astype(dtype)
    train_points = jnp.concatenate([dest_points.astype(dtype), boundary], axis=0)
    flows = jnp.concatenate(
        [
            dest_points.astype(dtype) - source_points.astype(dtype),
            jnp.zeros_like(boundary),
        ],
        axis=0,
    )

    ys = jnp.arange(H, dtype=dtype)
    xs = jnp.arange(W, dtype=dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([yy.ravel(), xx.ravel()], axis=-1)  # [H*W, 2]

    dense_flow = polyharmonic_interpolate(train_points, flows, grid)  # [H*W, 2]
    warped = _bilinear_sample(image.astype(dtype), grid - dense_flow)
    return warped.reshape(image.shape).astype(image.dtype)
