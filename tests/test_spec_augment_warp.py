"""Polyharmonic-spline sparse image warp vs independent oracles.

tensorflow_addons is not installed here, so the spline solver (the
mathematical core of tfa.sparse_image_warp) is validated against
scipy.interpolate.RBFInterpolator with kernel='thin_plate_spline', degree=1
— the identical order-2 polyharmonic formulation (phi(r) = r^2 log r plus an
affine polynomial).  The full warp is then checked for its defining
geometric properties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from speech_recognition_tpu.ops.warp import (
    polyharmonic_interpolate,
    sparse_image_warp,
)


def test_spline_matches_scipy_thin_plate():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    rng = np.random.default_rng(0)
    train_pts = rng.uniform(0, 50, (9, 2)).astype(np.float32)
    train_vals = rng.standard_normal((9, 2)).astype(np.float32)
    query = rng.uniform(0, 50, (40, 2)).astype(np.float32)

    ours = np.asarray(
        polyharmonic_interpolate(jnp.asarray(train_pts), jnp.asarray(train_vals), jnp.asarray(query))
    )
    rbf = scipy_interp.RBFInterpolator(train_pts, train_vals, kernel="thin_plate_spline", degree=1)
    theirs = rbf(query).astype(np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_spline_interpolates_exactly_at_control_points():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 20, (7, 2)).astype(np.float32)
    vals = rng.standard_normal((7, 1)).astype(np.float32)
    out = np.asarray(polyharmonic_interpolate(jnp.asarray(pts), jnp.asarray(vals), jnp.asarray(pts)))
    np.testing.assert_allclose(out, vals, rtol=1e-3, atol=1e-3)


def test_sparse_image_warp_moves_source_to_dest():
    """A bump at the source location must appear at the dest location."""
    T, F = 60, 21
    image = np.zeros((T, F, 1), np.float32)
    image[30, 10, 0] = 1.0  # bump at (30, 10)
    src = jnp.array([[30.0, 10.0]])
    dst = jnp.array([[36.0, 10.0]])
    warped = np.asarray(sparse_image_warp(jnp.asarray(image), src, dst))
    assert warped.shape == image.shape
    # the bump's mass moved to ~(36, 10)
    peak = np.unravel_index(np.argmax(warped[..., 0]), warped[..., 0].shape)
    assert abs(peak[0] - 36) <= 1 and abs(peak[1] - 10) <= 1
    # boundaries pinned: zero flow -> corners unchanged
    np.testing.assert_allclose(warped[0, 0], image[0, 0], atol=1e-4)
    np.testing.assert_allclose(warped[-1, -1], image[-1, -1], atol=1e-4)


def test_sparse_image_warp_identity_when_no_displacement():
    rng = np.random.default_rng(2)
    image = rng.standard_normal((40, 16, 3)).astype(np.float32)
    pt = jnp.array([[20.0, 8.0]])
    warped = np.asarray(sparse_image_warp(jnp.asarray(image), pt, pt))
    np.testing.assert_allclose(warped, image, rtol=1e-4, atol=1e-4)


def test_warp_displacement_decays_with_frequency_distance():
    """tfa semantics the two-segment approximation lacked: rows far from the
    center-frequency control point move less than the center row."""
    from speech_recognition_tpu.ops.warp import polyharmonic_interpolate as interp
    from speech_recognition_tpu.ops.warp import _boundary_locations

    T, F = 100, 41
    src_t, dst_t = 50.0, 60.0
    ctr = F // 2
    boundary = np.asarray(_boundary_locations(T, F))
    train = np.concatenate([[[dst_t, ctr]], boundary]).astype(np.float32)
    flows = np.concatenate([[[dst_t - src_t, 0.0]], np.zeros_like(boundary)]).astype(np.float32)
    query = np.array([[dst_t, ctr], [dst_t, 0.0]], np.float32)
    out = np.asarray(interp(jnp.asarray(train), jnp.asarray(flows), jnp.asarray(query)))
    assert abs(out[0, 0] - 10.0) < 1e-2  # full displacement at the control point
    assert abs(out[1, 0]) < abs(out[0, 0])  # decays toward the edge row
