"""Parity tests for the Mosaic-lowerable math emulations (ops/pallas/mathx):
atan2 / unwrap-cumsum / first-max argmax vs their numpy/jnp originals, both as
plain traced code and inside a Pallas kernel body (interpret mode)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srsran_ce_tpu.ops.pallas import mathx


def test_atan2_accuracy_f32():
    rng = np.random.default_rng(0)
    y = (rng.standard_normal(100000) * 10).astype(np.float32)
    x = (rng.standard_normal(100000) * 10).astype(np.float32)
    y[:14] = [0, 0, 1, -1, 0, 1e-30, -1e-30, 5, -5, 0, -0.0, -0.0, 0.0, -0.0]
    x[:14] = [1, -1, 0, 0, 0, 1, 1, 0, 0, 0, -1.0, 1.0, -0.0, -0.0]
    got = np.asarray(mathx.atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    assert np.abs(got - want).max() < 3e-7
    # signed zeros take the numpy branch (ADVICE r04): atan2(-0.0, x<0) = -pi
    assert np.array_equal(np.signbit(got[:14]), np.signbit(want[:14]))


def test_unwrap_matches_numpy():
    rng = np.random.default_rng(1)
    ph = np.cumsum(rng.uniform(-2.5, 2.5, (8, 700)), axis=-1)
    ph_w = np.angle(np.exp(1j * ph))
    got = np.asarray(mathx.unwrap_last(jnp.asarray(ph_w)))
    want = np.unwrap(ph_w, axis=-1)
    assert np.abs(got - want).max() < 1e-12


def test_unwrap_exact_half_pi_boundary():
    # d == +pi wraps to +pi (numpy ddmod convention), d == -pi stays -pi
    ph = np.array([[0.0, np.pi, 0.0, -np.pi, 0.0]])
    got = np.asarray(mathx.unwrap_last(jnp.asarray(ph)))
    want = np.unwrap(ph, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_argmax_first_max_ties():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 4, (64, 144)).astype(np.float32)
    got = np.asarray(mathx.argmax_last(jnp.asarray(x)))
    assert np.array_equal(got, np.argmax(x, axis=-1))


def test_mathx_inside_pallas_kernel():
    """The emulations must run inside a kernel body (interpret mode here; the
    TPU lowering is exercised by the fused-front kernel's on-chip tests)."""

    def kernel(y_ref, x_ref, a_ref, u_ref, m_ref):
        y = y_ref[...]
        x = x_ref[...]
        a_ref[...] = mathx.atan2(y, x)
        u_ref[...] = mathx.unwrap_last(mathx.atan2(y, x))
        m_ref[...] = mathx.argmax_last(y).reshape(y.shape[0], 1)

    rng = np.random.default_rng(3)
    y = rng.standard_normal((8, 256)).astype(np.float32)
    x = rng.standard_normal((8, 256)).astype(np.float32)
    a, u, m = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, 256), jnp.float32),
            jax.ShapeDtypeStruct((8, 256), jnp.float32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
        ),
        interpret=True,
    )(jnp.asarray(y), jnp.asarray(x))
    want_a = np.arctan2(y, x)
    assert np.abs(np.asarray(a) - want_a).max() < 3e-7
    want_u = np.unwrap(want_a.astype(np.float64), axis=-1)
    assert np.abs(np.asarray(u) - want_u).max() < 1e-4  # f32 running sums
    assert np.array_equal(np.asarray(m)[:, 0], np.argmax(y, axis=-1))
