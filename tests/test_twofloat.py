"""twofloat (double-single) arithmetic vs f64 oracles.

The module exists to replace emulated f64 in the TPU hot path (see
ops/twofloat.py); here we verify it actually delivers ~2^-48-relative
accuracy, including on the BA-shaped catastrophic cancellation R X + T.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bundleadjustment_benchmarks_tpu.ops import rodrigues, twofloat as tf


def _rand(rng, shape, scale=1.0):
    return rng.standard_normal(shape) * scale


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(_rand(rng, (1000,), 1e4), jnp.float32)
    b = jnp.asarray(_rand(rng, (1000,)), jnp.float32)
    s, e = tf.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = jnp.asarray(_rand(rng, (1000,), 3e3), jnp.float32)
    b = jnp.asarray(_rand(rng, (1000,), 7.0), jnp.float32)
    p, e = tf.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    # f32*f32 is exactly representable in f64; TwoProd must capture it fully.
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_roundtrip_f64():
    rng = np.random.default_rng(2)
    x = jnp.asarray(_rand(rng, (512,), 1e4), jnp.float64)
    df = tf.from_f64(x)
    back = tf.to_f64(df)
    # from_f64's lo rounds at 2^-48 relative: the roundtrip is that accurate.
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=8e-15)


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_df_ops_accuracy(op):
    rng = np.random.default_rng(3)
    x64 = jnp.asarray(_rand(rng, (2048,), 1e4), jnp.float64)
    y64 = jnp.asarray(_rand(rng, (2048,), 2e3), jnp.float64)
    x, y = tf.from_f64(x64), tf.from_f64(y64)
    got = tf.to_f64(getattr(tf, op)(x, y))
    ref = {"add": x64 + y64, "sub": x64 - y64, "mul": x64 * y64}[op]
    # DF error is relative to the OPERAND magnitudes (~2^-48), not the result
    # (a canceling add's relative-to-result error is unbounded in any finite
    # arithmetic, f64 included).
    if op == "mul":  # products never cancel: scale by the result
        scale = np.maximum(np.abs(np.asarray(ref)), 1e-30)
    else:
        scale = np.maximum(np.abs(np.asarray(x64)), np.abs(np.asarray(y64)))
    err = np.abs(np.asarray(got - ref)) / scale
    assert err.max() < 1e-13, err.max()


def test_sum_df_catastrophic():
    # Sum of large terms canceling to a small one: plain f32 loses everything,
    # the DF tree sum keeps ~14 digits.
    rng = np.random.default_rng(4)
    big = _rand(rng, (100000,), 1e6)
    arr64 = np.concatenate([big, -big + 1e-3 * _rand(rng, (100000,))])
    rng.shuffle(arr64)
    x = tf.from_f64(jnp.asarray(arr64, jnp.float64))
    got = float(tf.to_f64(tf.sum_df(x)))
    ref = float(np.sum(arr64))  # pairwise f64
    # Error floor here is the from_f64 split rounding (2^-48 * 1e6 per term,
    # random-walking over 2e5 terms ~ 1.6e-6); plain f32 would be ~1e2.
    assert abs(got - ref) < 1e-4
    f32_sum = float(np.sum(arr64.astype(np.float32), dtype=np.float32))
    assert abs(f32_sum - ref) > 100 * max(abs(got - ref), 1e-12)


def test_sum_df_axis():
    rng = np.random.default_rng(5)
    a64 = jnp.asarray(_rand(rng, (37, 5), 1e3), jnp.float64)
    got = tf.to_f64(tf.sum_df(tf.from_f64(a64), axis=0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(a64.sum(axis=0)), rtol=1e-13)


def test_dot_f32():
    rng = np.random.default_rng(6)
    a = jnp.asarray(_rand(rng, (4097,), 1e2), jnp.float32)
    b = jnp.asarray(_rand(rng, (4097,), 1e2), jnp.float32)
    got = float(tf.to_f64(tf.dot_f32(a, b)))
    ref = float(np.dot(np.asarray(a, np.float64), np.asarray(b, np.float64)))
    assert abs(got - ref) <= 1e-8 * abs(ref) + 1e-8


def test_matvec3_cancellation():
    """The BA-critical case: |R X| ~ 1e4 canceling to O(1) after + T."""
    rng = np.random.default_rng(7)
    n = 4096
    omega = jnp.asarray(_rand(rng, (n, 3)), jnp.float64)
    R64 = rodrigues.exp_rodrigues(omega)
    X64 = jnp.asarray(_rand(rng, (n, 3), 1e4), jnp.float64)
    T64 = -jnp.einsum("kij,kj->ki", R64, X64) + jnp.asarray(
        _rand(rng, (n, 3), 4.0), jnp.float64
    )  # T chosen so R X + T ~ O(4): catastrophic cancellation
    ref = jnp.einsum("kij,kj->ki", R64, X64) + T64

    R, X, T = tf.from_f64(R64), tf.from_f64(X64), tf.from_f64(T64)
    got = tf.to_f64(tf.add(tf.matvec3(R, X), T))
    err = np.abs(np.asarray(got - ref))
    # Plain f32 would give ~6e-4 absolute error here; DF must stay ~1e-9.
    assert err.max() < 1e-8, err.max()

    f32 = np.einsum(
        "kij,kj->ki", np.asarray(R64, np.float32), np.asarray(X64, np.float32)
    ) + np.asarray(T64, np.float32)
    f32_err = np.abs(f32 - np.asarray(ref))
    assert f32_err.max() > 100 * err.max(), "cancellation case not exercised"


def test_jit_fusable():
    rng = np.random.default_rng(8)
    x64 = jnp.asarray(_rand(rng, (1024,), 1e4), jnp.float64)

    @jax.jit
    def f(x):
        df = tf.from_f64(x)
        return tf.to_f64(tf.sum_df(tf.mul(df, df)))

    got = float(f(x64))
    ref = float(jnp.sum(x64 * x64))
    assert abs(got - ref) <= 1e-10 * abs(ref)
