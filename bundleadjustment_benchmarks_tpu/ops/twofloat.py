"""Double-single ("two-float") arithmetic: f64-quality geometry on f32 units.

Why this exists: TPUs have no native f64 — XLA emulates every f64 HLO with
while-loops over bit-sliced f32 buffers, which measures ~10x slower than the
equivalent f32 op on K-sized BA tensors and dominates the LM hot path. The
only place BA *needs* beyond-f32 precision per observation is the world->
camera transform ``XX = R X + T`` (reference CameraMatrix::
transformPointIntoCameraSpace, /root/reference/src/CameraMatrix.cpp:259-261):
BAL far-field points have |R X| ~ 1e4 canceling against T to z ~ 4, so an f32
product's rounding (~6e-4 absolute) becomes a ~1e-4 relative error in z and a
~0.1 px residual error — far outside the 1e-3 px parity budget. Representing
each value as an UNEVALUATED SUM of two f32 (hi + lo, |lo| <= ulp(hi)/2) keeps
~48 bits of mantissa at pure-VPU f32 speed: the classic double-single /
compensated-arithmetic toolbox (Dekker 1971, Knuth TwoSum; same construction
as CUDA's dsmath and the float-float literature).

All ops are branch-free jnp element-wise kernels (fully fusable by XLA). No
FMA is assumed (XLA exposes none): exact products use Dekker splitting.

The module is dtype-generic but intended for f32 pairs. Error bounds
(|relative|): add ~ 2^-48, mul ~ 2^-47 — two decimal digits shy of f64,
vastly beyond the 1e-8 LM flatline threshold needs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DF(NamedTuple):
    """A two-float number: value = hi + lo (non-overlapping mantissas)."""

    hi: jax.Array
    lo: jax.Array

    @property
    def dtype(self):
        return self.hi.dtype

    @property
    def shape(self):
        return self.hi.shape

    def __getitem__(self, idx):  # type: ignore[override]
        return DF(self.hi[idx], self.lo[idx])

    def astuple(self):
        return (self.hi, self.lo)


# -- Error-free transformations ------------------------------------------------


def two_sum(a, b):
    """Knuth TwoSum: s + e == a + b exactly (6 flops, no branch)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Dekker FastTwoSum, REQUIRES |a| >= |b|: s + e == a + b exactly."""
    s = a + b
    e = b - (s - a)
    return s, e


#: Dekker split constant for f32 (2^ceil(24/2) + 1).
_SPLIT_F32 = 4097.0


def split(a):
    """Dekker split: a == hi + lo with hi/lo having <= 12 mantissa bits each."""
    t = jnp.asarray(_SPLIT_F32, a.dtype) * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    """Dekker TwoProd (FMA-free): p + e == a * b exactly (17 flops)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# -- DF arithmetic --------------------------------------------------------------


def add(x: DF, y: DF) -> DF:
    """DF + DF (sloppy double-single add; error ~ 2^-48 relative)."""
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*quick_two_sum(s, e))


def add_f(x: DF, b) -> DF:
    """DF + plain float array."""
    s, e = two_sum(x.hi, b)
    e = e + x.lo
    return DF(*quick_two_sum(s, e))


def sub(x: DF, y: DF) -> DF:
    return add(x, neg(y))


def neg(x: DF) -> DF:
    return DF(-x.hi, -x.lo)


def mul(x: DF, y: DF) -> DF:
    """DF * DF."""
    p, e = two_prod(x.hi, y.hi)
    e = e + (x.hi * y.lo + x.lo * y.hi)
    return DF(*quick_two_sum(p, e))


def mul_f(x: DF, b) -> DF:
    """DF * plain float array."""
    p, e = two_prod(x.hi, b)
    e = e + x.lo * b
    return DF(*quick_two_sum(p, e))


def prod_ff(a, b) -> DF:
    """Exact product of two plain float arrays as a DF."""
    return DF(*two_prod(a, b))


# -- Conversions ----------------------------------------------------------------


def from_f64(x) -> DF:
    """Split an f64 array into an f32 DF pair (exact; run at jit boundaries —
    it is itself an emulated-f64 op, so keep it out of per-iteration code for
    large arrays)."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return DF(hi, lo)


def from_f32(x) -> DF:
    return DF(x, jnp.zeros_like(x))


def to_f64(x: DF):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def to_f32(x: DF):
    # hi and lo are non-overlapping: hi + lo rounds to hi in f32.
    return x.hi


def from_array(x) -> DF:
    """Split any float array into a DF of its own-precision halves is not
    meaningful; this helper promotes f32 exactly and splits f64."""
    if x.dtype == jnp.float64:
        return from_f64(x)
    return from_f32(x)


# -- Reductions ------------------------------------------------------------------


def sum_df(x: DF, axis=None) -> DF:
    """Compensated sum of a DF array via pairwise tree reduction.

    Flattens ``axis`` (None = all) and combines pairs with DF adds — log2(n)
    element-wise passes, each half the previous size; total ~22n flops and
    ~2^-48-relative error, i.e. effectively an f64-accurate reduction built
    from f32 VPU ops (replaces jnp.sum(..., dtype=f64), which forces the
    emulated-f64 path on TPU).
    """
    hi, lo = x.hi, x.lo
    if axis is None:
        hi = hi.reshape(-1)
        lo = lo.reshape(-1)
        axis = 0
    if axis < 0:
        axis = hi.ndim + axis
    # Move the reduced axis first and zero-pad it to a power of two once.
    hi = jnp.moveaxis(hi, axis, 0)
    lo = jnp.moveaxis(lo, axis, 0)
    n = hi.shape[0]
    m = 1 << max(n - 1, 0).bit_length()  # next power of two
    if m != n:
        pad = [(0, m - n)] + [(0, 0)] * (hi.ndim - 1)
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    cur = DF(hi, lo)
    while cur.hi.shape[0] > 1:
        half = cur.hi.shape[0] // 2
        cur = add(
            DF(cur.hi[:half], cur.lo[:half]),
            DF(cur.hi[half:], cur.lo[half:]),
        )
    return DF(cur.hi[0], cur.lo[0])


def sum_f32(x, axis=None) -> DF:
    """Compensated sum of a plain f32 array (promote then tree-reduce)."""
    return sum_df(from_f32(x), axis=axis)


def dot_f32(a, b) -> DF:
    """Compensated dot product of two f32 arrays: exact products (two_prod)
    + DF tree sum; ~f64-quality without any f64 op."""
    return sum_df(DF(*two_prod(a.reshape(-1), b.reshape(-1))))


# -- Small linear algebra used by the BA geometry --------------------------------


def matvec3(R: DF, X: DF) -> DF:
    """Batched 3x3 DF matrix times DF 3-vector: R (..., 3, 3), X (..., 3).

    This is the precision-critical BA kernel: each product is exact
    (two_prod-based) and the 3-term accumulation is compensated, so the
    catastrophic cancellation in (R X + T).z costs no accuracy.
    """
    rows = []
    for i in range(3):
        acc = mul(DF(R.hi[..., i, 0], R.lo[..., i, 0]), DF(X.hi[..., 0], X.lo[..., 0]))
        for j in range(1, 3):
            acc = add(
                acc,
                mul(
                    DF(R.hi[..., i, j], R.lo[..., i, j]),
                    DF(X.hi[..., j], X.lo[..., j]),
                ),
            )
        rows.append(acc)
    return DF(
        jnp.stack([r.hi for r in rows], axis=-1),
        jnp.stack([r.lo for r in rows], axis=-1),
    )
