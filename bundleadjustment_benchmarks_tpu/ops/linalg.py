"""Batched small-block linear algebra kernels (closed-form, VPU-friendly).

TPU-native replacements for the reference's external sparse solvers
(SURVEY.md section 2.2): instead of Eigen's SimplicialLDLT / QRKit block QR over
CSC matrices, bundle adjustment only ever needs

  * M independent 3x3 SPD factorizations (point blocks)  -> closed-form
    batched Cholesky, pure elementwise arithmetic (no lax.linalg batching
    overhead, no dynamic shapes);
  * M independent thin QRs of stacked (m, 3) observation blocks -> batched
    modified Gram-Schmidt (3 columns unrolled);
  * one dense factorization of the small reduced camera system -> XLA
    Cholesky / tall-skinny QR (TSQR) over row chunks.

All kernels broadcast over arbitrary leading batch dimensions and are
dtype-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cholesky3x3(A: jax.Array, clamp: bool = False) -> jax.Array:
    """Lower Cholesky factor of SPD (..., 3, 3) blocks, closed form.

    ``clamp=True`` floors each pivot at a tiny positive fraction of the
    leading diagonal before the sqrt — the LDLT-like graceful handling of
    blocks whose small eigenvalues are below the dtype's formation noise
    (then L L^T factors a minutely modified, SPD block instead of NaN-ing).
    """
    a11, a21, a31 = A[..., 0, 0], A[..., 1, 0], A[..., 2, 0]
    a22, a32, a33 = A[..., 1, 1], A[..., 2, 1], A[..., 2, 2]

    if clamp:
        # The floor must sit ABOVE the dtype's gram-formation noise
        # (~eps * max_diag): pivots whose true value is below that noise can
        # come out negative, and flooring them at a much smaller constant
        # (e.g. 1e-12 in f32) yields ~1e6x-oversized inverse factors and
        # garbage steps. f64 keeps the original 1e-12 relative floor.
        eps_rel = max(1e-12, 8.0 * float(jnp.finfo(A.dtype).eps))
        floor = jnp.asarray(eps_rel, A.dtype) * jnp.maximum(
            a11, jnp.maximum(a22, a33)
        )

        def piv(x):
            return jnp.sqrt(jnp.maximum(x, floor))

    else:

        def piv(x):
            return jnp.sqrt(x)

    l11 = piv(a11)
    l21 = a21 / l11
    l31 = a31 / l11
    l22 = piv(a22 - l21 * l21)
    l32 = (a32 - l31 * l21) / l22
    l33 = piv(a33 - l31 * l31 - l32 * l32)
    zero = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([l11, zero, zero], axis=-1),
            jnp.stack([l21, l22, zero], axis=-1),
            jnp.stack([l31, l32, l33], axis=-1),
        ],
        axis=-2,
    )


def inv_lower3x3(L: jax.Array) -> jax.Array:
    """Closed-form inverse of lower-triangular (..., 3, 3) blocks."""
    l11, l21, l31 = L[..., 0, 0], L[..., 1, 0], L[..., 2, 0]
    l22, l32, l33 = L[..., 1, 1], L[..., 2, 1], L[..., 2, 2]
    i11 = 1.0 / l11
    i22 = 1.0 / l22
    i33 = 1.0 / l33
    i21 = -l21 * i11 * i22
    i32 = -l32 * i22 * i33
    i31 = (l21 * l32 - l31 * l22) * i11 * i22 * i33
    zero = jnp.zeros_like(l11)
    return jnp.stack(
        [
            jnp.stack([i11, zero, zero], axis=-1),
            jnp.stack([i21, i22, zero], axis=-1),
            jnp.stack([i31, i32, i33], axis=-1),
        ],
        axis=-2,
    )


def cho_solve3x3(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve (L L^T) x = b for (..., 3, 3) factors and (..., 3) rhs."""
    Linv = inv_lower3x3(L)
    y = jnp.einsum("...ij,...j->...i", Linv, b)
    return jnp.einsum("...ji,...j->...i", Linv, y)


def mgs_qr3(A: jax.Array, eps: float = 0.0) -> tuple[jax.Array, jax.Array]:
    """Thin QR of (..., m, 3) blocks via modified Gram-Schmidt, unrolled.

    Returns (Q (..., m, 3), R (..., 3, 3) upper-triangular with non-negative
    diagonal). Zero-padded rows contribute nothing, so ragged point blocks can
    be padded to a static m. ``eps`` guards rank-deficient columns (the
    augmented [J; sqrt(lambda) I] stacking keeps blocks full-rank for
    lambda > 0, so the default 0 is exact).
    """
    def norm(v):
        n = jnp.sqrt(jnp.sum(v * v, axis=-1))
        return jnp.maximum(n, eps) if eps else n

    a1, a2, a3 = A[..., 0], A[..., 1], A[..., 2]
    r11 = norm(a1)
    q1 = a1 / r11[..., None]
    r12 = jnp.sum(q1 * a2, axis=-1)
    v2 = a2 - r12[..., None] * q1
    r22 = norm(v2)
    q2 = v2 / r22[..., None]
    r13 = jnp.sum(q1 * a3, axis=-1)
    v3 = a3 - r13[..., None] * q1
    r23 = jnp.sum(q2 * v3, axis=-1)
    v3 = v3 - r23[..., None] * q2
    r33 = norm(v3)
    q3 = v3 / r33[..., None]
    Q = jnp.stack([q1, q2, q3], axis=-1)
    zero = jnp.zeros_like(r11)
    R = jnp.stack(
        [
            jnp.stack([r11, r12, r13], axis=-1),
            jnp.stack([zero, r22, r23], axis=-1),
            jnp.stack([zero, zero, r33], axis=-1),
        ],
        axis=-2,
    )
    return Q, R


def tsqr(A: jax.Array, chunk: int = 4096) -> jax.Array:
    """R factor of a tall-skinny (m, n) matrix via chunked TSQR.

    The TPU replacement for the reference's multithreaded DenseBlockedThinQR
    (BAFunctor.h:101) and, with the augmented-column trick, for SuiteSparse
    SPQR's whole-matrix QR (BAFunctor.h:114-116): QR each row chunk in a batch,
    stack the R factors, reduce. Only R is returned (with the sign convention
    of jnp.linalg.qr); callers carry rhs columns inside A to recover Q^T b.
    """
    m, n = A.shape
    if m <= max(chunk, n):
        return jnp.linalg.qr(A, mode="r")
    nchunks = -(-m // chunk)
    pad = nchunks * chunk - m
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, n), A.dtype)], axis=0)
    blocks = A.reshape(nchunks, chunk, n)
    rs = jnp.linalg.qr(blocks, mode="r")  # (nchunks, n, n)
    return tsqr(rs.reshape(nchunks * n, n), chunk=chunk)


def solve_upper_triangular(Rmat: jax.Array, b: jax.Array) -> jax.Array:
    """Solve R x = b for upper-triangular R (n, n)."""
    return jax.scipy.linalg.solve_triangular(Rmat, b, lower=False)
