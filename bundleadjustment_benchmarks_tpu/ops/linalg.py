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


def eigh3x3_sym(A: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Closed-form eigendecomposition of symmetric (..., 3, 3) blocks.

    Returns (evals (..., 3) ascending, evecs (..., 3, 3)) with
    A ~= evecs @ diag(evals) @ evecs^T — a drop-in for jnp.linalg.eigh on
    batched 3x3 symmetric input. Needed because XLA's iterative eigh NaNs on
    TPU for badly scaled f64 blocks (observed on problem-21 point grams:
    945/11315 blocks came back NaN while CPU was clean), and closed form is
    also the idiomatic TPU shape: pure elementwise VPU math, no batched
    LAPACK-style iteration.

    Method: trigonometric (Cardano) eigenvalues of the scale-normalized
    deviator, then eigenvectors by the cross-product method with a
    degeneracy-aware ordering (the eigenvalue with the larger gap is
    extracted first, the middle vector completes the right-handed frame) —
    the standard robust 3x3 recipe (cf. Eberly, "A Robust Eigensolver for
    3x3 Symmetric Matrices"). All selects are elementwise ``where``s.
    """
    dt = A.dtype
    eps = jnp.asarray(jnp.finfo(dt).eps, dt)
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12 = A[..., 1, 1], A[..., 1, 2]
    a22 = A[..., 2, 2]

    # Scale-normalize (entries of BA point grams span ~1e7): everything
    # below runs on entries in [-1, 1].
    s = jnp.stack([
        jnp.abs(a00), jnp.abs(a01), jnp.abs(a02),
        jnp.abs(a11), jnp.abs(a12), jnp.abs(a22),
    ]).max(axis=0)
    sinv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 1.0)
    a00, a01, a02 = a00 * sinv, a01 * sinv, a02 * sinv
    a11, a12, a22 = a11 * sinv, a12 * sinv, a22 * sinv

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00 + b11 * b11 + b22 * b22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    ) / 6.0
    p = jnp.sqrt(p2)
    psafe = jnp.where(p > 0, p, 1.0)
    # det(B / p) / 2, clamped into acos's domain.
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detb / (2.0 * psafe * psafe * psafe), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0943951023931953, dt)
    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam_mid = 3.0 * q - lam_hi - lam_lo

    def eigvec_of(lam):
        # Rows of (A - lam I) span the eigenvector's orthogonal complement;
        # the largest pairwise cross product is its most robust estimate.
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        best = jnp.where(
            (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
            jnp.where((n02 >= n12)[..., None], c02, c12),
        )
        nbest = jnp.maximum(n01, jnp.maximum(n02, n12))
        # Fully degenerate (A ~ lam I in this row space): any unit vector.
        ex = jnp.zeros_like(best).at[..., 0].set(1.0)
        ok = (nbest > (eps * eps))[..., None]
        v = jnp.where(ok, best, ex)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # Extract the better-isolated extreme eigenvalue first, complete the
    # frame orthogonally — immune to a cluster at the other extreme.
    gap_hi = lam_hi - lam_mid
    gap_lo = lam_mid - lam_lo
    hi_first = gap_hi >= gap_lo
    lam_a = jnp.where(hi_first, lam_hi, lam_lo)
    lam_b = jnp.where(hi_first, lam_lo, lam_hi)
    v_a = eigvec_of(lam_a)
    v_b0 = eigvec_of(lam_b)
    # Orthogonalize v_b against v_a (guards clustered lam_b ~ lam_mid).
    v_b0 = v_b0 - jnp.sum(v_b0 * v_a, axis=-1, keepdims=True) * v_a
    nb = jnp.sum(v_b0 * v_b0, axis=-1, keepdims=True)
    # Fallback: any unit vector orthogonal to v_a.
    alt = jnp.cross(v_a, jnp.zeros_like(v_a).at[..., 0].set(1.0))
    alt2 = jnp.cross(v_a, jnp.zeros_like(v_a).at[..., 1].set(1.0))
    nalt = jnp.sum(alt * alt, axis=-1, keepdims=True)
    alt = jnp.where(nalt > 0.1, alt, alt2)
    v_b = jnp.where(nb > (eps * eps), v_b0, alt)
    v_b = v_b / jnp.linalg.norm(v_b, axis=-1, keepdims=True)
    v_m = jnp.cross(v_a, v_b)

    # Undo the hi/lo swap and the scaling; order ascending (eigh parity).
    v_hi = jnp.where(hi_first[..., None], v_a, v_b)
    v_lo = jnp.where(hi_first[..., None], v_b, v_a)
    evals = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1) * s[..., None]
    evecs = jnp.stack([v_lo, v_m, v_hi], axis=-1)
    return evals, evecs


def mgs_qr3(
    A: jax.Array, eps: float = 0.0, zero_deficient: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Thin QR of (..., m, 3) blocks via modified Gram-Schmidt, unrolled.

    Returns (Q (..., m, 3), R (..., 3, 3) upper-triangular with non-negative
    diagonal). Zero-padded rows contribute nothing, so ragged point blocks can
    be padded to a static m. ``eps`` guards rank-deficient columns (the
    augmented [J; sqrt(lambda) I] stacking keeps blocks full-rank for
    lambda > 0, so the default 0 is exact).

    ``zero_deficient=True``: rank-guard for UNaugmented (lambda-free) stacks —
    pivots below ~sqrt(eps) of the block's scale produce an exactly-ZERO Q
    column and R row, so Q's columns are orthonormal-or-zero and downstream
    projections (I - Q Q^T) / cross products stay exact for rank-deficient
    point blocks (e.g. single-observation points, rank <= 2).
    """
    if zero_deficient:
        fro = jnp.sqrt(jnp.sum(A * A, axis=(-2, -1)))
        tol = jnp.sqrt(jnp.finfo(A.dtype).eps).astype(A.dtype) * fro
        tiny = jnp.asarray(jnp.finfo(A.dtype).tiny, A.dtype)

        def pivot(v):
            n = jnp.sqrt(jnp.sum(v * v, axis=-1))
            ok = n > tol
            q = jnp.where(
                ok[..., None], v / jnp.maximum(n, tiny)[..., None], 0.0
            )
            return jnp.where(ok, n, 0.0), q

    else:

        def pivot(v):
            n = jnp.sqrt(jnp.sum(v * v, axis=-1))
            n = jnp.maximum(n, eps) if eps else n
            return n, v / n[..., None]

    a1, a2, a3 = A[..., 0], A[..., 1], A[..., 2]
    r11, q1 = pivot(a1)
    r12 = jnp.sum(q1 * a2, axis=-1)
    v2 = a2 - r12[..., None] * q1
    r22, q2 = pivot(v2)
    r13 = jnp.sum(q1 * a3, axis=-1)
    v3 = a3 - r13[..., None] * q1
    r23 = jnp.sum(q2 * v3, axis=-1)
    v3 = v3 - r23[..., None] * q2
    r33, q3 = pivot(v3)
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


def blocked_cholesky(S: jax.Array, block: int = 384) -> jax.Array:
    """Left-looking blocked Cholesky, statically unrolled: MXU matmuls
    instead of XLA's sequential kernel at large N.

    XLA's jnp.linalg.cholesky runs ~0.5% MFU at 2313^2 on a v5e (its
    internal panel loop is latency-bound — the round-4 p257 ledger's ~8 ms
    reduced solve). Design notes from the round-5 A/B measurements:

      * STATIC unroll over panels (python loop, nb <= ~8 at BA scales):
        a fori_loop carry of the full matrix made XLA materialize stacked
        (nb, n, n) update buffers (measured: the fori version was SLOWER
        than XLA's cholesky by ~4 ms at 2313^2);
      * LEFT-looking: each panel reads the already-computed panel columns,
        no trailing-matrix carry at all;
      * HIGHEST matmul precision: default-precision f32 matmuls run
        bf16-class passes (measured 6e-4 relative factor error vs 1e-7).

    NaN propagates exactly like jnp.linalg.cholesky's on an indefinite
    input — callers' breakdown detection keeps working. Replaces the
    reduced-camera-system factorization (schur._camera_solve_chol) at
    9N >= ~1.5k — the SimplicialLDLT analog at p257 scale
    (/root/reference/src/Eigen_ext/BacktrackLevMarqCholesky.h:272).
    """
    n = S.shape[0]
    nb = -(-n // block)
    npad = nb * block - n
    dtype = S.dtype
    hi = jax.lax.Precision.HIGHEST
    Sp = jnp.pad(S, ((0, npad), (0, npad)))
    if npad:
        ar = jnp.arange(n, nb * block)
        Sp = Sp.at[ar, ar].set(jnp.ones((), dtype))
    eye_b = jnp.eye(block, dtype=dtype)

    cols = []  # full-height (nfull, block) computed panels
    for i in range(nb):
        lo, hi_r = i * block, (i + 1) * block
        S_col = Sp[:, lo:hi_r]
        if cols:
            done = jnp.concatenate(cols, axis=1)  # (nfull, i*block)
            rowL = done[lo:hi_r]  # (block, i*block)
            C = S_col - jnp.matmul(done, rowL.T, precision=hi)
        else:
            C = S_col
        Ld = jnp.linalg.cholesky(C[lo:hi_r])
        Ldinv = jax.scipy.linalg.solve_triangular(Ld, eye_b, lower=True)
        below = jnp.matmul(C[hi_r:], Ldinv.T, precision=hi)
        panel = jnp.concatenate(
            [jnp.zeros((lo, block), dtype), Ld, below], axis=0
        )
        cols.append(panel)
    return jnp.concatenate(cols, axis=1)[:n, :n]


def blocked_tril_inv(L: jax.Array, block: int = 384) -> jax.Array:
    """Inverse of a lower-triangular matrix by statically-unrolled block
    forward substitution (same design rationale as blocked_cholesky).

    X_i: = L_ii^-1 (I_i: - sum_{k<i} L_ik X_k:) — each step is one small
    (block^2) triangular solve + one MXU matmul. Turns every subsequent
    cho_solve into two plain matvecs (Linv^T (Linv b)): at 2313^2 the
    iterative-refinement loop of schur._camera_solve_chol otherwise pays
    6 sequential XLA triangular solves per trial."""
    n = L.shape[0]
    nb = -(-n // block)
    npad = nb * block - n
    dtype = L.dtype
    hi = jax.lax.Precision.HIGHEST
    Lp = jnp.pad(L, ((0, npad), (0, npad)))
    if npad:
        ar = jnp.arange(n, nb * block)
        Lp = Lp.at[ar, ar].set(jnp.ones((), dtype))
    nfull = nb * block

    rows = []  # (block, nfull) computed block-rows of X
    for i in range(nb):
        lo, hi_r = i * block, (i + 1) * block
        Lii = Lp[lo:hi_r, lo:hi_r]
        eye_row = jnp.zeros((block, nfull), dtype).at[
            :, lo:hi_r
        ].set(jnp.eye(block, dtype=dtype))
        if rows:
            X_done = jnp.concatenate(rows, axis=0)  # (i*block, nfull)
            Lrow = Lp[lo:hi_r, : i * block]
            rhs = eye_row - jnp.matmul(Lrow, X_done, precision=hi)
        else:
            rhs = eye_row
        rows.append(
            jax.scipy.linalg.solve_triangular(Lii, rhs, lower=True)
        )
    return jnp.concatenate(rows, axis=0)[:n, :n]


def compensated_matvec_f32(S32: jax.Array, y64: jax.Array) -> jax.Array:
    """S @ y with ~2^-48 accuracy from pure-f32 VPU ops (no f64 HLOs).

    The mixed-precision reduced solve refines with f64 residuals
    r = b - S y; on TPU the f64 matvec is XLA-emulated (~2.4 ms per apply
    at 2313^2, the dominant per-trial solve cost in the round-5 ledger).
    This computes the same quantity from f32 pieces: y splits exactly into
    two f32s; the y_hi products use Dekker TwoProd (exact pair), the y_lo
    products are naturally tiny; one compensated tree-sum per row
    accumulates everything — accuracy 2^-48 |S||y|, far below the f32
    FORMATION error of S that the refinement exists to absorb. Returns
    f64 (assembled from the hi/lo pair — elementwise, cheap)."""
    from bundleadjustment_benchmarks_tpu.ops import twofloat as tf

    y_hi = y64.astype(S32.dtype)
    y_lo = (y64 - y_hi.astype(y64.dtype)).astype(S32.dtype)
    p, e = tf.two_prod(S32, y_hi[None, :])
    tail = S32 * y_lo[None, :]
    row = tf.sum_df(tf.DF(p, e + tail), axis=1)
    return row.hi.astype(y64.dtype) + row.lo.astype(y64.dtype)
