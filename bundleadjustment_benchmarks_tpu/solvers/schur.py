"""Damped-system solvers: five strategies, one Schur-complement engine.

The reference compiles five binaries around five sparse factorizations of the
same damped system (J^T J + lambda I) dx = -J^T f (SURVEY.md section 0):

  CHOLESKY  SimplicialLDLT of the whole normal matrix
            (BacktrackLevMarqCholesky.h:272-282)
  QRCHOL    block-diagonal QR over 3-column point blocks of [J; sqrt(l) I],
            then LDLT of the reduced camera normal matrix J2bot^T J2bot
            (BacktrackLevMarqQRChol.h:286-341) — classic Schur complement
  QRKIT     same left block QR + dense thin QR of the reduced camera block
  MOREQR    QR of J once per outer iteration; per damping trial only a small
            QR of [R; sqrt(l) I] (BacktrackLevMarqMore.h:287-328)
  SPQR      SuiteSparse QR of the whole Jacobian

On TPU the Jacobian stays implicit as (K,2,9)/(K,2,3) blocks and ALL five
strategies become variants of one batched Schur elimination — which is exactly
the block structure those CPU factorizations exploit symbolically:

  point factor   'chol': closed-form Cholesky of V_p + lambda I (M batched 3x3)
                 'qr':   batched MGS QR of each point's stacked observation
                         rows augmented with sqrt(lambda) I_3 — forms the
                         triangular factor WITHOUT squaring, the
                         BlockDiagonalSparseQR analog
                 'eig':  (moreqr) closed-form eigendecomposition of V_p once
                         per outer iteration; per trial the damped inverse is
                         (D + lambda)^-1 in the cached eigenbasis, so the
                         expensive work amortizes across damping trials — the
                         TPU-native analog of More's cached-R refactor
  camera solve   'chol':      dense Cholesky of the reduced camera system
                              S = blkdiag(U_c + lambda I) - Z^T Z  (9N x 9N)
                 'qr_cached': (qrkit) Moré-style cached camera QR: ONE
                              lambda-free factorization per outer iteration —
                              rank-guarded MGS QR of the raw point stacks
                              (Q1_0, Rpp), the projected-camera compression
                              Rcc (R-only CholeskyQR of the lambda-free
                              reduced gram), and the cross rows
                              QtRpc = Qh^T Q1_0^T [A_cam | b] — then per
                              damping trial only a SMALL row-QR of
                              [Rcc; sqrt(lam/(eh+lam)) QtRpc; sqrt(lam) I]
                              (_redamp_qr). The TPU re-design of the
                              reference's DenseBlockedThinQR camera stage
                              (BAFunctor.h:98-102) with Moré's factor-once /
                              re-damp-cheap trick (BacktrackLevMarqMore.h:
                              287-328) applied at the camera level.
                 'qr_full':   (spqr) whole-matrix augmented QR, re-factored
                              from scratch EVERY damping trial (SuiteSparse
                              SPQR semantics — the fork's BacktrackLevMarq
                              calls SPQR per trial, BAFunctor.h:114-116):
                              batched orthogonal MGS QR of the augmented
                              point panels + chunked TSQR over the projected
                              camera rows (camera_tsqr_reduce). On TPU in
                              f64, where emulated Householder panels run
                              ~150x slower than f64 matmuls (BASELINE.md
                              round-4 probes), the camera-stage reduction
                              runs in R-only CholeskyQR form
                              (_spqr_gram_solve) — same factorization, MXU
                              arithmetic; the f32/df32 drives keep true
                              Householder chunks.

Z is the (3M x 9N) matrix of point-whitened coupling blocks C_i = W_i L_p^-T
scattered at (point-row, camera-col); Z^T Z = sum_p W_p Vhat_p^-1 W_p^T is one
big MXU matmul instead of a sparse triangular solve.

Mode mapping:  cholesky=(chol, chol)   qrchol=(qr, chol)
               qrkit=(qr, qr_cached)   spqr=(qr, qr_full)   moreqr=(eig, chol)

The qr_cached identity (why the per-trial re-damp is exact): after the
lambda-free QR of [J | b], the damped camera system's gram is
    S(lam) = Rcc^T Rcc + lam I + lam * Rpc^T (Rpp Rpp^T + lam I)^-1 Rpc
(derivation: I - Rpp (Rpp^T Rpp + lam I)^-1 Rpp^T = lam (Rpp Rpp^T + lam I)^-1
for the square 3x3 Rpp), so with Rpp Rpp^T = Qh diag(eh) Qh^T the fill-in of
eliminating the damped point columns is EXACTLY the rows
sqrt(lam/(eh+lam)) . Qh^T Rpc — a diagonal rescaling of the cached QtRpc.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.ops import linalg
from bundleadjustment_benchmarks_tpu.ops.jacobian import JacobianBlocks

MODES = ("cholesky", "qrchol", "qrkit", "moreqr", "spqr")


def _env_flag(name: str) -> bool:
    """Parse an opt-in environment flag as a BOOLEAN (ADVICE r4: a bare
    truthiness test made BA_QRKIT_GRAM=0 force-ENABLE the flag).

    NOTE trace-time semantics: these flags are read while tracing jitted
    solvers, so their value is baked into the compiled executable — toggling
    one mid-process has no effect on already-compiled traces. Set them
    before the first solve (they exist for tests and offline experiments,
    not as runtime switches)."""
    return os.environ.get(name, "").strip().lower() in ("1", "true", "yes", "on")

#: (point_factor, camera_solver) per mode. qrkit and spqr are DISTINCT
#: realizations (VERDICT r3 item 2): qrkit caches the lambda-free camera QR
#: per outer iteration and re-damps per trial; spqr re-factors the whole
#: augmented matrix every trial (SuiteSparse call semantics).
MODE_STRATEGY = {
    "cholesky": ("chol", "chol"),
    "qrchol": ("qr", "chol"),
    "qrkit": ("qr", "qr_cached"),
    "spqr": ("qr", "qr_full"),
    "moreqr": ("eig", "chol"),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SchurContext:
    """Lambda-independent per-outer-iteration data (cached across damping trials).

    The reference recomputes J once per outer iteration and re-factors per
    trial; this context is the TPU analog of 'everything computable from J'.
    """

    U: jax.Array  # (N, 9, 9) sum Jc^T Jc per camera
    V: jax.Array  # (M, 3, 3) sum Jp^T Jp per point
    W: jax.Array  # (K, 9, 3) Jc_i^T Jp_i per observation
    g_cams: jax.Array  # (N, 9)  -(J^T f) camera part
    g_pts: jax.Array  # (M, 3)  -(J^T f) point part
    max_colnorm_sq: jax.Array  # max_j ||J col j||^2 = max diag(J^T J)
    # 'qr' point factor: per-point stacked observation rows (M, 2*Lmax, 3)
    Jp_stacked: Optional[jax.Array]
    # 'qr' camera solver: per-point stacked camera rows and rhs
    Jc_stacked: Optional[jax.Array]  # (M, 2*Lmax, 9)
    rhs_stacked: Optional[jax.Array]  # (M, 2*Lmax)
    # 'eig' point factor (moreqr): eigenbasis of V and pre-rotated coupling
    evecs: Optional[jax.Array]  # (M, 3, 3)
    evals: Optional[jax.Array]  # (M, 3) clamped >= 0
    WQ: Optional[jax.Array]  # (K, 9, 3) W_i Q_p — cached coupling, trials
    #                          only reweight rows by (D + lambda)^-1
    y0: Optional[jax.Array]  # (M, 3) Q^T g_pts
    # Cached eig-weighted pair-gram stacks (camera_solver 'chol' + PairTables;
    # see solve_damped): the lambda-independent GATHERS of WQ into the pair /
    # camera tables, done once per outer iteration. Damping trials then only
    # gather the 3 eigenvalue weights and run the contractions — the More
    # 'factor once, re-damp cheap' trick applied to the Schur gram itself.
    pairA: Optional[jax.Array] = None  # (27, R, Lrow) WQ at pair member a
    pairB: Optional[jax.Array] = None  # (27, R, Lrow) WQ at pair member b
    #: (27, N, Lcam) WQ at camera slots — or a TUPLE of per-degree-band
    #: (27, N_i, w_i) stacks when the problem carries cam_banded (then
    #: cam_pt is the matching tuple and cam_unperm restores camera order).
    diagG: Optional[object] = None
    row_pt: Optional[jax.Array] = None  # (R, Lrow) point of pair, sentinel M
    cam_pt: Optional[object] = None  # (N, Lcam) point of slot, sentinel M
    cam_unperm: Optional[jax.Array] = None  # (N,) band order -> camera order
    # 'qr_cached' camera solver (qrkit): lambda-free factors cached per outer
    # iteration (see the module docstring's qr_cached identity).
    QtRpc: Optional[jax.Array] = None  # (M, 3, 9N+1) Qh^T Q1_0^T [A_cam | b]
    fill_evals: Optional[jax.Array] = None  # (M, 3) eig of Rpp Rpp^T, >= 0
    Rcc_aug: Optional[jax.Array] = None  # (9N+1, 9N+1) lambda-free camera R
    # 'qr_cached' PAIR-FORM cache (round 5; the memory-bounded realization —
    # see build_context): the dense cross rows QtRpc compress to the planar
    # per-observation blocks B27 (gathered into the SAME pair/camera tables
    # the chol modes use: for qrkit contexts pairA/pairB/diagG/row_pt/cam_pt
    # above hold B27 stacks, not WQ stacks), plus the cached lambda-free
    # reduced system S0 = blkdiag(U) - sum B^T B. A damping trial adds the
    # PSD correction sum B^T (lam/(eh+lam)) B via the weighted pair gram —
    # O(sum_p L_p^2) work instead of the O(3M (9N)^2) dense-row gram.
    qr_cqT: Optional[jax.Array] = None  # (3, M) Qh^T Q1_0^T (-f) rhs rows
    qr_S0cam: Optional[jax.Array] = None  # (9N, 9N) lambda-free reduced S0
    qr_b0: Optional[jax.Array] = None  # (9N,) lambda-free reduced rhs


def _scatter_z(Ct: jax.Array, cam_idx, pt_idx, n_cameras: int, n_points: int):
    """Scatter per-observation (3, 9) blocks into the dense (3M, 9N) Z matrix.

    Only for small problems/tests — at problem-257 scale the XLA scatter
    materializes tens of GB; the production path is _schur_gram_chunked.
    """
    Z = jnp.zeros((n_points, 3, n_cameras, 9), Ct.dtype)
    Z = Z.at[pt_idx, :, cam_idx, :].add(Ct)
    return Z.reshape(n_points * 3, n_cameras * 9)


def table_segment_sum(values, table, slot_chunk: int = 512):
    """Scatter-free segment sum: out[s] = sum_l values[table[s, l]].

    ``table`` is a (S, L) gather table with sentinel len(values) (an
    all-zero padding row is appended). XLA's scatter-based segment_sum
    lowers catastrophically on TPU (see _schur_gram_chunked); a gather + sum
    over slots is pure bandwidth. Large L is chunked to bound the gathered
    intermediate.
    """
    k = values.shape[0]
    s, l = table.shape
    values_ext = jnp.concatenate(
        [values, jnp.zeros((1,) + values.shape[1:], values.dtype)], axis=0
    )
    if l <= slot_chunk:
        return values_ext[table].sum(axis=1)
    nch = -(-l // slot_chunk)
    pad = nch * slot_chunk - l
    table_p = jnp.pad(table, ((0, 0), (0, pad)), constant_values=k)
    table_c = jnp.moveaxis(
        table_p.reshape(s, nch, slot_chunk), 1, 0
    )  # (nch, S, slot_chunk)

    def body(acc, tbl):
        return acc + values_ext[tbl].sum(axis=1), None

    init = jnp.zeros((s,) + values.shape[1:], values.dtype)
    out, _ = jax.lax.scan(body, init, table_c)
    return out


def segment_gram_and_vec(blk, f, table, slot_chunk: int = 1024):
    """Per-segment Jacobian gram + gradient via gather-stack + batched MXU dots.

    For segment s (a camera or a point), gathers its observation row blocks
    into a padded stack and computes both
        G[s] = sum_{i in s} blk_i^T blk_i   and   v[s] = sum_{i in s} blk_i^T f_i
    as ONE batched dot_general each. This replaces materializing the (K, D, D)
    per-observation gram tensor + a gather segment-sum: ~4.5x less gather
    traffic for D=9 and the reduction rides the MXU instead of a VPU tree-sum.

    Args:
      blk: (K, rows, D) per-observation row blocks (rows=2 for residual
        blocks, 3 for Z's coupling rows).
      f: (K, rows) residual rows.
      table: (S, L) gather table with sentinel K (padded rows gather zeros).
    Returns (G (S, D, D), v (S, D)).
    """
    k, nrows, d = blk.shape
    s, l = table.shape
    blk_ext = jnp.concatenate([blk, jnp.zeros((1, nrows, d), blk.dtype)], axis=0)
    f_ext = jnp.concatenate([f, jnp.zeros((1, nrows), f.dtype)], axis=0)
    acc = jnp.float32 if blk.dtype == jnp.bfloat16 else jnp.dtype(blk.dtype)

    def gram_of(tbl):
        rows = blk_ext[tbl].reshape(tbl.shape[0], -1, d)  # (S, 2l, D)
        rf = f_ext[tbl].reshape(tbl.shape[0], -1)  # (S, 2l)
        G = jax.lax.dot_general(
            rows, rows, (((1,), (1,)), ((0,), (0,))), preferred_element_type=acc
        )
        v = jax.lax.dot_general(
            rows, rf, (((1,), (1,)), ((0,), (0,))), preferred_element_type=acc
        )
        return G, v

    if l <= slot_chunk:
        return gram_of(table)
    # Chunk the slot dimension so the gathered stack stays bounded (cameras
    # can have tens of thousands of observations at problem-257 scale).
    nch = -(-l // slot_chunk)
    pad = nch * slot_chunk - l
    table_p = jnp.pad(table, ((0, 0), (0, pad)), constant_values=k)
    table_c = jnp.moveaxis(table_p.reshape(s, nch, slot_chunk), 1, 0)

    def body(carry, tbl):
        G, v = carry
        Gc, vc = gram_of(tbl)
        return (G + Gc, v + vc), None

    init = (jnp.zeros((s, d, d), acc), jnp.zeros((s, d), acc))
    (G, v), _ = jax.lax.scan(body, init, table_c)
    return G, v


def planar_segment_gram(P, table, budget_bytes: int = 128 << 20):
    """Per-segment gram of PLANAR row blocks: one gather + one contraction.

    ``P`` is (R, C, K) — R block-rows of C components each, K on the lane
    axis (the planar layout; see projection.planar_camera_pack). For segment
    s, M[s][c][d] = sum_l sum_r P[r, c, table[s, l]] * P[r, d, table[s, l]].
    Appending the residual row as an extra component makes M carry the
    gradient for free (column [., d] against the residual component).

    Replaces the blocky gather-stack (segment_gram_and_vec): gathering
    (K, R, C) block tensors costs a strided relayout per slice and pays the
    (8, 128) tile tax on tiny trailing dims — measured 3x slower than this
    planar form at problem-21 scale. Large L is chunked.
    """
    r, c, k = P.shape
    s, l = table.shape
    acc = jnp.float32 if P.dtype == jnp.bfloat16 else jnp.dtype(P.dtype)
    P_ext = jnp.concatenate([P, jnp.zeros((r, c, 1), P.dtype)], axis=2)
    slot_chunk = max(64, budget_bytes // max(r * c * s * P.dtype.itemsize, 1))

    def seg(tbl):
        G = P_ext[:, :, tbl]  # (R, C, S, l)
        return jnp.einsum("rcsl,rdsl->scd", G, G, preferred_element_type=acc)

    if l <= slot_chunk:
        return seg(table)
    nch = -(-l // slot_chunk)
    pad = nch * slot_chunk - l
    tbl = jnp.pad(table, ((0, 0), (0, pad)), constant_values=k)
    tbl = jnp.moveaxis(tbl.reshape(s, nch, slot_chunk), 1, 0)

    def body(a, t):
        return a + seg(t), None

    out, _ = jax.lax.scan(body, jnp.zeros((s, c, c), acc), tbl)
    return out


def _gram_chunk_size(n_cameras: int, n_points: int, budget_bytes: int = 256 << 20):
    """Points per chunk so the per-chunk dense Z block stays under budget."""
    per_point = n_cameras * 9 * 3 * 4  # f32 Z rows for one point
    return max(256, min(n_points, budget_bytes // max(per_point, 1)))


def _schur_gram_chunked(C, w, y, cam_idx, table, n_cameras: int, mm):
    """Accumulate S = Z^T diag(w) Z and b_part = Z^T (w * y) without
    materializing the full (3M, 9N) Z.

    Z's rows for point p hold the (3, 9) blocks C_i^T of p's observations at
    their camera block-columns. Points are processed in chunks via the padded
    per-point gather ``table`` (sentinel K -> zero rows); each chunk scatters
    into a bounded (P, 3, N, 9) buffer and feeds one MXU matmul — flop count
    identical to the dense Z^T Z, memory bounded, scan-accumulated.

    Args:
      C: (K, 9, 3) per-observation coupling blocks (mm dtype).
      w: optional (M, 3) row weights (the moreqr (D + lambda)^-1), or None.
      y: (M, 3) per-point rhs rows.
      cam_idx: (K,) observation -> camera.
      table: (M, Lmax) point -> observation rows, sentinel K.
    Returns (S_sum (9N, 9N), b_sum (9N,)) in the accumulation dtype
    (f32 when mm is bf16, else mm).
    """
    m, lmax = table.shape
    k = cam_idx.shape[0]
    n9 = 9 * n_cameras
    chunk = _gram_chunk_size(n_cameras, m)
    nchunks = -(-m // chunk)
    # Accumulate in f32 when the operands are bf16 (MXU-native accumulation).
    acc_mm = jnp.float32 if jnp.dtype(mm) == jnp.bfloat16 else jnp.dtype(mm)

    C_ext = jnp.concatenate([C.astype(mm), jnp.zeros((1, 9, 3), mm)], axis=0)
    cam_ext = jnp.concatenate([cam_idx, jnp.zeros((1,), cam_idx.dtype)])

    pad = nchunks * chunk - m
    table_p = jnp.pad(table, ((0, pad), (0, 0)), constant_values=k)
    y_p = jnp.pad(y.astype(mm), ((0, pad), (0, 0)))
    w_p = None if w is None else jnp.pad(w.astype(mm), ((0, pad), (0, 0)))

    table_c = table_p.reshape(nchunks, chunk, lmax)
    y_c = y_p.reshape(nchunks, chunk, 3)
    w_c = None if w is None else w_p.reshape(nchunks, chunk, 3)

    def body(carry, inp):
        S, b = carry
        if w is None:
            tbl, yc = inp
            wc = None
        else:
            tbl, yc, wc = inp
        Cc = C_ext[tbl]  # (P, Lmax, 9, 3)
        camc = cam_ext[tbl]  # (P, Lmax)
        # Place each slot's (3, 9) block at its camera block-column WITHOUT a
        # scatter (XLA scatter-add lowers catastrophically at this scale).
        ar_n = jnp.arange(n_cameras, dtype=camc.dtype)
        if lmax <= 8:
            # Few slots: unrolled masked broadcast-adds (pure VPU passes,
            # measured ~2x faster than the one-hot contraction at 257-scale).
            Zc = jnp.zeros((chunk, 3, n_cameras, 9), mm)
            CcT = jnp.swapaxes(Cc, -1, -2)  # (P, Lmax, 3, 9)
            for sl in range(lmax):
                mask = (camc[:, sl, None] == ar_n).astype(mm)  # (P, N)
                Zc = Zc + mask[:, None, :, None] * CcT[:, sl, :, None, :]
        else:
            # Many slots: one-hot contraction (batched small matmuls).
            onehot = (camc[..., None] == ar_n).astype(mm)  # (P, Lmax, N)
            Zc = jnp.einsum(
                "pln,plrj->prnj", onehot, jnp.swapaxes(Cc, -1, -2)
            )  # (P, 3, N, 9)
        Zc = Zc.reshape(chunk * 3, n9)
        if wc is None:
            Zw = Zc
            yw = yc
        else:
            Zw = Zc * wc.reshape(-1)[:, None]
            yw = yc * wc
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_mm,
        )
        S = S + dot(Zc, Zw)
        b = b + dot(Zc, yw.reshape(-1)[:, None])[:, 0]
        return (S, b), None

    init = (jnp.zeros((n9, n9), acc_mm), jnp.zeros((n9,), acc_mm))
    xs = (table_c, y_c) if w is None else (table_c, y_c, w_c)
    (S, b), _ = jax.lax.scan(body, init, xs)
    return S, b


def planar_table_sum(P, table, budget_bytes: int = 64 << 20):
    """Planar segment sum: out[:, s] = sum_l P[:, table[s, l]].

    ``P`` is (C, K) planar components (K on the lane axis — contiguous,
    full-tile rows; see projection.planar_camera_pack for the layout
    rationale); ``table`` an (S, L) gather table with sentinel K. Large L is
    chunked so the gathered (C, S, chunk) intermediate stays under budget.
    """
    c, k = P.shape
    s, l = table.shape
    P_ext = jnp.concatenate([P, jnp.zeros((c, 1), P.dtype)], axis=1)
    slot_chunk = max(64, budget_bytes // max(c * s * P.dtype.itemsize, 1))
    if l <= slot_chunk:
        return P_ext[:, table].sum(axis=2)
    nch = -(-l // slot_chunk)
    pad = nch * slot_chunk - l
    tbl = jnp.pad(table, ((0, 0), (0, pad)), constant_values=k)
    tbl = jnp.moveaxis(tbl.reshape(s, nch, slot_chunk), 1, 0)

    def body(acc, t):
        return acc + P_ext[:, t].sum(axis=2), None

    out, _ = jax.lax.scan(body, jnp.zeros((c, s), P.dtype), tbl)
    return out


def banded_planar_gram(P, banded, budget_bytes: int = 128 << 20):
    """planar_segment_gram over a BandedTable: per-band grams, one unperm gather.

    Each band gathers only its own width, so the padded-slot waste of the
    single (S, Lmax) table (2-5x on BAL degree distributions) disappears.
    Returns (S, C, C) in NATURAL segment order.

    Planar-product realization (round-5 ledger, default at every scale —
    BA_GRAM_PROD_K raises the threshold for A/B probes): gathering the
    (R, C, slots) operand stacks and feeding the per-segment gram einsum
    made XLA pick a (slots, R, C) layout with the C=10 components on the
    LANE axis — ~13x tile padding, ~10 ms of the 17.6 ms p257 prepare
    (and 0.4 ms of the 1.7 ms p21 prepare). Instead compute the C(C+1)/2
    symmetric products ONCE in planar (55, K) form (no gather, full-tile
    lanes) and reduce them with the planar TABLE SUM — the same
    well-tiled lane-gather the pair stacks use. Products in the f32 VPU
    pass the bf16 MXU gram would have produced anyway.
    """
    r, c, k = P.shape
    if k >= int(os.environ.get('BA_GRAM_PROD_K','0')):
        import numpy as np

        iu, ju = np.triu_indices(c)
        acc = jnp.float32 if P.dtype == jnp.bfloat16 else jnp.dtype(P.dtype)
        Pa = P.astype(acc)
        prod = (Pa[:, iu, :] * Pa[:, ju, :]).sum(0)  # (C*(C+1)/2, K)
        sums = banded_planar_sum(prod, banded, budget_bytes)  # (55, S)
        s = sums.shape[1]
        out = jnp.zeros((s, c, c), acc)
        out = out.at[:, iu, ju].set(sums.T)
        out = out.at[:, ju, iu].set(sums.T)
        return out
    outs = [planar_segment_gram(P, t, budget_bytes) for t in banded.tables]
    return jnp.concatenate(outs, axis=0)[banded.unperm]


def banded_planar_sum(P, banded, budget_bytes: int = 64 << 20):
    """planar_table_sum over a BandedTable; returns (C, S) in natural order."""
    outs = [planar_table_sum(P, t, budget_bytes) for t in banded.tables]
    return jnp.concatenate(outs, axis=1)[:, banded.unperm]


def point_coupling_sum(W, dxc, cam_idx, problem):
    """t_contrib[p] = sum_{k in p} W_k^T dxc[cam_k]  (M, 3), natural order.

    The back-substitution segment sum; banded when the problem carries
    pt_banded (the padded point table wastes ~4x gather bandwidth on BAL)."""
    Wdx = jnp.einsum("kij,ki->kj", W, dxc[cam_idx])  # (K, 3)
    banded = getattr(problem, "pt_banded", None)
    if banded is None:
        return table_segment_sum(Wdx, problem.pt_obs_idx)
    return banded_planar_sum(Wdx.T, banded).T


def _stack_dtype(mm, stack_f32: bool = False, k_obs=None):
    """Storage dtype for the cached pair-gram stacks.

    Round-5 re-measurement: the fused pair einsum runs f32 VPU products
    (not the bf16 MXU pass the original bf16-storage rationale assumed),
    so the stack dtype is now a pure size/bandwidth trade measured at the
    bench scales — f32 stacks win at p21 scale (226.9 vs 211 it/s: fewer
    conversion fusions and faster while-boundary copies), bf16 wins at
    p257 scale (17.5 vs 15.5 it/s: the 27x617k stacks' gather/copy bytes
    dominate). Switch on the observation count; ``stack_f32=True``
    (LMConfig.stack_f32) forces the matmul dtype at any size.
    """
    if stack_f32:
        return jnp.dtype(mm)
    if jnp.dtype(mm) == jnp.float32 and jax.default_backend() == "tpu":
        if k_obs is not None and k_obs < 100_000:
            return jnp.dtype(mm)
        return jnp.bfloat16
    return jnp.dtype(mm)


#: Upper-triangle component order of a symmetric 9x9 block.
_SYM45 = [(i, j) for i in range(9) for j in range(i, 9)]


def _diag_gram_dot(C27, yg, cam_obs_idx, acc, budget_bytes: int = 64 << 20):
    """Per-camera diagonal grams + rhs as ONE batched contraction.

    Augment the 27 coupling components with the 3 gathered rhs rows, gather
    the (30, N, Lcam) per-camera stacks, and contract (c, l) per camera:
    M10[n, i, j] = sum_{c,l} G[i, c, n, l] G[j, c, n, l]. The [i<9, j<9]
    block is the diagonal gram, column [:, :9, 9] is Z^T y's camera part.
    One dot_general instead of 54 planar products — at problem-21 scale the
    per-kernel launch overhead of the product list dominated the gram.
    Lcam is chunked to keep the gathered stack under ``budget_bytes``.
    """
    k = C27.shape[1]
    CY = jnp.concatenate([C27, yg], axis=0)  # (30, K)
    CY_ext = jnp.concatenate([CY, jnp.zeros((30, 1), CY.dtype)], axis=1)
    n, lcam = cam_obs_idx.shape

    def seg(tbl):
        G = CY_ext[:, tbl].reshape(10, 3, n, tbl.shape[1])
        return jnp.einsum("icnl,jcnl->nij", G, G, preferred_element_type=acc)

    slot_chunk = max(64, budget_bytes // max(30 * n * CY.dtype.itemsize, 1))
    if lcam <= slot_chunk:
        return seg(cam_obs_idx)
    nch = -(-lcam // slot_chunk)
    pad = nch * slot_chunk - lcam
    tbl = jnp.pad(cam_obs_idx, ((0, 0), (0, pad)), constant_values=k)
    tbl = jnp.moveaxis(tbl.reshape(n, nch, slot_chunk), 1, 0)

    def body(a, t):
        return a + seg(t), None

    out, _ = jax.lax.scan(body, jnp.zeros((n, 10, 10), acc), tbl)
    return out


def _schur_gram_pairs(C27, ysT, pairs, cam_obs_idx, pt_idx, n_cameras: int, mm):
    """S_sum = Z^T Z and b_sum = Z^T y via observation pairs (scatter-free).

    The asymptotically right gram at BAL scale (docs/DESIGN.md section 3):
    block (ca, cb) of Z^T Z only couples cameras that co-observe a point and
    equals a sum of C_i C_j^T over same-point observation pairs — sum_p L_p^2
    tiny products instead of the dense (3M, 9N)^T (3M, 9N) matmul (~1000x
    fewer FLOPs at problem-257 scale). Gathers run PLANAR — (component, K)
    arrays, full-lane rows — because gathered (K, 9, 3) block tensors waste
    ~97% of each (8, 128) tile and their slices each cost a strided relayout
    (measured: the blocky formulation of this very gram was SLOWER than the
    dense-chunk one it replaces); the products themselves are batched
    dot_generals, not per-component product lists (measured: ~130 tiny VPU
    kernels' launch overhead dominated the gram at problem-21 scale).

      * diagonal blocks + rhs: one per-camera contraction over the gathered
        camera table (_diag_gram_dot);
      * strictly-upper pairs: gather pair members by the key-pure row tables,
        one (c, l)-contraction per row, per-key sums via the key table, then
        ONE dense gather places every block at its (ca, cb) grid cell; the
        lower triangle is the block-transpose, the diagonal an eye-masked
        add.

    Args:
      C27: (27, K) planar coupling components, C27[3i+c] = C[k][i][c], with
        any sqrt-row-weights already folded in.
      ysT: (3, M) planar rhs rows (same scaling).
    Returns (S_sum (9N, 9N), b_sum (9N,)) in the accumulation dtype.
    """
    n = n_cameras
    acc = jnp.float32 if jnp.dtype(mm) == jnp.bfloat16 else jnp.dtype(mm)
    C27 = C27.astype(mm)
    yg = ysT.astype(mm)[:, pt_idx]  # (3, K)

    # ---- diagonal blocks + rhs: one batched per-camera contraction.
    M10 = _diag_gram_dot(C27, yg, cam_obs_idx, acc)  # (N, 10, 10)
    diag9 = jnp.transpose(M10[:, :9, :9], (1, 2, 0))  # (9, 9, N)
    b = M10[:, :9, 9].reshape(-1)  # (9N,) camera-major

    # ---- strictly-upper pairs: gather members, ONE batched contraction
    # O[i, j, r] = sum_{c, l} A[i, c, r, l] B[j, c, r, l], then key sums and
    # a dense grid gather (placement stays scatter-free).
    r, l_row = pairs.row_a.shape
    C_ext = jnp.concatenate([C27, jnp.zeros((27, 1), mm)], axis=1)
    A = C_ext[:, pairs.row_a].reshape(9, 3, r, l_row)
    B = C_ext[:, pairs.row_b].reshape(9, 3, r, l_row)
    O = jnp.einsum(
        "icrl,jcrl->ijr", A, B, preferred_element_type=acc
    ).reshape(81, r)
    O_ext = jnp.concatenate([O, jnp.zeros((81, 1), acc)], axis=1)
    ko, rmax = pairs.key_table.shape
    key_sums = O_ext[:, pairs.key_table].sum(axis=2)  # (81, KO)
    key_ext = jnp.concatenate([key_sums, jnp.zeros((81, 1), acc)], axis=1)
    up4 = key_ext[:, pairs.key_to_obs].reshape(9, 9, n, n)

    full4 = up4 + jnp.transpose(up4, (1, 0, 3, 2))
    eye = jnp.eye(n, dtype=acc)
    full4 = full4 + diag9[..., None] * eye
    S = jnp.transpose(full4, (2, 0, 3, 1)).reshape(9 * n, 9 * n)
    return S, b.astype(acc)


def _pair_gram_cached(ctx, lam, pairs, n: int, mm):
    """(S_sum, b_sum) of the Schur gram from the CACHED pair stacks.

    S_sum = sum_pairs WQ_a diag(w) WQ_b^T with w = 1/(evals + lam) —
    exactly the whitened W (V + lam I)^-1 W^T gram, but with every
    lambda-independent gather hoisted into build_context
    (ctx.pairA/pairB/diagG). A damping trial costs: gather the 3 weight
    rows into the pair/camera tables, two weighted contractions, key sums,
    and the dense grid gather. Sentinel slots gather weight 0, so padding
    contributes nothing. Returns (S_sum (9N, 9N), b_sum (N, 9)) in the
    accumulation dtype — the sharded path psums these across shards before
    assembly.
    """
    acc = (
        jnp.float32
        if jnp.dtype(mm) in (jnp.bfloat16, jnp.float32)
        else jnp.dtype(mm)
    )
    # Weight/rhs gathers run in the STACK dtype (bf16 on TPU): the products
    # feed bf16 MXU passes regardless, so pre-rounding the weights changes
    # nothing the MXU would see while halving the gather bytes.
    sd = ctx.pairA.dtype
    winv = 1.0 / (ctx.evals + lam.astype(ctx.evals.dtype))  # (M, 3)
    w_ext = jnp.concatenate(
        [winv.T.astype(sd), jnp.zeros((3, 1), sd)], axis=1
    )
    py = (winv * ctx.y0).T.astype(sd)  # (3, M)
    py_ext = jnp.concatenate([py, jnp.zeros((3, 1), sd)], axis=1)
    return _pair_gram_tables(ctx, w_ext, py_ext, pairs, n, acc)


def _group_sum(P, width):
    """Sum contiguous lane groups of ``width``: (C, S*width) -> (C, S).

    width < 128 (sub-lane groups): reduce_window keeps the operand in
    its full-tile flat layout — a reshape to (C, S, width) would force a
    physical retile (minor dim width << 128 wastes 8x HBM and XLA
    materializes the copy). width >= 128: the (C, S, width) view is
    itself fully lane-tiled, so reshape+sum is free — and reduce_window
    with a multi-thousand-lane window blows the 16M scoped-VMEM limit
    (measured: width 4096 asked for 23.8M and failed to compile)."""
    if width >= 128:
        return P.reshape(P.shape[0], -1, width).sum(axis=2)
    return jax.lax.reduce_window(
        P, jnp.zeros((), P.dtype), jax.lax.add,
        (1, width), (1, width), "VALID",
    )


def _pair_einsum_precision():
    """Matmul precision of the fused pair-gram einsum (A/B knob)."""
    v = os.environ.get("BA_PAIR_EINSUM_PREC", "default").lower()
    return {"default": None, "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH}[v]


def _pair_gram_tables(ctx, w_ext, py_ext, pairs, n: int, acc):
    """Weighted pair-gram core over the context's CACHED gathered stacks.

    S_sum = sum_pairs A_p diag(w_p) B_p^T (+ the per-camera diagonal blocks)
    and b_sum = sum_slots G_p (py_p), where the stacks (ctx.pairA/pairB/
    diagG) were gathered once per outer iteration from planar (27, K)
    coupling components, ``w_ext``/``py_ext`` are the (3, M+1) sentinel-
    extended per-point row weights / weighted rhs rows in the stack dtype.
    Serves both the chol-camera Schur gram (_pair_gram_cached: stacks = WQ,
    w = 1/(evals+lam)) and the qrkit re-damp correction (stacks = B27,
    w = lam/(fill_evals+lam)); sentinel slots gather weight 0 so padding
    contributes nothing."""
    group_sum = _group_sum
    # Strictly-upper pairs. Two realizations of the same contraction;
    # the fused einsum over the (9, 3, R, L) view is the measured default
    # at EVERY scale (round 5: p257 5.7 -> 1.5 ms — the flat form
    # materializes the (81, R*L) product tensor, ~200 MB at 617k slots;
    # p21 trial 1.45 -> 0.93 ms — the r2 measurement that favored the
    # flat form predates the planar-product gram and no longer holds).
    # BA_PAIR_EINSUM_RL raises the switch-over threshold for A/B probes.
    r, l_row = ctx.row_pt.shape
    big = r * l_row >= int(os.environ.get('BA_PAIR_EINSUM_RL','0'))
    wflat = w_ext[:, ctx.row_pt.reshape(-1)].astype(acc)  # (3, R*L)
    if big:
        A4 = ctx.pairA.astype(acc).reshape(9, 3, r, l_row)
        B4 = ctx.pairB.astype(acc).reshape(9, 3, r, l_row)
        O = jnp.einsum(
            "icrl,crl,jcrl->ijr", A4, wflat.reshape(3, r, l_row), B4,
            precision=_pair_einsum_precision(),
        ).reshape(81, r)
    else:
        A9 = ctx.pairA.astype(acc).reshape(9, 3, r * l_row)
        B9 = ctx.pairB.astype(acc).reshape(9, 3, r * l_row)
        P = ((A9 * wflat[None])[:, None] * B9[None, :]).sum(2)  # (9,9,R*L)
        O = group_sum(P.reshape(81, r * l_row), l_row)  # (81, R)

    # Diagonal blocks + rhs (per degree band when cam_banded was present).
    diag_bands = ctx.diagG if isinstance(ctx.diagG, tuple) else (ctx.diagG,)
    campt_bands = ctx.cam_pt if isinstance(ctx.cam_pt, tuple) else (ctx.cam_pt,)
    md_parts, b_parts = [], []
    for G, cp in zip(diag_bands, campt_bands):
        nb, lb = cp.shape
        wd = w_ext[:, cp.reshape(-1)].astype(acc)  # (3, Nb*Lb)
        pyg = py_ext[:, cp.reshape(-1)].astype(acc)
        if big:
            G4 = G.astype(acc).reshape(9, 3, nb, lb)
            md = jnp.einsum(
                "icnl,cnl,jcnl->ijn", G4, wd.reshape(3, nb, lb), G4,
                precision=_pair_einsum_precision(),
            ).reshape(81, nb)
            G9 = G4.reshape(9, 3, nb * lb)
        else:
            G9 = G.astype(acc).reshape(9, 3, nb * lb)
            Pd = ((G9 * wd[None])[:, None] * G9[None, :]).sum(2)
            md = group_sum(Pd.reshape(81, nb * lb), lb)  # (81, Nb)
        md_parts.append(jnp.moveaxis(md.reshape(9, 9, nb), 2, 0))
        bq = (G9 * pyg[None]).sum(1)  # (9, Nb*Lb)
        b_parts.append(group_sum(bq, lb).T)  # (Nb, 9)
    Mdiag = jnp.concatenate(md_parts, axis=0)  # (N, 9, 9)
    b_sum = jnp.concatenate(b_parts, axis=0)  # (N, 9)
    if ctx.cam_unperm is not None:
        Mdiag = Mdiag[ctx.cam_unperm]
        b_sum = b_sum[ctx.cam_unperm]

    # Assemble (same scatter-free placement as _schur_gram_pairs).
    O_ext = jnp.concatenate([O, jnp.zeros((81, 1), acc)], axis=1)
    key_sums = O_ext[:, pairs.key_table].sum(axis=2)  # (81, KO)
    key_ext = jnp.concatenate([key_sums, jnp.zeros((81, 1), acc)], axis=1)
    up4 = key_ext[:, pairs.key_to_obs].reshape(9, 9, n, n)
    full4 = up4 + jnp.transpose(up4, (1, 0, 3, 2))
    eye = jnp.eye(n, dtype=acc)
    full4 = full4 + jnp.transpose(Mdiag, (1, 2, 0))[..., None] * eye
    S_sum = jnp.transpose(full4, (2, 0, 3, 1)).reshape(9 * n, 9 * n)
    return S_sum, b_sum


def assemble_reduced(S_sum, b_sum, ctx, lam, n: int):
    """S = blkdiag(U + lam I) - S_sum, b = g_cams - b_sum (shared tail)."""
    dtype = ctx.U.dtype
    S = -S_sum.astype(dtype)
    S4 = S.reshape(n, 9, n, 9)
    ar = jnp.arange(n)
    S4 = S4.at[ar, :, ar, :].add(ctx.U + lam * jnp.eye(9, dtype=dtype))
    S = S4.reshape(9 * n, 9 * n)
    b = ctx.g_cams.reshape(-1) - b_sum.reshape(-1).astype(dtype)
    return S, b


def _pair_S_cached(ctx, lam, problem, n: int, mm):
    """Reduced camera system from the cached pair-gram stacks (per trial)."""
    S_sum, b_sum = _pair_gram_cached(ctx, lam, problem.pairs, n, mm)
    return assemble_reduced(S_sum, b_sum, ctx, lam, n)


def _planar27(x, mm):
    """(K, 9, 3) block tensor -> (27, K) planar components (one relayout)."""
    return x.reshape(x.shape[0], 27).T.astype(mm)


def _schur_gram(C, w, y, problem, n_cameras: int, mm):
    """Dispatch: observation-pair gram when the problem carries PairTables,
    else the chunked dense gram. ``w`` (M, 3) row weights are folded in as
    sqrt-scalings of C's columns and y (Z's rows come in per-point triples)."""
    pairs = getattr(problem, "pairs", None)
    if pairs is None:
        return _schur_gram_chunked(
            C, w, y, problem.obs.cam_idx, problem.pt_obs_idx, n_cameras, mm
        )
    if w is None:
        Cs, ys = C, y
    else:
        sw = jnp.sqrt(w)
        Cs = C * sw[problem.obs.pt_idx][:, None, :]
        ys = y * sw
    return _schur_gram_pairs(
        _planar27(Cs, mm), ys.T, pairs, problem.cam_obs_idx,
        problem.obs.pt_idx, n_cameras, mm,
    )


def _cam_per_slot(problem):
    """(M, Lmax) camera index of each point-table slot (sentinel -> camera 0,
    whose row data is zero for padded slots — harmless)."""
    cam_idx = problem.obs.cam_idx
    cam_ext = jnp.concatenate([cam_idx, jnp.zeros((1,), cam_idx.dtype)])
    return cam_ext[problem.pt_obs_idx]


def _point_row_blocks(Q1, Jc_stacked, rhs_stacked, Qh=None):
    """Per-slot projected camera blocks + rhs rows of the left point QR.

    For point m, slot l (one observation, two residual rows):
        B[m, l] = Qh_m^T Q1[m, 2l:2l+2]^T Jc_stacked[m, 2l:2l+2]   (3, 9)
        c[m]    = Qh_m^T Q1_obs[m]^T rhs_stacked[m]                (3,)
    i.e. the rows Rpc_p = Q1^T [A_cam | b] of the whole-matrix R factor,
    decomposed per observed camera (each slot's rows live in ONE camera's
    block-columns), optionally rotated into the Qh eigenbasis. Q1's trailing
    lambda rows (if any) multiply zero camera columns and zero rhs, so only
    the observation rows participate — exact.
    """
    m_pts, two_l, _ = Jc_stacked.shape
    lmax = two_l // 2
    Q1o = Q1[:, :two_l, :].reshape(m_pts, lmax, 2, 3)
    Jc4 = Jc_stacked.reshape(m_pts, lmax, 2, 9)
    B = jnp.einsum("mlrc,mlrj->mlcj", Q1o, Jc4)  # (M, Lmax, 3, 9)
    c = jnp.einsum(
        "mlrc,mlr->mc", Q1o, rhs_stacked.reshape(m_pts, lmax, 2)
    )  # (M, 3)
    if Qh is not None:
        B = jnp.einsum("mdc,mldj->mlcj", Qh, B)
        c = jnp.einsum("mdc,md->mc", Qh, c)
    return B, c


def _place_rows_or_gram(B, c, cam_per_slot, n_cameras: int, mm,
                        want_rows: bool, chunk: int = 2048):
    """Place per-slot (3, 9) blocks at their dense camera block-columns with
    an appended rhs column — scatter-free one-hot placement, chunked over
    points (the same placement pattern as camera_tsqr_reduce, but on 3-row
    point panels instead of 2Lmax-row observation stacks: ~Lmax/1.5x less
    placed data).

    Returns the placed rows (M, 3, 9N+1) when ``want_rows``, else their
    accumulated gram (9N+1, 9N+1) in the accumulation dtype.
    """
    m_pts, lmax = cam_per_slot.shape
    ncols = 9 * n_cameras + 1
    acc = jnp.float32 if jnp.dtype(mm) == jnp.bfloat16 else jnp.dtype(mm)
    chunk = max(1, min(chunk, m_pts))
    nch = -(-m_pts // chunk)
    pad = nch * chunk - m_pts
    Bp = jnp.pad(
        B.astype(mm), ((0, pad), (0, 0), (0, 0), (0, 0))
    ).reshape(nch, chunk, lmax, 3, 9)
    cp = jnp.pad(c.astype(mm), ((0, pad), (0, 0))).reshape(nch, chunk, 3)
    camp = jnp.pad(cam_per_slot, ((0, pad), (0, 0))).reshape(nch, chunk, lmax)
    ar = jnp.arange(n_cameras, dtype=cam_per_slot.dtype)

    def body(carry, inp):
        Bc, cc, cam = inp
        onehot = (cam[..., None] == ar).astype(mm)  # (P, L, N)
        rows = jnp.einsum("pln,plcj->pcnj", onehot, Bc)
        rows = rows.reshape(chunk, 3, 9 * n_cameras)
        rows = jnp.concatenate([rows, cc[..., None]], axis=-1)
        if want_rows:
            return carry, rows
        flat = rows.reshape(chunk * 3, ncols)
        G = jax.lax.dot_general(
            flat, flat, (((0,), (0,)), ((), ())), preferred_element_type=acc
        )
        return carry + G, None

    if want_rows:
        _, rows = jax.lax.scan(body, jnp.zeros((), acc), (Bp, cp, camp))
        return rows.reshape(nch * chunk, 3, ncols)[:m_pts]
    G, _ = jax.lax.scan(
        body, jnp.zeros((ncols, ncols), acc), (Bp, cp, camp)
    )
    return G


@dataclasses.dataclass
class _PairStacks:
    """Duck-typed stand-in for the SchurContext fields _pair_gram_tables
    reads — lets build_context run the weighted pair gram before the real
    context exists (the qrkit lambda-free S0)."""

    pairA: jax.Array
    pairB: jax.Array
    diagG: object
    row_pt: jax.Array
    cam_pt: object
    cam_unperm: Optional[jax.Array]


def _gather_pair_stacks(C_ext, problem, pairs, cam_banded):
    """Hoisted lambda-independent gathers of planar (27, K+1) coupling
    components into the pair / camera tables (the build_context half of the
    cached pair-gram trick; see SchurContext.pairA). Shared by the chol
    modes (C = WQ) and the qrkit pair-form cache (C = B27)."""
    pairA = C_ext[:, pairs.row_a.reshape(-1)]  # (27, R*Lrow)
    pairB = C_ext[:, pairs.row_b.reshape(-1)]
    row_pt = pairs.row_pt
    cam_unperm = None
    if cam_banded is not None:
        diagG = tuple(C_ext[:, t.reshape(-1)] for t in cam_banded.tables)
        cam_pt = cam_banded.aux
        cam_unperm = cam_banded.unperm
    else:
        diagG = C_ext[:, problem.cam_obs_idx.reshape(-1)]  # (27, N*Lcam)
        cam_pt = problem.cam_obs_pt
    return pairA, pairB, diagG, row_pt, cam_pt, cam_unperm


def _qrkit_use_gram(dtype) -> bool:
    """Whether the qrkit per-trial re-damp runs in gram form (vs Householder
    row-QR). Default: f64 on TPU, where emulated-f64 Householder panels run
    ~150x slower than f64 matmuls (BASELINE.md r4 probes). BA_QRKIT_GRAM=1
    forces gram form on any backend (CPU equivalence tests); BA_F64_ROWQR=1
    forces the row-QR. Read at trace time (see _env_flag)."""
    if _env_flag("BA_F64_ROWQR"):
        return False
    if _env_flag("BA_QRKIT_GRAM"):
        return True
    return (
        jnp.dtype(dtype) == jnp.float64 and jax.default_backend() == "tpu"
    )


def _aug_camera_gram(U, g_cams, energy, dtype):
    """Gram of the augmented camera rows [A_cam | b]: blkdiag(U) with the
    gradient as rhs column and b^T b = ||f||^2 in the corner."""
    n = U.shape[0]
    ncols = 9 * n + 1
    Ua = jnp.zeros((ncols, ncols), dtype)
    U4 = Ua[: 9 * n, : 9 * n].reshape(n, 9, n, 9)
    ar = jnp.arange(n)
    U4 = U4.at[ar, :, ar, :].set(U.astype(dtype))
    Ua = Ua.at[: 9 * n, : 9 * n].set(U4.reshape(9 * n, 9 * n))
    g = g_cams.reshape(-1).astype(dtype)
    Ua = Ua.at[: 9 * n, 9 * n].set(g)
    Ua = Ua.at[9 * n, : 9 * n].set(g)
    return Ua.at[9 * n, 9 * n].set(jnp.asarray(energy, dtype))


def _gram_sqrt_factor(S):
    """Rows C with C^T C ~= S for symmetric PSD-up-to-rounding S, via a
    Jacobi-scaled clamped eigendecomposition.

    The Schur subtraction U - sum Rpc^T Rpc is PSD in exact arithmetic but
    rounding leaves ~eps-relative indefiniteness that a plain Cholesky turns
    into NaN; clamping the scaled eigenvalues at 0 factors the nearest PSD
    matrix instead. Any gram-representative row set is equally valid for the
    downstream row-QR (orthogonal invariance)."""
    d = jnp.diagonal(S)
    dinv = jnp.where(
        d > 0, jax.lax.rsqrt(jnp.abs(d) + jnp.finfo(S.dtype).tiny), 1.0
    )
    Ss = S * dinv[:, None] * dinv[None, :]
    w, V = jnp.linalg.eigh((Ss + Ss.T) / 2)
    C = jnp.sqrt(jnp.maximum(w, 0.0))[:, None] * V.T
    return C / dinv[None, :]


def build_context(
    blocks: JacobianBlocks, problem, mode: str, mm_dtype=None,
    stack_f32: bool = False, gram_f64: bool = False,
    cached_camera: bool = True,
    force_qr_pair: bool = False, s0_partial: bool = False,
) -> SchurContext:
    """Assemble normal-equation blocks + mode-specific cached factors from J.

    ``mm_dtype`` (mixed precision): dtype for the LARGE lambda-independent
    operands that feed the O(M * (9N)^2) matmuls — Z0 and the stacked camera
    rows. Everything O(K)-sized (U, V, W, gradients, point stacks) stays in
    the blocks' dtype: BAL geometry needs f64 (far points make R X + T
    catastrophically cancel in f32, and V's f32 formation error exceeds any
    reasonable damping), while the MXU-heavy matmuls are fine in f32 once
    their operands are point-whitened. See solve_damped for the per-trial
    half of the recipe.

    ``stack_f32`` / ``gram_f64``: precision-experiment toggles surfaced as
    LMConfig.stack_f32 / LMConfig.gram_f64 (static jit args, so they are
    compile-cache-keyed): keep the cached pair-gram stacks in the matmul
    dtype instead of bf16, and form the segment grams (U, V, g) in f64
    regardless of the blocks' dtype.

    ``cached_camera=False`` skips the qrkit lambda-free camera-QR cache
    (QtRpc/Rcc_aug) — the sharded spqr local views use it because those
    factors reduce over the GLOBAL camera gram; the distributed spqr runs
    through the all-gathered TSQR instead (parallel/sharded.py).

    ``force_qr_pair`` selects the qrkit PAIR-FORM cache regardless of the
    _qrkit_use_gram dtype/backend default, and ``s0_partial`` makes its
    lambda-free reduced system PARTIAL: qr_S0cam holds only the LOCAL
    -sum B^T B (no blkdiag(U) added) and qr_b0 only -sum B^T cq (no
    g_cams), so shards can psum the partials and add the already-psummed
    U/g_cams afterwards — the distributed qrkit prepare
    (parallel/sharded.py prepare bodies; VERDICT r4 item 2).
    """
    obs = problem.obs
    cam_idx, pt_idx = obs.cam_idx, obs.pt_idx
    n, m = problem.n_cameras, problem.n_points
    Jc, Jp, f = blocks.Jc, blocks.Jp, blocks.f

    # Per-segment grams + gradients in PLANAR form: transpose the block
    # tensors to (rows, comps, K) once, append the residual row as a 10th/4th
    # component, and each table gram is ONE gather + ONE contraction whose
    # [., :, last] column is the gradient (see planar_segment_gram — the
    # blocky gather-stacks dominated prepare at problem-21 scale).
    k_obs = Jc.shape[0]
    Jc_pl = Jc.reshape(k_obs, 18).T.reshape(2, 9, k_obs)
    Jp_pl = Jp.reshape(k_obs, 6).T.reshape(2, 3, k_obs)
    f_pl = f.T.reshape(2, 1, k_obs)
    pt_banded = getattr(problem, "pt_banded", None)
    cam_banded = getattr(problem, "cam_banded", None)
    Jc10 = jnp.concatenate([Jc_pl, f_pl], axis=1)
    Jp4 = jnp.concatenate([Jp_pl, f_pl], axis=1)
    gram_f64 = gram_f64 and jax.config.jax_enable_x64

    if gram_f64:
        # Precision experiment toggle: form the segment grams (U, V, g) in
        # f64 regardless of the blocks' dtype.
        Jc10 = Jc10.astype(jnp.float64)
        Jp4 = Jp4.astype(jnp.float64)
    if cam_banded is not None:
        M10 = banded_planar_gram(Jc10, cam_banded)
    else:
        M10 = planar_segment_gram(Jc10, problem.cam_obs_idx)
    if pt_banded is not None:
        M4 = banded_planar_gram(Jp4, pt_banded)
    else:
        M4 = planar_segment_gram(Jp4, problem.pt_obs_idx)
    if gram_f64:
        # Accurately-computed, then rounded to storage dtype: the f32 ulp of
        # the VALUE, without the cancellation-amplified accumulation error.
        M10 = M10.astype(blocks.f.dtype)
        M4 = M4.astype(blocks.f.dtype)
    U, gc = M10[:, :9, :9], M10[:, :9, 9]
    V, gp = M4[:, :3, :3], M4[:, :3, 3]
    g_cams = -gc
    g_pts = -gp
    W = jnp.einsum("kri,krj->kij", Jc, Jp)  # (K, 9, 3)
    max_colnorm_sq = jnp.maximum(
        jnp.max(jnp.diagonal(U, axis1=-2, axis2=-1)),
        jnp.max(jnp.diagonal(V, axis1=-2, axis2=-1)),
    )

    point_factor, camera_solver = MODE_STRATEGY[mode]
    mm = mm_dtype or Jc.dtype
    Jp_stacked = Jc_stacked = rhs_stacked = None
    evecs = evals = WQ = y0 = None

    pairs = getattr(problem, "pairs", None)
    if pairs is not None and getattr(problem, "cam_obs_pt", None) is None:
        pairs = None  # duck-typed views without the weight tables

    QtRpc = fill_evals = Rcc_aug = None
    qr_pairA = qr_pairB = qr_diagG = qr_row_pt = qr_cam_pt = None
    qr_cam_unperm = qr_cqT = qr_S0cam = qr_b0 = None
    # qrkit pair-form cache (round 5): when the per-trial re-damp runs in
    # gram form AND the problem carries pair tables, the dense (M, 3, 9N+1)
    # cross-row cache (1.1 GB at p126-scale f64 — the recorded r4 OOM) is
    # never materialized; see the qr_cached branch below.
    qr_pair_path = (
        camera_solver == "qr_cached"
        and cached_camera
        and pairs is not None
        and (force_qr_pair or _qrkit_use_gram(f.dtype))
    )
    if point_factor == "qr" :
        # Gather each point's observation rows into a padded static-shape
        # stack; sentinel index K gathers an all-zero row (harmless in QR).
        lmax = problem.pt_obs_idx.shape[1]
        Jp_ext = jnp.concatenate([Jp, jnp.zeros((1, 2, 3), Jp.dtype)], axis=0)
        Jp_stacked = Jp_ext[problem.pt_obs_idx].reshape(m, 2 * lmax, 3)
        if camera_solver == "qr_full" or (
            camera_solver == "qr_cached" and not qr_pair_path
        ):
            Jc_ext = jnp.concatenate([Jc, jnp.zeros((1, 2, 9), Jc.dtype)], axis=0)
            f_ext = jnp.concatenate([f, jnp.zeros((1, 2), f.dtype)], axis=0)
            Jc_stacked = Jc_ext[problem.pt_obs_idx].reshape(m, 2 * lmax, 9).astype(mm)
            rhs_stacked = (
                (-f_ext[problem.pt_obs_idx]).reshape(m, 2 * lmax).astype(mm)
            )
        if camera_solver == "qr_cached" and cached_camera and qr_pair_path:
            # PAIR-FORM Moré-cached camera factorization (round 5; VERDICT
            # r4 item 1 — memory-bounded qrkit). The dense cached cross rows
            # compress exactly: with Q1_0 = Jp_stacked Rpp^-1 (the MGS
            # identity), each observation's projected camera block is
            #     B_k = Qh_p^T Q1_0^T Jc_k = P_p W_k^T,
            #     P_p = Qh_p^T Rpp_p^-T  (3x3 per point, rank-guarded)
            # so the whole lambda-free cache is the planar (27, K) tensor
            # B27 plus per-point rhs rows cq = P g_pts — ~30 MB at p126 f64
            # instead of 1.1 GB — and the per-trial re-damp correction
            # F^T F = sum_p B_p^T (lam/(eh+lam)) B_p has the co-observation
            # pair sparsity, so it runs through the SAME weighted pair-gram
            # tables as the chol Schur gram (~100x fewer FLOPs than the
            # dense-row gram at p126). The cached lambda-free reduced system
            # S0 = blkdiag(U) - sum B^T B replaces Rcc_aug (its gram square;
            # the row-QR realization below keeps the explicit factor).
            # Matches BAFunctor.h:98-102 (QRKit camera stage) +
            # BacktrackLevMarqMore.h:287-328 (factor once, re-damp cheap).
            Q1_0, Rpp = linalg.mgs_qr3(Jp_stacked, zero_deficient=True)
            del Q1_0  # identity folded into P = Qh^T Rpp^-T
            acc_e = jnp.float64 if jax.config.jax_enable_x64 else Jp.dtype
            eh_raw, Qh64 = linalg.eigh3x3_sym(
                jnp.einsum("mij,mkj->mik", Rpp, Rpp).astype(acc_e)
            )
            fill_evals = jnp.maximum(eh_raw, 0.0).astype(f.dtype)
            Qh = Qh64.astype(Jp.dtype)
            # Rank guard: mgs_qr3(zero_deficient) zeroes deficient pivots
            # exactly; patch the diagonal for the closed-form inverse and
            # zero the matching ROWS of Rpp^-T (deficient directions carry
            # no cross-row information — the zeroed-Q-column convention).
            rdiag = jnp.diagonal(Rpp, axis1=-2, axis2=-1)  # (M, 3)
            ok = rdiag > 0
            patch = jnp.where(ok, 0.0, 1.0)
            Rt = jnp.swapaxes(Rpp, -1, -2)  # lower-triangular Rpp^T
            RinvT = linalg.inv_lower3x3(
                Rt + patch[..., :, None] * jnp.eye(3, dtype=Rt.dtype)
            )
            RinvT = jnp.where(ok[..., None], RinvT, 0.0)
            Pm = jnp.einsum("mdc,mdj->mcj", Qh, RinvT)  # (M, 3, 3)
            cq = jnp.einsum("mcj,mj->mc", Pm, g_pts)  # (M, 3)
            # Planar B27[3j+c, k] = sum_t P_p[c, t] W_k[j, t] — the same
            # batched planar contraction pattern as WQ27 below.
            W9b = W.reshape(k_obs, 27).T.reshape(9, 3, k_obs)
            P9 = Pm.reshape(m, 9).T[:, pt_idx].reshape(3, 3, k_obs)
            B27 = (
                (W9b[:, None, :, :] * P9[None, :, :, :]).sum(2)
            ).reshape(27, k_obs).astype(f.dtype)
            B_ext = jnp.concatenate(
                [B27, jnp.zeros((27, 1), B27.dtype)], axis=1
            )
            (qr_pairA, qr_pairB, qr_diagG, qr_row_pt, qr_cam_pt,
             qr_cam_unperm) = _gather_pair_stacks(
                B_ext, problem, pairs, cam_banded)
            qr_cqT = cq.T.astype(f.dtype)  # (3, M)
            # Lambda-free reduced system S0 = blkdiag(U) - sum B^T B (and
            # rhs b0 = g - sum B^T cq): ONE weighted pair gram at w = 1.
            acc0 = (
                jnp.float64
                if jnp.dtype(f.dtype) == jnp.float64
                else jnp.float32
            )
            _tmp = _PairStacks(
                pairA=qr_pairA, pairB=qr_pairB, diagG=qr_diagG,
                row_pt=qr_row_pt, cam_pt=qr_cam_pt,
                cam_unperm=qr_cam_unperm,
            )
            ones_ext = jnp.concatenate(
                [jnp.ones((3, m), f.dtype), jnp.zeros((3, 1), f.dtype)],
                axis=1,
            )
            cq_ext = jnp.concatenate(
                [qr_cqT, jnp.zeros((3, 1), f.dtype)], axis=1
            )
            S_sum0, b_sum0 = _pair_gram_tables(
                _tmp, ones_ext, cq_ext, pairs, n, acc0
            )
            if s0_partial:
                # Distributed prepare: local partials only — the caller
                # psums these and adds the globally-psummed U / g_cams.
                qr_S0cam = -S_sum0.astype(f.dtype)
                qr_b0 = -b_sum0.reshape(-1).astype(f.dtype)
            else:
                S0 = -S_sum0.astype(f.dtype)
                S04 = S0.reshape(n, 9, n, 9)
                arn = jnp.arange(n)
                S04 = S04.at[arn, :, arn, :].add(U.astype(f.dtype))
                qr_S0cam = S04.reshape(9 * n, 9 * n)
                qr_b0 = g_cams.reshape(-1).astype(f.dtype) - b_sum0.reshape(
                    -1
                ).astype(f.dtype)
        elif camera_solver == "qr_cached" and cached_camera:
            # Moré-cached camera QR (qrkit; VERDICT r3 item 1): everything
            # lambda-INDEPENDENT of the whole-matrix QR factorization is
            # built here, once per outer iteration; damping trials only
            # rescale the cached cross rows and run a small row-QR
            # (_redamp_qr). Matches BacktrackLevMarqMore.h:287-328 (factor
            # once, re-damp cheap) + BAFunctor.h:101 (the camera thin QR).
            #
            #   Q1_0, Rpp : rank-guarded MGS QR of the RAW point stacks (no
            #               lambda rows, orthogonal — V is never squared);
            #   Qh, eh    : closed-form eigenbasis of Rpp Rpp^T;
            #   QtRpc     : placed cross rows Qh^T Q1_0^T [A_cam | b];
            #   Rcc_aug   : gram-sqrt of U_aug - sum QtRpc^T QtRpc (the
            #               lambda-free projected camera gram, R-only
            #               CholeskyQR — emulated-f64 Householder panels are
            #               ~150x slower than f64 matmuls on TPU).
            Q1_0, Rpp = linalg.mgs_qr3(Jp_stacked, zero_deficient=True)
            acc_e = jnp.float64 if jax.config.jax_enable_x64 else Jp.dtype
            eh_raw, Qh64 = linalg.eigh3x3_sym(
                jnp.einsum("mij,mkj->mik", Rpp, Rpp).astype(acc_e)
            )
            fill_evals = jnp.maximum(eh_raw, 0.0).astype(f.dtype)
            Qh = Qh64.astype(Jp.dtype)
            Bq, cq = _point_row_blocks(Q1_0, Jc_stacked, rhs_stacked, Qh=Qh)
            cam_slot = _cam_per_slot(problem)
            QtRpc = _place_rows_or_gram(
                Bq, cq, cam_slot, n, mm, want_rows=True
            )
            flat = QtRpc.reshape(3 * m, 9 * n + 1)
            acc_g = jnp.float32 if jnp.dtype(mm) == jnp.bfloat16 else jnp.dtype(mm)
            G_sum = jax.lax.dot_general(
                flat, flat, (((0,), (0,)), ((), ())),
                preferred_element_type=acc_g,
            )
            energy = jnp.sum(
                f.astype(acc_g) * f.astype(acc_g), dtype=acc_g
            )
            U_aug = _aug_camera_gram(U, g_cams, energy, acc_g)
            # b = -J^T f is the NEGATED gradient; the rhs column carries
            # b = -f, whose camera gram column is A_cam^T(-f) = g_cams.
            S0_aug = U_aug - G_sum
            Rcc_aug = _gram_sqrt_factor(S0_aug).astype(mm)
    pairA = pairB = diagG = row_pt = cam_pt = None
    want_eig = point_factor == "eig" or (
        camera_solver == "chol" and pairs is not None
    )
    if want_eig:
        # More-style amortization: eigendecompose V once; damping trials only
        # rescale by (d + lambda)^-1. Closed-form batched 3x3 eigh (pure
        # elementwise — XLA's iterative eigh NaNs on TPU for badly scaled f64
        # blocks; see linalg.eigh3x3_sym), run in the accumulation dtype
        # (tiny; f32 eigh of ill-conditioned V is unreliable), results cast
        # back to the blocks' dtype. Used by the 'eig' point factor AND by
        # the cached pair-gram (all chol-camera modes): the weighted gram
        # sum_i WQ_i (E + lambda)^-1 WQ_i^T equals the whitened
        # W (V + lambda)^-1 W^T exactly, with a lambda-independent WQ.
        acc = jnp.float64 if jax.config.jax_enable_x64 else V.dtype
        evals_raw, evecs64 = linalg.eigh3x3_sym(V.astype(acc))
        evals = jnp.maximum(evals_raw, 0.0).astype(V.dtype)
        evecs = evecs64.astype(V.dtype)
        y0 = jnp.einsum("mji,mj->mi", evecs, g_pts)  # Q^T g per point

    cam_unperm = None
    if camera_solver == "chol" and pairs is not None:
        # Cached pair-gram stacks: gather planar WQ into the pair / camera
        # tables ONCE per outer iteration (these gathers dominated the
        # per-trial gram); trials only gather the 3 weight rows. Stored in
        # bf16 on TPU (see _stack_dtype — the MXU consumes bf16 regardless).
        sd = _stack_dtype(mm, stack_f32, k_obs)
        W27 = W.reshape(k_obs, 27).T  # comp 3i+j = W[k][i][j]
        Qg = evecs.reshape(m, 9).T[:, pt_idx]  # (9, K): comp 3j+c
        # WQ27[3i+c] = sum_j W27[3i+j] * Qg[3j+c], as ONE batched planar
        # contraction: a 27-term list comprehension of row slices makes XLA
        # materialize 27+ (1, K) buffers in 8-sublane tiles (8x HBM waste)
        # plus async copies — measured ~3.3 ms/LM-iteration on problem-21.
        W9 = W27.reshape(9, 3, k_obs)
        Q9 = Qg.reshape(3, 3, k_obs)
        WQ27 = (
            (W9[:, :, None, :] * Q9[None, :, :, :]).sum(1).reshape(27, k_obs)
        ).astype(sd)
        WQ_ext = jnp.concatenate([WQ27, jnp.zeros((27, 1), sd)], axis=1)
        # FLAT (27, R*Lrow) stacks: a (27, R, 16) array tiles as (8, 128)
        # with only 16 live lanes — 8x physical HBM footprint, and XLA
        # relayout-copies it at every loop boundary (measured ~1.2 ms/iter).
        # Flat keeps full tiles; trials reshape-reduce contiguous L-groups.
        pairA, pairB, diagG, row_pt, cam_pt, cam_unperm = _gather_pair_stacks(
            WQ_ext, problem, pairs, cam_banded
        )
        if _env_flag("BA_PIN_STACKS"):
            pairA = jax.lax.optimization_barrier(pairA)
            pairB = jax.lax.optimization_barrier(pairB)
    elif point_factor == "eig":
        # Fallback eig coupling for problems without PairTables (e.g. the
        # sharded local views): blocky WQ feeds the chunked weighted gram.
        WQ = jnp.einsum(
            "kij,kjl->kil", W, evecs[pt_idx]
        ).astype(mm)  # (K, 9, 3)

    return SchurContext(
        U=U,
        V=V,
        W=W,
        g_cams=g_cams,
        g_pts=g_pts,
        max_colnorm_sq=max_colnorm_sq,
        Jp_stacked=Jp_stacked,
        Jc_stacked=Jc_stacked,
        rhs_stacked=rhs_stacked,
        evecs=evecs,
        evals=evals,
        WQ=WQ,
        y0=y0,
        # For qrkit pair-form contexts the shared pair-table fields hold the
        # B27 stacks (only one family is ever live per mode).
        pairA=pairA if pairA is not None else qr_pairA,
        pairB=pairB if pairB is not None else qr_pairB,
        diagG=diagG if diagG is not None else qr_diagG,
        row_pt=row_pt if row_pt is not None else qr_row_pt,
        cam_pt=cam_pt if cam_pt is not None else qr_cam_pt,
        cam_unperm=cam_unperm if cam_unperm is not None else qr_cam_unperm,
        QtRpc=QtRpc,
        fill_evals=fill_evals,
        Rcc_aug=Rcc_aug,
        qr_cqT=qr_cqT,
        qr_S0cam=qr_S0cam,
        qr_b0=qr_b0,
    )


def initial_lambda(ctx: SchurContext, mode: str) -> jax.Array:
    """First-iteration lambda, replicating each driver's init rule.

    cholesky: 1e-12 * max diag(J^T J)      (BacktrackLevMarqCholesky.h:263-265)
    qrchol:   1e-12 * max col squaredNorm  (BacktrackLevMarqQRChol.h:276-280)
              — the same quantity
    moreqr:   1e-6 * max col blueNorm      (BacktrackLevMarqMore.h:281-285)
    qrkit/spqr: driven by the external fork's BacktrackLevMarq (not in the
              reference repo); we use the More rule, the in-repo derived copy
              closest to the fork's driver.
    """
    if mode in ("cholesky", "qrchol"):
        return 1e-12 * ctx.max_colnorm_sq
    return 1e-6 * jnp.sqrt(ctx.max_colnorm_sq)


def _point_factor_inv(ctx: SchurContext, lam, mode: str, dtype, acc_dtype=None):
    """Return Linv (M, 3, 3) with Vhat^-1 ~= Linv^T Linv for the damped point blocks.

    Mixed precision: the 'chol' factor runs in the accumulation dtype (f64
    under x64) with pivot clamping — V's formation noise in f32 can exceed
    any reasonable damping, and an unguarded f32 Cholesky NaNs on the
    worst-conditioned points. The 'qr' factor forms R directly from rows
    (no squaring), which is dtype-safe, so it stays in the blocks' dtype.
    The returned factor is cast back to ``dtype`` (its ENTRIES are bounded
    once the factorization succeeded). O(M * 30) flops either way — free.
    """
    point_factor, _ = MODE_STRATEGY[mode]
    m = ctx.V.shape[0]
    if point_factor == "chol":
        acc = acc_dtype or (jnp.float64 if jax.config.jax_enable_x64 else dtype)
        V = ctx.V.astype(acc)
        L = linalg.cholesky3x3(
            V + jnp.asarray(lam, acc) * jnp.eye(3, dtype=acc), clamp=True
        )
        return linalg.inv_lower3x3(L).astype(dtype)
    if point_factor == "qr":
        sl = jnp.sqrt(jnp.asarray(lam, ctx.Jp_stacked.dtype))
        lam_rows = jnp.broadcast_to(
            sl * jnp.eye(3, dtype=ctx.Jp_stacked.dtype), (m, 3, 3)
        )
        A = jnp.concatenate([ctx.Jp_stacked, lam_rows], axis=1)
        _, R = linalg.mgs_qr3(A)
        # L = R^T lower-triangular; Linv = inv(L).
        return linalg.inv_lower3x3(jnp.swapaxes(R, -1, -2)).astype(dtype)
    raise ValueError(f"no explicit point factor for mode {mode}")


def _reduced_system_chol(ctx, lam, problem, n, m, Linv, mm):
    """Form S = blkdiag(U + lam I) - Z^T Z and rhs b via the Schur gram
    (observation-pair tables when available, chunked dense fallback).

    The gram matmuls run in ``mm`` (f32 on TPU); Z's entries are
    point-whitened (C = W L^-T), so their scale is tame. The assembled S
    and rhs are promoted back to the accurate dtype for the reduced solve.
    """
    dtype = ctx.U.dtype
    pt_idx = problem.obs.pt_idx
    y = jnp.einsum("mij,mj->mi", Linv, ctx.g_pts)  # L^-1 g_p
    # C_i = W_i L_p^-T  (point-whitened coupling). Problems WITH PairTables
    # never reach here — solve_damped routes them to the cached pair gram
    # (_pair_S_cached); this chunked build serves no-pairs problems and the
    # sharded local views.
    C = jnp.einsum("kij,kcj->kic", ctx.W, Linv[pt_idx])  # (K, 9, 3)
    S_sum, b_sum = _schur_gram_chunked(
        C, None, y, problem.obs.cam_idx, problem.pt_obs_idx, n, mm
    )
    S = -S_sum.astype(dtype)
    S4 = S.reshape(n, 9, n, 9)
    ar = jnp.arange(n)
    S4 = S4.at[ar, :, ar, :].add(ctx.U + lam * jnp.eye(9, dtype=dtype))
    S = S4.reshape(9 * n, 9 * n)
    b = ctx.g_cams.reshape(-1) - b_sum.astype(dtype)
    return S, b


def _camera_solve_chol(S, b):
    """Direct solve of the reduced camera system (the SimplicialLDLT analog).

    Three robustness measures that the reference gets from f64 + AMD-permuted
    LDLT and that a TPU-f32 path needs explicitly:

      * Jacobi (symmetric diagonal) scaling: BA columns span ~6 orders of
        magnitude (translation/rotation columns carry the focal length,
        distortion columns don't), which alone squares into a ~1e12
        condition number for S. D S D with D = diag(S)^-1/2 removes the
        scale spread — standard BA practice.
      * the factorization runs in f64 when x64 is enabled: S is only
        (9N)^2 <= ~2313^2, so a f64 solve costs nothing next to the Z^T Z
        matmul that produced S in f32 — the SURVEY.md 'f32 storage, f64
        reductions' mixed-precision recipe.
      * QR rather than plain Cholesky: at very small lambda the Schur
        subtraction S = blkdiag(U) - Z^T Z can leave S indefinite at the
        1e-10-relative level (cancellation), which LLT turns into NaN while
        the reference's LDLT tolerates it; QR is backward-stable for any
        invertible S (and f64 LU is not implemented by this compiler stack).

    If the solve still produces NaN (S singular), the LM driver rejects the
    step and raises lambda — graceful degradation.
    """
    in_dtype = S.dtype
    acc = jnp.float64 if jax.config.jax_enable_x64 else in_dtype
    S64 = S.astype(acc)
    b64 = b.astype(acc)
    d = jnp.diagonal(S64)
    dinv = jnp.where(
        d > 0, jax.lax.rsqrt(jnp.abs(d) + jnp.finfo(acc).tiny), 1.0
    )
    Ss64 = S64 * dinv[:, None] * dinv[None, :]

    if in_dtype == acc:
        Q, R = jnp.linalg.qr(Ss64)
        y = jax.scipy.linalg.solve_triangular(
            R, Q.T @ (b64 * dinv), lower=False
        )
        return y * dinv

    # Mixed precision: factor the Jacobi-scaled system once in the fast
    # dtype, then ITERATIVE REFINEMENT with f64 residuals — two extra
    # (9N)^2 matvecs buy ~f64 solution accuracy without an emulated-f64
    # (9N)^3 factorization (the SURVEY.md mixed-precision recipe).
    # Cholesky first (2.8x faster than XLA's QR at 2313^2 on a v5e); at
    # very small lambda the Schur cancellation can leave S indefinite at
    # the 1e-10-relative level, which LLT turns into NaN — detected on the
    # factor and routed to the backward-stable QR branch via lax.cond (the
    # fallback compiles always, runs only on breakdown).
    Ss32 = Ss64.astype(in_dtype)
    # Blocked MXU factorization (linalg.blocked_cholesky/_tril_inv):
    # measured round-5 A/B at 2313^2 on the v5e — XLA's cholesky clocked
    # 2.9 ms in-scan vs 4.0 ms blocked (and the r4 "~8 ms reduced solve"
    # turned out to be refinement f64-matvec + cond cost, not the
    # factorization), so the blocked path is OPT-IN (BA_BLOCKED_CHOL=1,
    # kept for larger-N futures where XLA's sequential panels lose).
    use_blocked = Ss32.shape[0] >= 1024 and _env_flag("BA_BLOCKED_CHOL")
    if use_blocked:
        L = linalg.blocked_cholesky(Ss32)
    else:
        L = jnp.linalg.cholesky(Ss32)
    chol_ok = jnp.all(jnp.isfinite(L))
    bs = b64 * dinv

    def refine(solve32):
        # Iterative refinement with ~f64-accurate residuals of the ORIGINAL
        # (unscaled) system — S's f32 entries are exact, so the compensated
        # pure-f32 matvec (linalg.compensated_matvec_f32, ~2^-48) replaces
        # the emulated-f64 matvec that dominated the per-trial solve cost
        # at p257 (~2.4 ms per apply, round-5 ledger). The preconditioner
        # application stays in the Jacobi-scaled space.
        x = solve32(bs) * dinv
        for _ in range(2):
            r = b64 - linalg.compensated_matvec_f32(S, x)
            x = x + solve32(r * dinv) * dinv
        return x

    if use_blocked:
        Linv = linalg.blocked_tril_inv(L)
        hi = jax.lax.Precision.HIGHEST

        def chol_solve32(r64):
            r32 = r64.astype(in_dtype)
            y = jnp.matmul(Linv, r32, precision=hi)
            return jnp.matmul(Linv.T, y, precision=hi).astype(acc)

    else:
        def chol_solve32(r64):
            return jax.scipy.linalg.cho_solve(
                (L, True), r64.astype(in_dtype)
            ).astype(acc)

    def chol_branch(_):
        return refine(chol_solve32)

    def qr_branch(_):
        if _env_flag("BA_CHEAP_FALLBACK"):
            # Measured A/B (round 5): a diagonally-bumped Cholesky retry
            # instead of QR cut the ISOLATED p257 solve chain 21.0 ->
            # 17.6 ms (the QR branch's operand materialization inside
            # lax.cond), yet REGRESSED the full LM loop to ~178 it/s at
            # p21 / 14.7 at p257 vs ~227 / 17.6 with the QR branch — XLA
            # specializes the while-loop cond differently in context.
            # Kept as a probe; QR (backward-stable on any invertible S)
            # stays the default.
            Lb = jnp.linalg.cholesky(
                Ss32 + jnp.asarray(1e-4, in_dtype) * jnp.eye(
                    Ss32.shape[0], dtype=in_dtype
                )
            )
            return refine(
                lambda r64: jax.scipy.linalg.cho_solve(
                    (Lb, True), r64.astype(in_dtype)
                ).astype(acc)
            )
        Q, R = jnp.linalg.qr(Ss32)
        return refine(
            lambda r64: jax.scipy.linalg.solve_triangular(
                R, Q.T @ r64.astype(in_dtype), lower=False
            ).astype(acc)
        )

    # Branch-style cond (refine inside the taken branch): measured
    # ~2.8 ms/trial cheaper at p257 than precomputing the chol result and
    # select-ing it (which cost ~10 ms — XLA materializes the untaken
    # branch operands), and the only robust structure cheaper still is
    # dropping the QR fallback entirely (round-5 A/B).
    y = jax.lax.cond(chol_ok, chol_branch, qr_branch, None)
    return y.astype(in_dtype)


def solve_damped(
    ctx: SchurContext, lam, problem, mode: str, mm_dtype=None, pf_dtype=None
):
    """Solve (J^T J + lam I) dx = -J^T f; returns (dx_pts (M,3), dx_cams (N,9)).

    This is the inner-damping-loop work item: everything lambda-dependent.
    ``mm_dtype``: dtype of the big matmuls (see build_context; must match the
    value the context was built with).
    ``pf_dtype``: accumulation dtype override for the M-sized point factor —
    the df32 drive passes f32 (clamped Cholesky + the reduced solve's
    iterative refinement absorb the loss); default keeps f64 under x64.
    """
    obs = problem.obs
    cam_idx, pt_idx = obs.cam_idx, obs.pt_idx
    n, m = problem.n_cameras, problem.n_points
    dtype = ctx.U.dtype
    mm = mm_dtype or dtype
    lam = jnp.asarray(lam, dtype)
    point_factor, camera_solver = MODE_STRATEGY[mode]

    if camera_solver == "chol" and ctx.pairA is not None:
        # Cached pair-gram path (see build_context): per trial only the 3
        # eigenvalue-weight rows are gathered; the WQ stacks are reused.
        S, b = _pair_S_cached(ctx, lam, problem, n, mm)
        dxc = _camera_solve_chol(S, b).reshape(n, 9)
        t = ctx.g_pts - point_coupling_sum(ctx.W, dxc, cam_idx, problem)
        if point_factor == "eig":
            # Back-substitution in the eigenbasis.
            winv = 1.0 / (ctx.evals + lam)
            dxp = jnp.einsum(
                "mij,mj->mi", ctx.evecs,
                winv * jnp.einsum("mji,mj->mi", ctx.evecs, t),
            )
        else:
            Linv = _point_factor_inv(ctx, lam, mode, dtype, acc_dtype=pf_dtype)
            y = jnp.einsum("mij,mj->mi", Linv, t)
            dxp = jnp.einsum("mji,mj->mi", Linv, y)
        return dxp, dxc

    if point_factor == "eig":
        winv = 1.0 / (ctx.evals + lam)  # (M, 3)
        S_sum, b_sum = _schur_gram_chunked(
            ctx.WQ, winv, ctx.y0, problem.obs.cam_idx,
            problem.pt_obs_idx, n, mm,
        )
        S = -S_sum.astype(dtype)
        S4 = S.reshape(n, 9, n, 9)
        ar = jnp.arange(n)
        S4 = S4.at[ar, :, ar, :].add(ctx.U + lam * jnp.eye(9, dtype=dtype))
        S = S4.reshape(9 * n, 9 * n)
        b = ctx.g_cams.reshape(-1) - b_sum.astype(dtype)
        dxc = _camera_solve_chol(S, b).reshape(n, 9)
        # Back-substitution in the eigenbasis.
        t = ctx.g_pts - point_coupling_sum(ctx.W, dxc, cam_idx, problem)
        dxp = jnp.einsum(
            "mij,mj->mi", ctx.evecs, winv * jnp.einsum("mji,mj->mi", ctx.evecs, t)
        )
        return dxp, dxc

    Linv = _point_factor_inv(ctx, lam, mode, dtype, acc_dtype=pf_dtype)

    if camera_solver == "chol":
        S, b = _reduced_system_chol(ctx, lam, problem, n, m, Linv, mm)
        dxc = _camera_solve_chol(S, b).reshape(n, 9)
    elif camera_solver == "qr_cached" and (
        ctx.Rcc_aug is not None or ctx.qr_S0cam is not None
    ):
        # qrkit: Moré-cached camera QR, cheap per-trial re-damp.
        dxc = _camera_solve_qr_cached(ctx, lam, problem, n).reshape(n, 9)
    else:
        # spqr (whole-matrix QR per trial) — and the no-cache fallback for
        # qr_cached contexts built with cached_camera=False (sharded views).
        dxc = camera_solve_qr(ctx, lam, problem, Linv, mm_dtype=mm).reshape(n, 9)

    # Shared back-substitution: Vhat dx_p = g_p - sum_i W_i^T dx_c(i).
    t = ctx.g_pts - point_coupling_sum(ctx.W, dxc, cam_idx, problem)
    y = jnp.einsum("mij,mj->mi", Linv, t)
    dxp = jnp.einsum("mji,mj->mi", Linv, y)
    return dxp, dxc


def refine_step(ctx: SchurContext, lam, problem, mode: str, dxp, dxc,
                mm_dtype=None, pf_dtype=None):
    """One mixed-precision iterative-refinement pass on the damped step.

    The df32 drive forms the Schur system in f32/bf16; its flatline basins
    sit measurably above the f64 oracle's (BASELINE.md "df32 accuracy
    split"). Classic mixed-precision IR tests whether that gap is STEP
    error: compute the residual of (J^T J + lam I) dx = -J^T f in f64
    (elementwise/segment ops — accurate even where the f32 system matvec
    cancels), re-solve the SAME factorized system for the correction, add.

        r_c = g_c - (U + lam I) dx_c - sum_{k in cam} W_k dx_p(pt(k))
        r_p = g_p - (V + lam I) dx_p - sum_{k in pt} W_k^T dx_c(cam(k))

    The correction solve reuses the per-trial path with a rhs-replaced
    context (g_cams/g_pts/y0), so it supports the chol-camera modes
    (cholesky / qrchol / moreqr); the QR-camera modes thread their rhs
    through per-trial caches (qr_cqT / rhs_stacked) and are out of the
    experiment's scope. Surfaced as LMConfig.refine_steps (VERDICT r4
    item 5: one structural df32 step-quality experiment — measured either
    way, see BASELINE.md round-5 notes).
    """
    obs = problem.obs
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    dtype = ctx.U.dtype
    lam_a = jnp.asarray(lam, acc)
    dxc_a = dxc.astype(acc)
    dxp_a = dxp.astype(acc)
    W = ctx.W.astype(acc)
    n, m = problem.n_cameras, problem.n_points
    # Camera residual: block-diagonal part + point coupling per camera.
    Udxc = jnp.einsum("nij,nj->ni", ctx.U.astype(acc), dxc_a)
    Wdxp = jnp.einsum("kij,kj->ki", W, dxp_a[obs.pt_idx])  # (K, 9)
    coup_c = jax.ops.segment_sum(Wdxp, obs.cam_idx, num_segments=n)
    r_c = ctx.g_cams.astype(acc) - Udxc - lam_a * dxc_a - coup_c
    # Point residual: 3x3 blocks + camera coupling per point.
    Vdxp = jnp.einsum("mij,mj->mi", ctx.V.astype(acc), dxp_a)
    Wtdxc = jnp.einsum("kij,ki->kj", W, dxc_a[obs.cam_idx])  # (K, 3)
    coup_p = jax.ops.segment_sum(Wtdxc, obs.pt_idx, num_segments=m)
    r_p = ctx.g_pts.astype(acc) - Vdxp - lam_a * dxp_a - coup_p

    repl = dict(g_cams=r_c.astype(dtype), g_pts=r_p.astype(dtype))
    if ctx.y0 is not None:
        repl["y0"] = jnp.einsum(
            "mji,mj->mi", ctx.evecs.astype(acc), r_p
        ).astype(ctx.y0.dtype)
    rhs_ctx = dataclasses.replace(ctx, **repl)
    ddxp, ddxc = solve_damped(
        rhs_ctx, lam, problem, mode, mm_dtype=mm_dtype, pf_dtype=pf_dtype
    )
    return (
        (dxp_a + ddxp.astype(acc)).astype(dxp.dtype),
        (dxc_a + ddxc.astype(acc)).astype(dxc.dtype),
    )


def _redamp_qr(Rcc_aug, QtRpc, fill_evals, lam, chunk_rows: int = 12288):
    """Per-trial re-damp of the cached camera QR (qrkit inner work item).

    Row-QR of [Rcc_aug; sqrt(lam/(eh+lam)) QtRpc; sqrt(lam) I_9N | 0] — the
    exact damped reduced camera system (module docstring identity), built
    from cached lambda-free factors by a diagonal rescale. 3M + 2(9N) + 1
    rows instead of the ~M(2Lmax+3) of a from-scratch trial: the Moré
    re-damp at the camera level (BacktrackLevMarqMore.h:293-328)."""
    dtype = Rcc_aug.dtype
    ncols = Rcc_aug.shape[0]
    n9 = ncols - 1
    lam_e = jnp.asarray(lam, fill_evals.dtype)
    scale = jnp.sqrt(lam_e / (fill_evals + lam_e)).astype(dtype)  # (M, 3)
    F = (QtRpc * scale[..., None]).reshape(-1, ncols)
    sl = jnp.sqrt(jnp.asarray(lam, dtype))
    lam_rows = jnp.concatenate(
        [sl * jnp.eye(n9, dtype=dtype), jnp.zeros((n9, 1), dtype)], axis=1
    )
    R0 = jnp.linalg.qr(
        jnp.concatenate([Rcc_aug, lam_rows], axis=0), mode="r"
    )
    rows = F.shape[0]
    chunk = max(ncols, min(chunk_rows, rows))
    nch = -(-rows // chunk)
    F = jnp.pad(F, ((0, nch * chunk - rows), (0, 0)))

    def body(carry, blk):
        return (
            jnp.linalg.qr(jnp.concatenate([carry, blk], axis=0), mode="r"),
            None,
        )

    R, _ = jax.lax.scan(body, R0, F.reshape(nch, chunk, ncols))
    return R


def _redamp_gram(Rcc_aug, QtRpc, fill_evals, lam):
    """Per-trial damped camera gram from the cached lambda-free qrkit factors.

    The qr_cached identity (module docstring) in R-only CholeskyQR form:

        S_aug(lam) = Rcc_aug^T Rcc_aug + F^T F,
        F = diag(sqrt(lam/(eh+lam))) QtRpc  (row-wise over the eigenbasis)

    — two MXU matmuls instead of the emulated-f64 Householder row-QR scan of
    _redamp_qr, which the round-4 probes measured ~150x slower than f64
    matmuls on TPU (BASELINE.md). Exactly the treatment _spqr_gram_solve
    gives the spqr trial; here it composes with qrkit's cached lambda-free
    factorization so the per-trial cost is O(3M (9N+1)^2) matmul FLOPs."""
    dtype = Rcc_aug.dtype
    ncols = Rcc_aug.shape[0]
    m = QtRpc.shape[0]
    lam_e = jnp.asarray(lam, fill_evals.dtype)
    scale = jnp.sqrt(lam_e / (fill_evals + lam_e)).astype(dtype)  # (M, 3)
    acc = jnp.float32 if jnp.dtype(dtype) == jnp.bfloat16 else jnp.dtype(dtype)
    S0 = jax.lax.dot_general(
        Rcc_aug, Rcc_aug, (((0,), (0,)), ((), ())), preferred_element_type=acc
    )
    # Accumulate F^T F over point chunks: rescaling materializes a COPY of
    # the (3M, ncols) cached rows, which at p126-scale f64 (1.1 GB) tipped
    # the chip over HBM on top of the cache itself — chunking bounds the
    # per-step temp to chunk_points*3*ncols while every matmul stays
    # MXU-sized. Zero-padded tail rows contribute nothing to the gram.
    chunk_points = min(8192, m)
    nch = -(-m // chunk_points)
    pad = nch * chunk_points - m
    Qp = jnp.pad(QtRpc, ((0, pad), (0, 0), (0, 0)))
    sp = jnp.pad(scale, ((0, pad), (0, 0)))

    def body(G, inp):
        q, s = inp
        Fc = (q * s[..., None]).reshape(-1, ncols)
        return (
            G
            + jax.lax.dot_general(
                Fc, Fc, (((0,), (0,)), ((), ())), preferred_element_type=acc
            ),
            None,
        )

    G, _ = jax.lax.scan(
        body,
        jnp.zeros((ncols, ncols), acc),
        (
            Qp.reshape(nch, chunk_points, 3, ncols),
            sp.reshape(nch, chunk_points, 3),
        ),
    )
    return S0 + G


def qrkit_pair_trial_sums(ctx: SchurContext, lam, pairs, n: int):
    """Per-trial re-damp correction sums from the qrkit PAIR-FORM cache.

    Returns (S_sum, b_sum) with S_sum = sum_k B_k^T (lam/(eh+lam)) B_k
    (the fill-in of eliminating the damped point columns — the module
    docstring identity) and b_sum its rhs companion, accumulated through
    the weighted pair-gram tables. Shared by the single-chip qrkit trial
    (_camera_solve_qr_cached) and the distributed trial
    (parallel/sharded.py), where each shard computes its LOCAL sums over
    its pair tables and ONE psum of the (9N)^2 partial forms the global
    correction — the same collective pattern as the chol Schur gram.
    """
    e = ctx.fill_evals
    lam_e = jnp.asarray(lam, e.dtype)
    w = (lam_e / (e + lam_e)).T  # (3, M); eh=0 (deficient) -> w=1,
    #                              whose B rows are zero — harmless
    sd = ctx.pairA.dtype
    w_ext = jnp.concatenate(
        [w.astype(sd), jnp.zeros((3, 1), sd)], axis=1
    )
    py_ext = jnp.concatenate(
        [(w * ctx.qr_cqT).astype(sd), jnp.zeros((3, 1), sd)], axis=1
    )
    acc = ctx.qr_S0cam.dtype
    return _pair_gram_tables(ctx, w_ext, py_ext, pairs, n, acc)


def _camera_solve_qr_cached(ctx: SchurContext, lam, problem, n: int):
    """qrkit camera step from the cached lambda-free QR factors.

    Three realizations of the same re-damp identity, by cache layout:

      * PAIR-FORM (ctx.qr_S0cam present — the default gram path when the
        problem carries pair tables): S(lam) = S0 + sum B^T (lam/(eh+lam)) B
        + lam I via ONE weighted pair gram over the cached B27 stacks —
        O(sum_p L_p^2) FLOPs and no dense cross-row cache (the p126-scale
        memory fix, VERDICT r4 item 1).
      * dense gram (_redamp_gram — gram path without pair tables): the
        same system accumulated from the dense cached rows.
      * row-QR (_redamp_qr): per-trial Householder row-QR of the rescaled
        cached rows — the orthogonal realization; the f32/df32 default.

    Gram vs row-QR selection: _qrkit_use_gram (f64-on-TPU default;
    BA_QRKIT_GRAM / BA_F64_ROWQR override — parsed as booleans, read at
    trace time). build_context makes the matching cache.
    """
    dtype = ctx.U.dtype
    n9 = 9 * n
    if ctx.qr_S0cam is not None:
        S_sum, b_sum = qrkit_pair_trial_sums(ctx, lam, problem.pairs, n)
        Scam = (
            ctx.qr_S0cam
            + S_sum.astype(dtype)
            + jnp.asarray(lam, dtype) * jnp.eye(n9, dtype=dtype)
        )
        b = ctx.qr_b0 + b_sum.reshape(-1).astype(dtype)
        return _camera_solve_chol(Scam, b)
    if _qrkit_use_gram(ctx.Rcc_aug.dtype):
        S_aug = _redamp_gram(ctx.Rcc_aug, ctx.QtRpc, ctx.fill_evals, lam)
        Scam = S_aug[:n9, :n9] + jnp.asarray(lam, S_aug.dtype) * jnp.eye(
            n9, dtype=S_aug.dtype
        )
        return _camera_solve_chol(
            Scam.astype(dtype), S_aug[:n9, n9].astype(dtype)
        )
    R = _redamp_qr(ctx.Rcc_aug, ctx.QtRpc, ctx.fill_evals, lam)
    Rd = R.astype(ctx.U.dtype)
    return linalg.solve_upper_triangular(Rd[:n9, :n9], Rd[:n9, n9])


def _spqr_gram_solve(ctx: SchurContext, lam, problem, n: int):
    """Whole-matrix augmented QR trial in R-only CholeskyQR form (f64/TPU).

    SuiteSparse-SPQR call semantics (BAFunctor.h:114-116): the ENTIRE damped
    matrix [J; sqrt(lam) I | b] is re-factored from scratch — batched
    orthogonal MGS QR of each augmented point panel (Q1(lam)), projection of
    the camera rows, then the camera-stage reduction. On TPU, emulated-f64
    Householder panels run ~150x slower than f64 matmuls (BASELINE.md r4
    probes), so the f64 camera reduction accumulates the projected-row gram
    (R-only CholeskyQR — B^T B = U_aug - Rpc(lam)^T Rpc(lam), exact by the
    projector identity) and solves with the Jacobi-scaled refined solver.
    The f32/df32 drives keep true Householder chunks (camera_tsqr_reduce).

    The whole trial is ONE scan over point chunks — per chunk: augmented
    MGS QR, camera-row projection, one-hot placement, gram accumulation.
    Materializing the full per-slot projected blocks (M, Lmax, 3, 9) first
    OOMed at p126-scale f64: XLA tiles the 27-lane minor dims at (4, 128)
    (~19x padding) and a remat copy of that tensor alone asked for 11.6 GB
    (round-5 repro, benchmarks/parity_campaign.json r4 history). Chunking
    bounds the padded temp to chunk_points * Lmax * 27 lanes per step.
    """
    dtype = ctx.U.dtype
    m = ctx.V.shape[0]
    sdt = ctx.Jp_stacked.dtype
    lmax2 = ctx.Jp_stacked.shape[1]
    lmax = lmax2 // 2
    ncols = 9 * n + 1
    acc = jnp.float32 if jnp.dtype(dtype) == jnp.bfloat16 else jnp.dtype(dtype)
    cam_slot = _cam_per_slot(problem)
    chunk = max(1, min(1024, m))
    nch = -(-m // chunk)
    pad = nch * chunk - m

    def padc(x):
        # Zero-padded tail points: their observation rows are zero, so their
        # Q1 obs-rows are zero (MGS of [0; sqrt(lam) I] puts all mass in the
        # lambda rows) and they contribute nothing to the gram.
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))

    Jp_c = padc(ctx.Jp_stacked).reshape(nch, chunk, lmax2, 3)
    Jc_c = padc(ctx.Jc_stacked).reshape(nch, chunk, lmax2, 9)
    rhs_c = padc(ctx.rhs_stacked).reshape(nch, chunk, lmax2)
    cam_c = padc(cam_slot).reshape(nch, chunk, lmax)
    sl = jnp.sqrt(jnp.asarray(lam, sdt))
    lam_rows = jnp.broadcast_to(sl * jnp.eye(3, dtype=sdt), (chunk, 3, 3))
    ar = jnp.arange(n, dtype=cam_slot.dtype)

    def body(G, inp):
        Jpc, Jcc, rc, cams = inp
        A = jnp.concatenate([Jpc, lam_rows], axis=1)
        Q1, _ = linalg.mgs_qr3(A)
        B, c = _point_row_blocks(Q1, Jcc, rc)
        onehot = (cams[..., None] == ar).astype(sdt)  # (chunk, L, N)
        rows = jnp.einsum("pln,plcj->pcnj", onehot, B)
        rows = rows.reshape(chunk, 3, 9 * n)
        rows = jnp.concatenate([rows, c[..., None]], axis=-1)
        flat = rows.reshape(chunk * 3, ncols)
        return (
            G
            + jax.lax.dot_general(
                flat, flat, (((0,), (0,)), ((), ())),
                preferred_element_type=acc,
            ),
            None,
        )

    G, _ = jax.lax.scan(
        body, jnp.zeros((ncols, ncols), acc), (Jp_c, Jc_c, rhs_c, cam_c)
    )
    # Corner energy is irrelevant to the solve (only S[:9N,:9N] and the rhs
    # column are consumed).
    U_aug = _aug_camera_gram(ctx.U, ctx.g_cams, 0.0, G.dtype)
    S_aug = U_aug - G
    n9 = 9 * n
    Scam = S_aug[:n9, :n9] + jnp.asarray(lam, G.dtype) * jnp.eye(n9, dtype=G.dtype)
    b = S_aug[:n9, n9]
    return _camera_solve_chol(Scam.astype(dtype), b.astype(dtype))


def camera_solve_qr(
    ctx: SchurContext, lam, problem, Linv, chunk_points: int = 512, mm_dtype=None
):
    """Whole-matrix QR camera solve, re-factored per trial (spqr; also the
    distributed fallback for both QR modes — see parallel/sharded.py).

    f32/df32: genuine chunked Householder TSQR (camera_tsqr_reduce).
    f64 on TPU: R-only CholeskyQR form (_spqr_gram_solve) — same
    factorization, MXU arithmetic; set BA_F64_ROWQR=1 to force the (slow)
    emulated Householder path."""
    red = jnp.dtype(mm_dtype or ctx.U.dtype)
    if (
        red == jnp.float64
        and jax.default_backend() == "tpu"
        and not _env_flag("BA_F64_ROWQR")
    ):
        return _spqr_gram_solve(ctx, lam, problem, problem.n_cameras)
    R_reduced = camera_tsqr_reduce(
        ctx, lam, problem, Linv, chunk_points, mm_dtype=mm_dtype
    )
    return finish_camera_qr(
        R_reduced.astype(ctx.U.dtype), lam, problem.n_cameras
    )


def camera_tsqr_reduce(
    ctx: SchurContext, lam, problem, Linv, chunk_points: int = 512, mm_dtype=None
):
    """Chunked TSQR reduction over point-projected camera rows -> R factor.

    Per point p (rows of the augmented system after the left block QR):
        B_p = (I - Q1 Q1^T) [A_cam | b]    with  Q1 = A_pt_aug L^-T
    where A_pt_aug/A_cam are the point's stacked observation rows (+
    sqrt(lam) I_3 point-lambda rows with zero camera columns). Rows are
    scattered into dense 9N+1 columns one chunk of points at a time and
    reduced with a running R via jnp.linalg.qr — the TSQR replacement for the
    reference's multithreaded DenseBlockedThinQR (BAFunctor.h:101) and for
    SPQR's whole-matrix QR. The trailing rhs column carries Q^T b through the
    reduction (augmented-column trick), so no explicit Q is ever formed.
    """
    obs = problem.obs
    n, m = problem.n_cameras, problem.n_points
    dtype = mm_dtype or ctx.U.dtype  # the reduction runs in the matmul dtype
    lmax = problem.pt_obs_idx.shape[1]
    ncols = 9 * n + 1
    chunk_points = max(1, min(chunk_points, m))
    sl = jnp.sqrt(lam)

    # Per-point camera-column map for each stacked row (sentinel -> camera 0
    # with all-zero row data, harmless).
    cam_ext = jnp.concatenate([obs.cam_idx, jnp.zeros((1,), obs.cam_idx.dtype)])
    cam_per_slot = cam_ext[problem.pt_obs_idx]  # (M, Lmax)

    # Q1 is computed in the accurate dtype (it encodes the point factor),
    # then cast for the bulk reduction.
    Q1_obs = jnp.einsum("mrj,mcj->mrc", ctx.Jp_stacked, Linv)  # (M, 2Lmax, 3)
    Q1_lam = sl * jnp.swapaxes(Linv, -1, -2)  # (M, 3, 3)
    Q1 = jnp.concatenate([Q1_obs, Q1_lam], axis=1).astype(dtype)

    rows_per_point = 2 * lmax + 3
    nchunks = -(-m // chunk_points)
    pad_points = nchunks * chunk_points - m

    def pad(x, value=0):
        cfg = [(0, pad_points)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=value)

    Jc_st = pad(ctx.Jc_stacked).reshape(nchunks, chunk_points, 2 * lmax, 9)
    rhs_st = pad(ctx.rhs_stacked).reshape(nchunks, chunk_points, 2 * lmax)
    cam_st = pad(cam_per_slot).reshape(nchunks, chunk_points, lmax)
    Q1_st = pad(Q1).reshape(nchunks, chunk_points, rows_per_point, 3)

    def chunk_body(carry_R, inp):
        Jc_c, rhs_c, cam_c, Q1_c = inp
        P = chunk_points
        # Place camera blocks at their dense block-columns via a one-hot
        # contraction (scatter-free; see _schur_gram_chunked).
        slot_cam = jnp.repeat(cam_c, 2, axis=1)  # (P, 2Lmax)
        onehot = (
            slot_cam[..., None] == jnp.arange(n, dtype=slot_cam.dtype)
        ).astype(dtype)  # (P, 2Lmax, N)
        # Each row r holds exactly one camera's 9 columns: outer-product the
        # one-hot with the row's block, keeping rows distinct.
        A = onehot[..., None] * Jc_c[:, :, None, :]  # (P, 2Lmax, N, 9)
        A = A.reshape(P, 2 * lmax, 9 * n)
        A = jnp.concatenate([A, jnp.zeros((P, 3, 9 * n), dtype)], axis=1)
        rhs_full = jnp.concatenate([rhs_c, jnp.zeros((P, 3), dtype)], axis=1)
        Ab = jnp.concatenate([A, rhs_full[..., None]], axis=-1)  # (P, rows, 9N+1)
        # Project out the point columns: B = (I - Q1 Q1^T) Ab.
        QtA = jnp.einsum("prc,prj->pcj", Q1_c, Ab)  # (P, 3, 9N+1)
        B = Ab - jnp.einsum("prc,pcj->prj", Q1_c, QtA)
        B = B.reshape(P * rows_per_point, ncols)
        stacked = jnp.concatenate([carry_R, B], axis=0)
        new_R = jnp.linalg.qr(stacked, mode="r")
        return new_R, None

    R0 = jnp.zeros((ncols, ncols), dtype)
    R_final, _ = jax.lax.scan(
        chunk_body, R0, (Jc_st, rhs_st, cam_st, Q1_st)
    )
    return R_final


def finish_camera_qr(R_reduced, lam, n_cameras: int):
    """Append the global camera lambda rows [sqrt(lam) I_9N | 0], final QR, solve.

    Split out of camera_solve_qr so the distributed path can all-gather
    per-shard R factors and run this combiner replicated (the TSQR reduce).
    """
    dtype = R_reduced.dtype
    n9 = 9 * n_cameras
    sl = jnp.sqrt(jnp.asarray(lam, dtype))
    lam_rows = jnp.concatenate(
        [sl * jnp.eye(n9, dtype=dtype), jnp.zeros((n9, 1), dtype)], axis=1
    )
    R_final = jnp.linalg.qr(
        jnp.concatenate([R_reduced, lam_rows], axis=0), mode="r"
    )
    Rcam = R_final[:n9, :n9]
    qtb = R_final[:n9, n9]
    return linalg.solve_upper_triangular(Rcam, qtb)


def gradient_dot(ctx: SchurContext, dxp, dxc, lam):
    """rhoScale = dx^T (lam dx + JtRes) (BacktrackLevMarqCholesky.h:300).

    f64 reduces for f64 arrays; plain f32 dots for f32 arrays — both terms
    of the denominator are positive (dx^T JtRes > 0 for a descent step), so
    there is no cancellation and the ~1e-5 relative f32 dot error only
    perturbs the Nielsen lambda heuristic noise-level. (The previous
    compensated two-float dots cost ~0.3 ms per damping trial on
    problem-21 for accuracy the accept decision never consumes.)"""
    acc = jnp.float64 if jax.config.jax_enable_x64 else dxc.dtype

    def dsum(a, b):
        if a.dtype == jnp.float64:
            return jnp.sum(a * b, dtype=acc)
        return jnp.sum(a * b).astype(acc)

    jtres_dot = dsum(dxc, ctx.g_cams.astype(dxc.dtype)) + dsum(
        dxp, ctx.g_pts.astype(dxp.dtype)
    )
    dx_norm2 = dsum(dxc, dxc) + dsum(dxp, dxp)
    return jnp.asarray(lam, acc) * dx_norm2 + jtres_dot
