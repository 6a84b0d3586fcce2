"""BA problem model: SoA pytrees for cameras, points and observations.

TPU-native replacement of the reference's AoS InputType
(/root/reference/src/Optimization/BAFunctor.h:39-51: vectors of CameraMatrix /
DistortionFunction objects + 3xM point matrix + weights). Here everything is a
flat array pytree so the whole problem state can be traced through jit,
donated between LM iterations, and sharded over a device mesh.

Reference model conventions replicated exactly on ingestion
(bundle_adjustment_large.cpp:57-108):
  * measurements are divided by avg_focal_length (=1.0 by default, a no-op);
  * K = diag(-f, -f, 1): NEGATIVE focal length encodes BAL's -z viewing
    convention (bundle_adjustment_large.cpp:88-90);
  * distortion coefficients are PRE-SCALED to (k1*f^2, k2*f^4)
    (bundle_adjustment_large.cpp:97-98), so the implemented projection is
    -f*(1 + k1 f^2 r^2 + k2 f^4 r^4)*xu, not textbook BAL;
  * R = exp([omega]_x) with the 1e-6 small-angle cutoff (MathUtils.h:66-82).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.io import bal
from bundleadjustment_benchmarks_tpu.ops import rodrigues
from bundleadjustment_benchmarks_tpu.ops import twofloat as tf

#: Camera parameter ordering within a 9-vector step (BAFunctor.h:303-309):
#: T(0:3), omega(3:6), f(6), k1(7), k2(8). Points come FIRST in the reference's
#: global column ordering (cols [0, 3M) = points; BAFunctor.h:183-191).
CAM_PARAMS = 9
POINT_PARAMS = 3


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAState:
    """Optimization variables (the reference InputType, as SoA arrays).

    Attributes:
      K: (N, 3, 3) intrinsic matrices; BAL gives diag(-f, -f, 1).
      R: (N, 3, 3) world->camera rotations.
      T: (N, 3) translations.
      k1, k2: (N,) pre-scaled radial distortion coefficients.
      points: (M, 3) world points.
    """

    K: jax.Array
    R: jax.Array
    T: jax.Array
    k1: jax.Array
    k2: jax.Array
    points: jax.Array

    @property
    def n_cameras(self) -> int:
        return self.T.shape[0]

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def focal(self) -> jax.Array:
        """K(0,0) per camera — the reference getFocalLength (CameraMatrix.cpp:207)."""
        return self.K[:, 0, 0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAObservations:
    """Measurement data (constant during optimization), sorted by point index.

    Attributes:
      cam_idx: (K,) int32.
      pt_idx: (K,) int32, non-decreasing (sorted at load).
      measurements: (K, 2), already divided by avg_focal_length.
      weights: (K,) — carried for parity with the reference InputType
        ("FixMe: Not used for now", BAFunctor.h:295,341); unused in the math.
      measurements_pl: optional (2, K) f32 planar copy, precomputed at load —
        the Pallas chain consumes planar rows every damping trial and XLA
        does not hoist the column-slice relayouts out of the LM while loop
        (measured ~0.17 ms/trial of per-row copies on problem-21).
    """

    cam_idx: jax.Array
    pt_idx: jax.Array
    measurements: jax.Array
    weights: jax.Array
    measurements_pl: Optional[jax.Array] = None
    #: Pre-tiled (St, 128) index maps + (2, St, 128) f32 measurements for the
    #: Pallas chain (St*128 = K padded to a grid multiple, padding clamped to
    #: the last observation and masked downstream). Gathering DIRECTLY into
    #: the kernel's tiled operand shape removes the per-trial pad+reshape
    #: relayout copies of every planar row (measured ~0.8 ms/trial total).
    cam_idx_t: Optional[jax.Array] = None
    pt_idx_t: Optional[jax.Array] = None
    meas_t: Optional[jax.Array] = None

    @property
    def n_observations(self) -> int:
        return self.cam_idx.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairTables:
    """Static gather tables for the observation-pair Schur gram.

    The reduced camera matrix S = Z^T Z only couples cameras that co-observe
    a point: block (ca, cb) = sum over observation pairs (i, j) of the same
    point with cam_i = ca, cam_j = cb of C_i C_j^T. Enumerating those pairs
    directly costs sum_p L_p(L_p-1)/2 tiny products — ~1000x fewer FLOPs at
    BAL scale than the dense (3M, 9N) x (9N,) gram matmul the chunked builder
    performs (docs/DESIGN.md section 3), and it is pure gather + VPU/MXU work
    (XLA scatter is unusable on TPU at this scale).

    All tables are built once from the static (cam_idx, pt_idx) structure:

      row_a/row_b: (R, l_row) observation indices of pair members; each row
        holds up to l_row pairs OF ONE (ca, cb) key (rows are key-pure;
        long keys are split across rows for load balance). Sentinel K
        gathers a zero block.
      key_table: (KO, rmax) row ids per observed key, sentinel R.
      key_to_obs: (N*N,) dense key -> observed-key index, sentinel KO; the
        final placement is thus a GATHER into the dense (N, N, 9, 9) upper
        block array — no scatter anywhere. Strictly-upper keys only
        (ca < cb); the diagonal blocks sum C_i C_i^T per camera and are
        computed by the existing per-camera segment gram.
    """

    row_a: jax.Array  # (R, l_row) int32, sentinel = n_observations
    row_b: jax.Array  # (R, l_row) int32, sentinel = n_observations
    key_table: jax.Array  # (KO, rmax) int32, sentinel = R
    key_to_obs: jax.Array  # (N*N,) int32, sentinel = KO
    #: Point index per pair slot, sentinel = n_points (a zero weight row):
    #: feeds the per-trial eigenvalue-weight gather of the cached pair gram
    #: (schur._pair_S_cached). Built HERE (numpy, load time) because inside
    #: the jitted LM loop XLA cannot hoist its recomputation out of the
    #: outer while body — measured ~2 ms/iteration of pure waste.
    row_pt: jax.Array  # (R, l_row) int32, sentinel = n_points


def _pair_tables(
    pt_idx: np.ndarray, cam_idx: np.ndarray, n_cameras: int, l_row: int = 16
) -> Optional[PairTables]:
    """Build PairTables from sorted pt_idx (numpy, load-time, O(#pairs))."""
    k = pt_idx.shape[0]
    n_points = int(pt_idx.max()) + 1 if k else 0
    counts = np.bincount(pt_idx, minlength=n_points)
    starts = np.zeros(n_points, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])

    # Enumerate strict pairs (i < j) within each point segment, vectorized
    # per multiplicity class L (few distinct L values in BAL data).
    a_parts, b_parts = [], []
    for L in np.unique(counts):
        if L < 2:
            continue
        pts = np.nonzero(counts == L)[0]
        ia, ib = np.triu_indices(int(L), k=1)
        base = starts[pts][:, None]
        a_parts.append((base + ia[None, :]).ravel())
        b_parts.append((base + ib[None, :]).ravel())
    if not a_parts:
        return None
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    ca = cam_idx[a].astype(np.int64)
    cb = cam_idx[b].astype(np.int64)
    # Orient so ca < cb (distinct observations of one point never share a
    # camera in BAL; S block (cb, ca) is the transpose, added at assembly).
    swap = ca > cb
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    key = np.minimum(ca, cb) * n_cameras + np.maximum(ca, cb)

    order = np.argsort(key, kind="stable")
    a2, b2, key = a2[order], b2[order], key[order]
    q = key.shape[0]

    ukeys, key_counts = np.unique(key, return_counts=True)
    ko = ukeys.shape[0]
    rows_per_key = -(-key_counts // l_row)
    row_off = np.zeros(ko + 1, dtype=np.int64)
    np.cumsum(rows_per_key, out=row_off[1:])
    r = int(row_off[-1])

    # Position of each pair within its key, then (row, slot).
    key_start = np.zeros(ko, dtype=np.int64)
    np.cumsum(key_counts[:-1], out=key_start[1:])
    key_id = np.repeat(np.arange(ko), key_counts)
    pos = np.arange(q) - key_start[key_id]
    row_id = row_off[key_id] + pos // l_row
    slot = pos % l_row

    row_a = np.full((r, l_row), k, dtype=np.int32)
    row_b = np.full((r, l_row), k, dtype=np.int32)
    row_pt = np.full((r, l_row), n_points, dtype=np.int32)
    row_a[row_id, slot] = a2.astype(np.int32)
    row_b[row_id, slot] = b2.astype(np.int32)
    row_pt[row_id, slot] = pt_idx[a2].astype(np.int32)

    rmax = int(rows_per_key.max())
    key_table = np.full((ko, rmax), r, dtype=np.int32)
    kk = np.repeat(np.arange(ko), rows_per_key)
    rpos = np.arange(r) - row_off[kk]
    key_table[kk, rpos] = np.arange(r, dtype=np.int32)

    key_to_obs = np.full(n_cameras * n_cameras, ko, dtype=np.int32)
    key_to_obs[ukeys] = np.arange(ko, dtype=np.int32)

    return PairTables(
        row_a=jnp.asarray(row_a),
        row_b=jnp.asarray(row_b),
        key_table=jnp.asarray(key_table),
        key_to_obs=jnp.asarray(key_to_obs),
        row_pt=jnp.asarray(row_pt),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BAProblem:
    """A full BA problem: state + observations + robust threshold + segment maps.

    ``pt_obs_idx`` is a (M, Lmax) gather table mapping each point to the
    observation rows that see it (padded with K, an out-of-range sentinel);
    it feeds the batched per-point QR elimination (the TPU replacement for the
    reference's BlockDiagonalSparseQR over CSC point columns).
    """

    state: BAState
    obs: BAObservations
    pt_obs_idx: jax.Array  # (M, Lmax) int32, padded with n_observations
    pt_obs_count: jax.Array  # (M,) int32
    cam_obs_idx: jax.Array  # (N, Lcam) int32, padded with n_observations
    inlier_threshold: float = dataclasses.field(metadata=dict(static=True))
    avg_focal_length: float = dataclasses.field(metadata=dict(static=True))
    #: Optional pair tables for the observation-pair Schur gram (see
    #: PairTables); None falls back to the chunked dense gram.
    pairs: Optional[PairTables] = None
    #: Point index per cam_obs_idx slot, sentinel = n_points. Load-time
    #: companion of cam_obs_idx for the cached pair gram's per-trial weight
    #: gathers (see PairTables.row_pt for why it is precomputed).
    cam_obs_pt: Optional[jax.Array] = None  # (N, Lcam) int32
    #: Degree-banded versions of pt_obs_idx / cam_obs_idx (see BandedTable):
    #: the single padded tables waste 2-5x gather bandwidth on BAL degree
    #: distributions. Consumed by the gram/segment-sum hot paths; the padded
    #: tables remain for the QR point stacks (which need one uniform shape).
    pt_banded: Optional[BandedTable] = None
    cam_banded: Optional[BandedTable] = None

    @property
    def tau2(self) -> float:
        return self.inlier_threshold * self.inlier_threshold

    @property
    def n_cameras(self) -> int:
        return self.state.n_cameras

    @property
    def n_points(self) -> int:
        return self.state.n_points

    @property
    def n_observations(self) -> int:
        return self.obs.n_observations

    @property
    def max_obs_per_point(self) -> int:
        return self.pt_obs_idx.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BandedTable:
    """Degree-banded gather tables for scatter-free segment reductions.

    A single (S, Lmax) gather table pads EVERY segment to the maximum degree;
    on BAL data the mean point degree is ~3 while Lmax is ~15-100, so ~70-80%
    of the gathered bytes are sentinel zeros (measured: the padded point-gram
    gather alone cost ~1 ms/LM-iteration on problem-21). Here segments are
    grouped by degree class: band i holds the segments whose degree rounds up
    to width w_i, as its own (S_i, w_i) table. Band results are concatenated
    (degree-sorted order) and returned to natural order with one tiny (S,)
    gather — no scatter anywhere.

    Attributes:
      tables: per-band (S_i, w_i) gather tables, sentinel = n_values.
      aux: optional per-band companion tables (same shapes) carrying the
        point index of each slot (sentinel = n_points) — used by the cached
        pair-gram's per-trial eigenvalue-weight gathers.
      unperm: (S,) int32; concat-order -> natural order gather indices.
    """

    tables: tuple
    unperm: jax.Array
    aux: Optional[tuple] = None


def _banded_table_np(
    idx: np.ndarray, n_segments: int, aux_values: Optional[np.ndarray] = None,
    aux_sentinel: int = 0, max_bands: int = 4,
    classes: Optional[np.ndarray] = None,
    rows_per_band: Optional[np.ndarray] = None,
):
    """Numpy core of _banded_table.

    ``classes``/``rows_per_band``: optional FIXED descending band widths and
    per-band row counts — the sharded drive builds one banded table per
    shard and shard_map needs identical shapes across shards, so it
    precomputes the union classes and max row counts and passes them here;
    bands are padded with all-sentinel dummy rows that ``unperm`` never
    references. Returns (tables, unperm, aux_tables, classes, rows) as numpy.
    """
    k = idx.shape[0]
    counts = np.bincount(idx, minlength=n_segments)
    widths = np.maximum(1, 2 ** np.ceil(np.log2(np.maximum(counts, 1))).astype(int))
    if classes is None:
        # Power-of-two width class per segment, capped at max_bands distinct
        # classes (the largest classes merge into one).
        cls = np.unique(widths)[::-1]  # descending
        if len(cls) > max_bands:
            merged = cls[max_bands - 1 :]
            widths = np.where(np.isin(widths, merged[1:]), merged[0], widths)
            cls = np.unique(widths)[::-1]
    else:
        cls = np.asarray(classes)
        assert cls[0] >= widths.max(), (cls, widths.max())
        # Each segment joins the smallest fixed class that fits its degree
        # (cls is descending: the LAST class >= width).
        widths = cls[np.searchsorted(-cls, -widths, side="right") - 1]
    # Group segments by class (stable within class -> deterministic).
    order = np.argsort(-widths, kind="stable")

    starts = np.zeros(n_segments, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sorted_vals = np.argsort(idx, kind="stable")  # values grouped by segment
    sorted_seg = idx[sorted_vals]
    pos = np.arange(k, dtype=np.int64) - starts[sorted_seg]
    aux_ext = (
        np.append(aux_values, aux_sentinel).astype(np.int32)
        if aux_values is not None
        else None
    )

    tables = []
    aux_tables = []
    rows_out = []
    unperm = np.empty(n_segments, dtype=np.int32)
    lo = 0
    offset = 0
    for b, w in enumerate(cls):
        segs = order[lo : lo + int((widths == w).sum())]
        lo += len(segs)
        nrows = (
            len(segs) if rows_per_band is None else int(rows_per_band[b])
        )
        assert nrows >= len(segs)
        rows_out.append(nrows)
        row_of = np.full(n_segments, -1, dtype=np.int64)
        row_of[segs] = np.arange(len(segs))
        unperm[segs] = offset + np.arange(len(segs), dtype=np.int32)
        offset += nrows
        tbl = np.full((nrows, int(w)), k, dtype=np.int32)
        member = row_of[sorted_seg] >= 0
        tbl[row_of[sorted_seg[member]], pos[member]] = sorted_vals[
            member
        ].astype(np.int32)
        tables.append(tbl)
        if aux_ext is not None:
            aux_tables.append(aux_ext[np.minimum(tbl, k)])
    return tables, unperm, aux_tables, cls, np.asarray(rows_out)


def _banded_table(
    idx: np.ndarray, n_segments: int, aux_values: Optional[np.ndarray] = None,
    aux_sentinel: int = 0, max_bands: int = 4,
) -> BandedTable:
    """Build a BandedTable from (unsorted) segment indices.

    Band widths are the distinct power-of-two roundings of the segment
    degrees (capped at ``max_bands`` classes; the largest classes merge).
    ``aux_values``: optional (K,) per-value companion (e.g. point index);
    gathered into per-band aux tables with ``aux_sentinel`` padding.
    """
    tables, unperm, aux_tables, _, _ = _banded_table_np(
        idx, n_segments, aux_values=aux_values, aux_sentinel=aux_sentinel,
        max_bands=max_bands,
    )
    return BandedTable(
        tables=tuple(jnp.asarray(t) for t in tables),
        unperm=jnp.asarray(unperm),
        aux=tuple(jnp.asarray(a) for a in aux_tables)
        if aux_values is not None
        else None,
    )


def _index_table(idx: np.ndarray, n_segments: int) -> np.ndarray:
    """(n_segments, Lmax) gather table for ARBITRARY (unsorted) indices,
    padded with the sentinel len(idx). Enables scatter-free segment sums
    (gather + sum over slots) — XLA scatter lowers catastrophically on TPU.
    """
    k = idx.shape[0]
    counts = np.bincount(idx, minlength=n_segments)
    lmax = int(counts.max()) if counts.size else 0
    table = np.full((n_segments, max(lmax, 1)), k, dtype=np.int32)
    order = np.argsort(idx, kind="stable")
    sorted_idx = idx[order]
    starts = np.zeros(n_segments, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(k) - starts[sorted_idx]
    table[sorted_idx, pos] = order.astype(np.int32)
    return table


def _point_segment_table(pt_idx: np.ndarray, n_points: int, pad_to: Optional[int]):
    """Build the (M, Lmax) observation gather table from sorted pt_idx."""
    counts = np.bincount(pt_idx, minlength=n_points).astype(np.int32)
    lmax = int(counts.max()) if counts.size else 0
    if pad_to is not None:
        lmax = max(lmax, pad_to)
    starts = np.zeros(n_points, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    k = pt_idx.shape[0]
    table = np.full((n_points, max(lmax, 1)), k, dtype=np.int32)
    ar = np.arange(k, dtype=np.int64)
    # Position of each observation within its point segment.
    pos = ar - starts[pt_idx]
    table[pt_idx, pos] = ar.astype(np.int32)
    return table, counts


def from_bal_dataset(
    ds: bal.BalDataset,
    dtype=jnp.float64,
    inlier_threshold: float = 0.5,
    avg_focal_length: float = 1.0,
) -> BAProblem:
    """Build a BAProblem from raw BAL data, applying the reference conventions.

    Observations are stably sorted by point index so each point's observations
    form a contiguous segment (the BA analog of sequence-sorted sharding);
    this reorders the residual vector relative to the reference, which changes
    no sums/norms the algorithms consume.
    """
    order = np.argsort(ds.pt_idx, kind="stable")
    cam_idx = ds.cam_idx[order]
    pt_idx = ds.pt_idx[order]
    meas = ds.measurements[order] / avg_focal_length

    f = ds.focal / avg_focal_length
    n = ds.n_cameras
    K = np.zeros((n, 3, 3))
    K[:, 0, 0] = -f
    K[:, 1, 1] = -f
    K[:, 2, 2] = 1.0
    f_raw = ds.focal
    k1 = ds.k1 * f_raw**2
    k2 = ds.k2 * f_raw**4

    # Rotation init in the widest available dtype (f32 when x64 is off —
    # the pure-f32 sweep point intentionally runs everything in f32).
    wide = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    R = np.asarray(rodrigues.exp_rodrigues(jnp.asarray(ds.omega, dtype=wide)))

    state = BAState(
        K=jnp.asarray(K, dtype),
        R=jnp.asarray(R, dtype),
        T=jnp.asarray(ds.translation, dtype),
        k1=jnp.asarray(k1, dtype),
        k2=jnp.asarray(k2, dtype),
        points=jnp.asarray(ds.points, dtype),
    )
    k_obs = cam_idx.shape[0]
    tiled = {}
    if k_obs:
        # Tile geometry must match ops/pallas_chain (LANES=128, TILE=4096).
        kpad = -(-k_obs // 4096) * 4096
        flat = np.minimum(np.arange(kpad, dtype=np.int64), k_obs - 1)
        tiled = dict(
            cam_idx_t=jnp.asarray(
                cam_idx[flat].reshape(-1, 128).astype(np.int32)
            ),
            pt_idx_t=jnp.asarray(
                pt_idx[flat].reshape(-1, 128).astype(np.int32)
            ),
            meas_t=jnp.asarray(
                np.ascontiguousarray(meas.T)[:, flat]
                .reshape(2, -1, 128)
                .astype(np.float32)
            ),
        )
    obs = BAObservations(
        cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx),
        measurements=jnp.asarray(meas, dtype),
        weights=jnp.ones((cam_idx.shape[0],), dtype),
        measurements_pl=jnp.asarray(
            np.ascontiguousarray(meas.T), jnp.float32
        ),
        **tiled,
    )
    table, counts = _point_segment_table(pt_idx, ds.n_points, pad_to=None)
    cam_table = _index_table(cam_idx, n)
    pt_ext = np.append(pt_idx, ds.n_points).astype(np.int32)
    cam_pt = pt_ext[np.minimum(cam_table, pt_idx.shape[0])]
    return BAProblem(
        state=state,
        obs=obs,
        pt_obs_idx=jnp.asarray(table),
        pt_obs_count=jnp.asarray(counts),
        cam_obs_idx=jnp.asarray(cam_table),
        inlier_threshold=float(inlier_threshold),
        avg_focal_length=float(avg_focal_length),
        pairs=_pair_tables(pt_idx, cam_idx, n),
        cam_obs_pt=jnp.asarray(cam_pt),
        pt_banded=_banded_table(pt_idx, ds.n_points, aux_values=pt_idx,
                                aux_sentinel=ds.n_points),
        cam_banded=_banded_table(cam_idx, n, aux_values=pt_idx,
                                 aux_sentinel=ds.n_points),
    )


def load_bal_problem(
    path: str,
    dtype=jnp.float64,
    inlier_threshold: float = 0.5,
    avg_focal_length: float = 1.0,
) -> BAProblem:
    """Read a BAL file and build the problem pytree (reference main():50-108)."""
    return from_bal_dataset(
        bal.read_bal(path),
        dtype=dtype,
        inlier_threshold=inlier_threshold,
        avg_focal_length=avg_focal_length,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FastBAState:
    """LM loop state for the df32 geometry drive (TPU fast path).

    Camera parameters (N-sized) stay in the problem dtype — updating 9N
    scalars per iteration in emulated f64 is free and keeps the incremental
    rotation composition R <- exp(dw) R drift-free across hundreds of
    iterations. Points (M-sized) ride as a two-float (hi, lo) f32 pair so the
    per-iteration point update and all K-sized geometry run without a single
    f64 HLO (see ops/twofloat.py for why emulated f64 is fatal on TPU).

    ``points`` components are PLANAR (3, M): the per-trial gathers and the
    Pallas chain consume planar rows, and the (M, 3) transposes otherwise
    re-materialize inside the LM loop every damping trial.
    """

    K: jax.Array
    R: jax.Array
    T: jax.Array
    k1: jax.Array
    k2: jax.Array
    points: tf.DF

    @property
    def focal(self) -> jax.Array:
        return self.K[:, 0, 0]


def to_fast(state: BAState) -> FastBAState:
    """Split a BAState into the df32 loop representation (jit-boundary op)."""
    return FastBAState(
        K=state.K,
        R=state.R,
        T=state.T,
        k1=state.k1,
        k2=state.k2,
        points=tf.from_array(state.points.T),
    )


def from_fast(fast: FastBAState, dtype=None) -> BAState:
    """Merge the df32 loop representation back into a BAState."""
    dtype = dtype or fast.T.dtype
    points = tf.to_f64(fast.points) if dtype == jnp.float64 else tf.to_f32(fast.points)
    return BAState(
        K=fast.K,
        R=fast.R,
        T=fast.T,
        k1=fast.k1,
        k2=fast.k2,
        points=points.T.astype(dtype),
    )


def apply_step_fast(
    fast: FastBAState, dx_points: jax.Array, dx_cams: jax.Array
) -> FastBAState:
    """Manifold update on the df32 state (same semantics as apply_step).

    Camera updates run in the camera dtype (N-sized, negligible); the point
    update is a compensated DF += f32 — exact to ~2^-48 with zero f64 ops on
    the M-sized data.
    """
    dx_cams = dx_cams.astype(fast.T.dtype)
    dT = dx_cams[:, 0:3]
    domega = dx_cams[:, 3:6]
    df_ = dx_cams[:, 6]
    dk1 = dx_cams[:, 7]
    dk2 = dx_cams[:, 8]
    dR = rodrigues.exp_rodrigues(domega)
    eye_delta = jnp.zeros_like(fast.K)
    eye_delta = eye_delta.at[:, 0, 0].set(df_).at[:, 1, 1].set(df_)
    return FastBAState(
        K=fast.K + eye_delta,
        R=jnp.einsum("nij,njk->nik", dR, fast.R),
        T=fast.T + dT,
        k1=fast.k1 + dk1,
        k2=fast.k2 + dk2,
        points=tf.add_f(fast.points, dx_points.T.astype(jnp.float32)),
    )


def apply_step(state: BAState, dx_points: jax.Array, dx_cams: jax.Array) -> BAState:
    """Manifold update — the reference update_params (BAFunctor.h:299-342).

    dx_cams is (N, 9) ordered [dT(3), domega(3), df, dk1, dk2]; dx_points is
    (M, 3). Semantics: T += dT; R <- exp([domega]_x) @ R0 (LEFT-multiplied
    incremental Rodrigues); k1/k2 += d; K(0,0) and K(1,1) += df; points += dX.
    """
    # Steps may arrive in a lower compute dtype (mixed precision); the
    # manifold update itself runs in the state dtype so rotation updates
    # don't accumulate low-precision drift across iterations.
    dx_cams = dx_cams.astype(state.T.dtype)
    dx_points = dx_points.astype(state.points.dtype)
    dT = dx_cams[:, 0:3]
    domega = dx_cams[:, 3:6]
    df = dx_cams[:, 6]
    dk1 = dx_cams[:, 7]
    dk2 = dx_cams[:, 8]
    dR = rodrigues.exp_rodrigues(domega)
    eye_delta = jnp.zeros_like(state.K)
    eye_delta = eye_delta.at[:, 0, 0].set(df).at[:, 1, 1].set(df)
    return BAState(
        K=state.K + eye_delta,
        R=jnp.einsum("nij,njk->nik", dR, state.R),
        T=state.T + dT,
        k1=state.k1 + dk1,
        k2=state.k2 + dk2,
        points=state.points + dx_points,
    )
