"""Distributed bundle adjustment: point/observation sharding over a device mesh.

The reference has no distributed code (SURVEY.md section 2.4); its implicit
data-level parallelism — M independent point blocks, K independent observation
Jacobians — is exactly what shards here. Design (SURVEY.md sections 5, 7):

  * one mesh axis ``obs``; POINTS are partitioned into contiguous chunks, and
    because observations are sorted by point at ingestion, each point's
    observations land on the same shard (the BA analog of sequence-sharded
    context parallelism);
  * camera state (9N params) is REPLICATED — the analog of replicated small
    tensor-parallel matrices;
  * per shard: residuals/Jacobian blocks, point factors V_p, couplings W_i,
    and the local Schur contribution -Z_local^T Z_local are computed
    independently; one ``psum`` over ``obs`` forms the 9N x 9N reduced camera
    system (ICI all-reduce), which every device then solves redundantly
    (cheaper than solving on one device + broadcast for these sizes);
  * the camera step is already replicated after the solve; point
    back-substitution is purely local. For the qrkit/spqr camera-QR path the
    per-shard TSQR R factors are all-gathered and reduced — a distributed
    tall-skinny QR.

Padded observations/points are masked: their Jacobian blocks and residuals
are zeroed, so they contribute nothing to any reduction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bundleadjustment_benchmarks_tpu.models import problem as problem_mod
from bundleadjustment_benchmarks_tpu.ops import jacobian as jacobian_mod
from bundleadjustment_benchmarks_tpu.ops import linalg, projection, robust
from bundleadjustment_benchmarks_tpu.solvers import lm as lm_mod
from bundleadjustment_benchmarks_tpu.solvers import schur

AXIS = "obs"


def make_mesh(n_devices: Optional[int] = None, axis: str = AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedObservations:
    """Per-shard padded observation data (global shape D*Ks along dim 0)."""

    cam_idx: jax.Array  # (Kp,) int32, replicated camera index
    pt_idx: jax.Array  # (Kp,) int32, LOCAL point index within the shard
    measurements: jax.Array  # (Kp, 2)
    weights: jax.Array  # (Kp,) 1.0 for real observations, 0.0 for padding

    @property
    def n_observations(self) -> int:
        return self.cam_idx.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedProblem:
    """A BAProblem re-laid-out for a mesh: sharded points/observations,
    replicated cameras. Static geometry lives in meta fields."""

    state: problem_mod.BAState  # cameras replicated; points (Mp, 3) sharded
    obs: ShardedObservations
    pt_obs_idx: jax.Array  # (Mp, Lmax) LOCAL obs row indices, sentinel = Ks
    cam_obs_idx: jax.Array  # (D*N, Lcam) per-shard camera->local-obs table
    inlier_threshold: float = dataclasses.field(metadata=dict(static=True))
    avg_focal_length: float = dataclasses.field(metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    obs_per_shard: int = dataclasses.field(metadata=dict(static=True))
    points_per_shard: int = dataclasses.field(metadata=dict(static=True))
    n_points_global: int = dataclasses.field(metadata=dict(static=True))
    #: Global point index where each shard's contiguous chunk begins
    #: (shards are balanced by OBSERVATION count, so chunks are uneven).
    pt_starts: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    #: Per-shard observation-pair tables (PairTables leaves stacked along
    #: dim 0 and mesh-sharded; indices are shard-LOCAL, keys are global
    #: camera pairs) — pairs of a point live on its own shard because
    #: observations are point-sorted and shards are point-contiguous. None
    #: falls back to the chunked gram.
    pairs: Optional[problem_mod.PairTables] = None
    cam_obs_pt: Optional[jax.Array] = None  # (D*N, Lcam) local pt, sent. Mp
    #: (D,) int32 real-observation count per shard (the padding suffix mask
    #: for the df32/Pallas kernels, which take it as the kernel's valid
    #: count instead of multiplying K-sized weight masks).
    obs_counts: Optional[jax.Array] = None
    #: Per-shard degree-banded gather tables (problem.BandedTable with every
    #: leaf stacked along dim 0 and mesh-sharded; indices shard-LOCAL with
    #: sentinel obs_per_shard / points_per_shard). Band classes and per-band
    #: row counts are unified across shards (shard_map needs one shape), so
    #: light shards pad with never-referenced dummy rows. Restores the
    #: 2-5x padded-gather win of the single-chip path (VERDICT r3 item 6).
    pt_banded: Optional[problem_mod.BandedTable] = None
    cam_banded: Optional[problem_mod.BandedTable] = None

    @property
    def tau2(self) -> float:
        return self.inlier_threshold * self.inlier_threshold

    @property
    def n_cameras(self) -> int:
        return self.state.n_cameras


def shard_problem(problem: problem_mod.BAProblem, mesh: Mesh) -> ShardedProblem:
    """Partition a BAProblem across ``mesh``'s first axis.

    Points are split into D contiguous chunks balanced by OBSERVATION count
    (observations are point-sorted, so each shard's observations are one
    contiguous slice); both are padded to static per-shard sizes; sharded
    arrays get NamedShardings so each device holds only its slice.

    Host cost at pod scale: profiled at D=64 on problem-21, >97% of wall
    time is XLA compiling the first-touch 64-way device_put programs
    (one-time per process, persistent-cached); the per-shard numpy table
    loops are ~0.5 s total — not worth vectorizing.
    """
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    pt_idx = np.asarray(problem.obs.pt_idx)
    cam_idx = np.asarray(problem.obs.cam_idx)
    meas = np.asarray(problem.obs.measurements)
    points = np.asarray(problem.state.points)
    m = problem.n_points
    k_total = len(pt_idx)
    lmax = problem.pt_obs_idx.shape[1]
    dtype = meas.dtype

    # Shard boundaries: balance by OBSERVATION count, not point count.
    # Observations dominate per-shard work and padding (every shard pads to
    # the max shard's K); equal-point contiguous chunks waste up to ~3x on
    # BAL degree skew (measured 2.75x at D=64 on problem-21), equal-obs
    # chunks keep the waste near 1x while points stay contiguous per shard.
    cum = np.cumsum(np.bincount(pt_idx, minlength=m))  # obs up to point i
    targets = (np.arange(1, d) * k_total) // d
    pt_bounds = np.searchsorted(cum, targets, side="left") + 1
    pt_starts = np.concatenate([[0], pt_bounds]).astype(np.int64)
    pt_ends = np.append(pt_starts[1:], m)
    ms = max(int((pt_ends - pt_starts).max()), 1)  # points per shard (padded)
    obs_starts = np.searchsorted(pt_idx, pt_starts)
    obs_ends = np.append(obs_starts[1:], k_total)
    ks = int((obs_ends - obs_starts).max()) if d > 0 else 0
    ks = max(ks, 1)

    cam_sh = np.zeros((d, ks), np.int32)
    ptl_sh = np.zeros((d, ks), np.int32)
    meas_sh = np.zeros((d, ks, 2), dtype)
    w_sh = np.zeros((d, ks), dtype)
    pts_sh = np.zeros((d, ms, 3), dtype)
    table_sh = np.full((d, ms, lmax), ks, np.int32)
    n_cams = problem.n_cameras
    cam_tables = []

    for s in range(d):
        lo, hi = obs_starts[s], obs_ends[s]
        nloc = hi - lo
        cam_sh[s, :nloc] = cam_idx[lo:hi]
        ptl_sh[s, :nloc] = pt_idx[lo:hi] - pt_starts[s]
        meas_sh[s, :nloc] = meas[lo:hi]
        w_sh[s, :nloc] = 1.0
        plo, phi = pt_starts[s], pt_ends[s]
        pts_sh[s, : phi - plo] = points[plo:phi]
        # Local per-point gather table from the local sorted pt indices.
        counts = np.bincount(ptl_sh[s, :nloc], minlength=ms)
        offs = np.zeros(ms, np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        ar = np.arange(nloc)
        pos = ar - offs[ptl_sh[s, :nloc]]
        table_sh[s, ptl_sh[s, :nloc], pos] = ar
        # Per-shard camera -> local-obs gather table (sentinel nloc -> ks,
        # the shard-local padded length whose gather row is zero).
        t = problem_mod._index_table(cam_sh[s, :nloc], n_cams)
        cam_tables.append(np.where(t == nloc, ks, t))
    lcam = max(max(t.shape[1] for t in cam_tables), 1)
    cam_table_sh = np.full((d, n_cams, lcam), ks, np.int32)
    cam_pt_sh = np.full((d, n_cams, lcam), ms, np.int32)
    for s_i, t in enumerate(cam_tables):
        cam_table_sh[s_i, :, : t.shape[1]] = t
        valid = t != ks
        lo = obs_starts[s_i]
        nloc = obs_ends[s_i] - lo
        pt_loc = pt_idx[lo : lo + nloc] - pt_starts[s_i]
        cam_pt_sh[s_i, :, : t.shape[1]][valid] = pt_loc[t[valid]]

    # Per-shard observation-pair tables (local indices, global camera keys),
    # padded to common shapes across shards; sentinels remapped to the
    # padded sizes (rows -> ks, points -> ms, key rows -> Rmax, keys -> KOmax).
    local_tables = []
    for s_i in range(d):
        lo, hi = obs_starts[s_i], obs_ends[s_i]
        nloc = hi - lo
        pt_loc = (pt_idx[lo:hi] - pt_starts[s_i]).astype(np.int64)
        tab = (
            problem_mod._pair_tables(pt_loc, cam_idx[lo:hi], n_cams)
            if nloc >= 2
            else None
        )
        local_tables.append((tab, nloc, int(pt_loc.max()) + 1 if nloc else 0))
    pairs_sh = None
    if any(t is not None for t, _, _ in local_tables):
        rmx = max((np.asarray(t.row_a).shape[0] for t, _, _ in local_tables
                   if t is not None), default=1)
        l_row = next(np.asarray(t.row_a).shape[1] for t, _, _ in local_tables
                     if t is not None)
        komx = max((np.asarray(t.key_table).shape[0] for t, _, _ in local_tables
                    if t is not None), default=1)
        ktw = max((np.asarray(t.key_table).shape[1] for t, _, _ in local_tables
                   if t is not None), default=1)
        ra = np.full((d, rmx, l_row), ks, np.int32)
        rb = np.full((d, rmx, l_row), ks, np.int32)
        rp = np.full((d, rmx, l_row), ms, np.int32)
        kt = np.full((d, komx, ktw), rmx, np.int32)
        k2o = np.full((d, n_cams * n_cams), komx, np.int32)
        for s_i, (t, nloc, npl) in enumerate(local_tables):
            if t is None:
                continue
            a = np.asarray(t.row_a)
            b = np.asarray(t.row_b)
            p = np.asarray(t.row_pt)
            ktab = np.asarray(t.key_table)
            r_s, ko_s = a.shape[0], ktab.shape[0]
            ra[s_i, :r_s] = np.where(a == nloc, ks, a)
            rb[s_i, :r_s] = np.where(b == nloc, ks, b)
            rp[s_i, :r_s] = np.where(p == npl, ms, p)
            kt[s_i, :ko_s, : ktab.shape[1]] = np.where(ktab == r_s, rmx, ktab)
            ko = np.asarray(t.key_to_obs)
            k2o[s_i] = np.where(ko == ko_s, komx, ko)
        pairs_sh = (ra, rb, kt, k2o, rp)

    def _shared_banded(idx_lists, n_segments, sentinel_to, aux_lists=None,
                       aux_sentinel=0):
        """Per-shard BandedTables with UNIFIED band classes and row counts.

        Every shard gets the same (classes, rows_per_band) so shard_map sees
        one leaf shape; per-shard tables are stacked along dim 0. Local obs
        sentinels (len of the local idx list) are remapped to ``sentinel_to``
        (the padded per-shard length, whose gather row is zero)."""
        union = set()
        for li in idx_lists:
            _, _, _, cls, _ = problem_mod._banded_table_np(li, n_segments)
            union.update(int(c) for c in cls)
        classes = np.array(sorted(union, reverse=True))[:4]
        rows = None
        for li in idx_lists:
            _, _, _, _, r = problem_mod._banded_table_np(
                li, n_segments, classes=classes
            )
            rows = r if rows is None else np.maximum(rows, r)
        tabs, unps, auxs = [], [], []
        for s_i, li in enumerate(idx_lists):
            av = None if aux_lists is None else aux_lists[s_i]
            t, u, a, _, _ = problem_mod._banded_table_np(
                li, n_segments, classes=classes, rows_per_band=rows,
                aux_values=av, aux_sentinel=aux_sentinel,
            )
            nloc = len(li)
            tabs.append([np.where(tb == nloc, sentinel_to, tb) for tb in t])
            unps.append(u)
            auxs.append(a)
        n_bands = len(classes)
        tables = tuple(
            put(np.concatenate([tabs[s][b] for s in range(d)], axis=0),
                P(axis))
            for b in range(n_bands)
        )
        unperm = put(np.concatenate(unps, axis=0), P(axis))
        aux = None
        if aux_lists is not None:
            aux = tuple(
                put(np.concatenate([auxs[s][b] for s in range(d)], axis=0),
                    P(axis))
                for b in range(n_bands)
            )
        return problem_mod.BandedTable(tables=tables, unperm=unperm, aux=aux)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    state = problem_mod.BAState(
        K=put(problem.state.K, P()),
        R=put(problem.state.R, P()),
        T=put(problem.state.T, P()),
        k1=put(problem.state.k1, P()),
        k2=put(problem.state.k2, P()),
        points=put(pts_sh.reshape(d * ms, 3), P(axis)),
    )
    obs = ShardedObservations(
        cam_idx=put(cam_sh.reshape(-1), P(axis)),
        pt_idx=put(ptl_sh.reshape(-1), P(axis)),
        measurements=put(meas_sh.reshape(-1, 2), P(axis)),
        weights=put(w_sh.reshape(-1), P(axis)),
    )
    pairs = None
    if pairs_sh is not None:
        ra, rb, kt, k2o, rp = pairs_sh
        pairs = problem_mod.PairTables(
            row_a=put(ra.reshape(d * ra.shape[1], -1), P(axis)),
            row_b=put(rb.reshape(d * rb.shape[1], -1), P(axis)),
            key_table=put(kt.reshape(d * kt.shape[1], -1), P(axis)),
            key_to_obs=put(k2o.reshape(-1), P(axis)),
            row_pt=put(rp.reshape(d * rp.shape[1], -1), P(axis)),
        )
    pt_locals = [ptl_sh[s, : obs_ends[s] - obs_starts[s]] for s in range(d)]
    cam_locals = [cam_sh[s, : obs_ends[s] - obs_starts[s]] for s in range(d)]
    pt_banded_sh = _shared_banded(pt_locals, ms, ks)
    cam_banded_sh = _shared_banded(
        cam_locals, n_cams, ks, aux_lists=pt_locals, aux_sentinel=ms
    )

    return ShardedProblem(
        state=state,
        obs=obs,
        pt_obs_idx=put(table_sh.reshape(d * ms, lmax), P(axis)),
        cam_obs_idx=put(cam_table_sh.reshape(d * n_cams, lcam), P(axis)),
        inlier_threshold=problem.inlier_threshold,
        avg_focal_length=problem.avg_focal_length,
        n_shards=d,
        obs_per_shard=ks,
        points_per_shard=ms,
        n_points_global=m,
        pt_starts=tuple(int(x) for x in pt_starts),
        obs_counts=put((obs_ends - obs_starts).astype(np.int32), P(axis)),
        pairs=pairs,
        cam_obs_pt=put(cam_pt_sh.reshape(d * n_cams, lcam), P(axis)),
        pt_banded=pt_banded_sh,
        cam_banded=cam_banded_sh,
    )


@dataclasses.dataclass(frozen=True)
class _LocalView:
    """Duck-types BAProblem for the schur.* kernels inside a shard_map body."""

    obs: ShardedObservations
    pt_obs_idx: jax.Array
    cam_obs_idx: jax.Array
    n_cameras: int
    n_points: int
    pairs: Optional[problem_mod.PairTables] = None
    cam_obs_pt: Optional[jax.Array] = None
    #: Shard-local degree-banded tables (same gather-bandwidth win as the
    #: single-chip path; VERDICT r3 item 6).
    pt_banded: Optional[problem_mod.BandedTable] = None
    cam_banded: Optional[problem_mod.BandedTable] = None


def _pmax(x, axis: str):
    """Cross-shard max expressed with ONLY a Sum all-reduce.

    The axon TPU AOT compiler lowers just AllReduce-Sum ("Supported lowering
    only of Sum all reduce" on lax.pmax, measured r3) — so the distributed
    prepare's lambda-init max rides a psum of a one-hot slot vector: shard i
    deposits its local max in slot i, every shard then reduces the gathered
    vector locally. Payload n_shards scalars; exact (no approximation)."""
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    slots = jnp.zeros((n,), x.dtype).at[i].set(x)
    return jnp.max(jax.lax.psum(slots, axis))


def _local_blocks(state_local, obs_local, tau2, compute_dtype=None):
    """Masked residuals+Jacobian on one shard: padding rows contribute zero."""
    blocks = jacobian_mod.residuals_and_jacobian(
        state_local, obs_local, tau2, compute_dtype=compute_dtype
    )
    w = obs_local.weights.astype(blocks.f.dtype)
    return jacobian_mod.JacobianBlocks(
        Jc=blocks.Jc * w[:, None, None],
        Jp=blocks.Jp * w[:, None, None],
        f=blocks.f * w[:, None],
    )


def make_sharded_kernels(
    sp: ShardedProblem, mesh: Mesh, mode: str, matmul_dtype=None,
    geometry=None, stack_f32: bool = False, gram_f64: bool = False,
):
    """Build (prepare, trial) LM kernels whose heavy math runs under shard_map.

    Returned kernels have the signatures lm.lm_loop expects; ``state`` is a
    BAState with replicated cameras and mesh-sharded points — or, with
    ``geometry='df32'``, a FastBAState with planar two-float points sharded
    along the component axis (the TPU performance drive, composed with the
    distributed Schur reduction; VERDICT round 1 item 4). The df32 kernels
    run the fused Pallas chain per shard (interpreted off-TPU), passing each
    shard's real-observation count as the kernel's valid-row scalar — shard
    padding is a suffix, so it masks exactly.
    """
    axis = mesh.axis_names[0]
    n = sp.n_cameras
    ms = sp.points_per_shard
    tau2 = sp.tau2
    mm = jnp.dtype(matmul_dtype) if matmul_dtype else None
    point_factor, camera_solver = schur.MODE_STRATEGY[mode]

    state_spec = problem_mod.BAState(
        K=P(), R=P(), T=P(), k1=P(), k2=P(), points=P(axis)
    )
    obs_spec = ShardedObservations(
        cam_idx=P(axis), pt_idx=P(axis), measurements=P(axis), weights=P(axis)
    )

    use_pairs = camera_solver == "chol" and sp.pairs is not None
    # Distributed qrkit (VERDICT r4 items 1-2): the Moré-cached camera
    # factorization in PAIR FORM. The B27 blocks are point-local, so each
    # shard builds its own pair tables of them; the lambda-free reduced
    # system S0 and each trial's re-damp correction psum exactly like the
    # chol Schur gram — ONE (9N)^2 psum riding ICI. This makes sharded
    # qrkit a genuinely distinct realization from sharded spqr (which
    # re-factors per trial through the all-gathered TSQR below).
    use_qr_pairs = camera_solver == "qr_cached" and sp.pairs is not None
    any_pairs = use_pairs or use_qr_pairs
    use_banded = sp.pt_banded is not None and sp.cam_banded is not None
    pairs_spec = (
        problem_mod.PairTables(
            row_a=P(axis), row_b=P(axis), key_table=P(axis),
            key_to_obs=P(axis), row_pt=P(axis),
        )
        if any_pairs
        else None
    )
    pt_banded_spec = cam_banded_spec = None
    if use_banded:
        pt_banded_spec = problem_mod.BandedTable(
            tables=tuple(P(axis) for _ in sp.pt_banded.tables),
            unperm=P(axis), aux=None,
        )
        cam_banded_spec = problem_mod.BandedTable(
            tables=tuple(P(axis) for _ in sp.cam_banded.tables),
            unperm=P(axis),
            aux=tuple(P(axis) for _ in sp.cam_banded.aux),
        )

    def local_view(obs_local, table_local, cam_table_local,
                   pairs_local=None, cam_pt_local=None,
                   pt_banded_local=None, cam_banded_local=None):
        return _LocalView(
            obs=obs_local,
            pt_obs_idx=table_local,
            cam_obs_idx=cam_table_local,
            n_cameras=n,
            n_points=ms,
            pairs=pairs_local,
            cam_obs_pt=cam_pt_local,
            pt_banded=pt_banded_local,
            cam_banded=cam_banded_local,
        )

    # ---- prepare: J blocks + context; U/g_cams all-reduced, rest local. ----
    def prepare_body(state, obs_local, table_local, cam_table_local,
                     pairs_local=None, cam_pt_local=None,
                     pt_banded_local=None, cam_banded_local=None):
        state_local = state  # cameras replicated, points already local
        blocks = _local_blocks(state_local, obs_local, tau2, compute_dtype=mm)
        acc = projection.accumulation_dtype(blocks.f.dtype)
        energy = jax.lax.psum(jnp.sum(blocks.f * blocks.f, dtype=acc), axis)
        ctx = schur.build_context(
            blocks,
            local_view(obs_local, table_local, cam_table_local,
                       pairs_local, cam_pt_local,
                       pt_banded_local, cam_banded_local),
            mode,
            mm_dtype=mm,
            stack_f32=stack_f32,
            gram_f64=gram_f64,
            cached_camera=use_qr_pairs,
            force_qr_pair=use_qr_pairs,
            s0_partial=use_qr_pairs,
        )
        ctx = _finish_prepare(ctx)
        lam0 = schur.initial_lambda(ctx, mode).astype(energy.dtype)
        return ctx, energy, lam0

    def _finish_prepare(ctx):
        """psum the replicated context pieces; assemble the global qrkit
        lambda-free reduced system from the shards' partial sums."""
        U = jax.lax.psum(ctx.U, axis)
        g_cams = jax.lax.psum(ctx.g_cams, axis)
        max_colnorm_sq = jnp.maximum(
            jnp.max(jnp.diagonal(U, axis1=-2, axis2=-1)),
            _pmax(jnp.max(jnp.diagonal(ctx.V, axis1=-2, axis2=-1)), axis),
        )
        repl = dict(U=U, g_cams=g_cams, max_colnorm_sq=max_colnorm_sq)
        if use_qr_pairs:
            sdt = ctx.qr_S0cam.dtype
            S04 = jax.lax.psum(ctx.qr_S0cam, axis).reshape(n, 9, n, 9)
            arn = jnp.arange(n)
            S04 = S04.at[arn, :, arn, :].add(U.astype(sdt))
            repl["qr_S0cam"] = S04.reshape(9 * n, 9 * n)
            repl["qr_b0"] = g_cams.reshape(-1).astype(sdt) + jax.lax.psum(
                ctx.qr_b0, axis
            )
        return dataclasses.replace(ctx, **repl)

    want_eig = point_factor == "eig" or use_pairs
    # Stacked camera rows only feed the TSQR path (spqr; qrkit falls back
    # to it only when the problem carries no pair tables).
    want_cam_stacks = camera_solver == "qr_full" or (
        camera_solver == "qr_cached" and not use_qr_pairs
    )
    ctx_spec = schur.SchurContext(
        U=P(),
        V=P(axis),
        W=P(axis),
        g_cams=P(),
        g_pts=P(axis),
        max_colnorm_sq=P(),
        Jp_stacked=P(axis) if point_factor == "qr" else None,
        Jc_stacked=P(axis) if want_cam_stacks else None,
        rhs_stacked=P(axis) if want_cam_stacks else None,
        evecs=P(axis) if want_eig else None,
        evals=P(axis) if want_eig else None,
        WQ=P(axis) if (point_factor == "eig" and not use_pairs) else None,
        y0=P(axis) if want_eig else None,
        pairA=P(None, axis) if any_pairs else None,
        pairB=P(None, axis) if any_pairs else None,
        diagG=(
            tuple(P(None, axis) for _ in sp.cam_banded.tables)
            if (any_pairs and use_banded)
            else (P(None, axis) if any_pairs else None)
        ),
        row_pt=P(axis) if any_pairs else None,
        cam_pt=(
            tuple(P(axis) for _ in sp.cam_banded.aux)
            if (any_pairs and use_banded)
            else (P(axis) if any_pairs else None)
        ),
        cam_unperm=P(axis) if (any_pairs and use_banded) else None,
        fill_evals=P(axis) if use_qr_pairs else None,
        qr_cqT=P(None, axis) if use_qr_pairs else None,
        qr_S0cam=P() if use_qr_pairs else None,
        qr_b0=P() if use_qr_pairs else None,
    )

    # Optional shard_map args ride in FIXED positions (None + None spec when
    # a feature is off) so positional binding never shifts between modes.
    prepare_in = (
        state_spec, obs_spec, P(axis), P(axis),
        pairs_spec, P(axis) if any_pairs else None,
        pt_banded_spec, cam_banded_spec,
    )
    prepare_sm = shard_map(
        prepare_body,
        mesh=mesh,
        in_specs=prepare_in,
        out_specs=(ctx_spec, P(), P()),
        check_vma=False,
    )

    def _prepare_opt_args():
        return (
            sp.pairs if any_pairs else None,
            sp.cam_obs_pt if any_pairs else None,
            sp.pt_banded if use_banded else None,
            sp.cam_banded if use_banded else None,
        )

    def _trial_opt_args():
        return (
            sp.pairs if any_pairs else None,
            sp.pt_banded if use_banded else None,
        )

    # ---- trial: local factors, psum'd reduced system, local back-sub. ----
    def _solve_sharded(ctx, lam, obs_local, table_local, cam_table_local,
                       pairs_local=None, pt_banded_local=None):
        """Distributed damped solve -> (dxp local, dxc replicated)."""
        dtype = ctx.U.dtype
        lam = jnp.asarray(lam, dtype)
        view = local_view(obs_local, table_local, cam_table_local,
                          pt_banded_local=pt_banded_local)
        cam_idx, pt_idx = obs_local.cam_idx, obs_local.pt_idx

        if use_pairs:
            # Cached pair gram per shard; ONE psum forms the global reduced
            # system (the distributed Schur reduction riding ICI), solved
            # redundantly on every device.
            S_sum, b_sum = schur._pair_gram_cached(
                ctx, lam, pairs_local, n, mm or dtype
            )
            S_sum = jax.lax.psum(S_sum, axis)
            b_sum = jax.lax.psum(b_sum, axis)
            S, b = schur.assemble_reduced(S_sum, b_sum, ctx, lam, n)
            dxc = schur._camera_solve_chol(S, b).reshape(n, 9)
            t = ctx.g_pts - schur.point_coupling_sum(ctx.W, dxc, cam_idx, view)
            if point_factor == "eig":
                winv = 1.0 / (ctx.evals + lam)
                dxp = jnp.einsum(
                    "mij,mj->mi", ctx.evecs,
                    winv * jnp.einsum("mji,mj->mi", ctx.evecs, t),
                )
            else:
                Linv = schur._point_factor_inv(ctx, lam, mode, dtype)
                y2 = jnp.einsum("mij,mj->mi", Linv, t)
                dxp = jnp.einsum("mji,mj->mi", Linv, y2)
        elif point_factor == "eig":
            winv = 1.0 / (ctx.evals + lam)
            S_sum, b_sum = schur._schur_gram_chunked(
                ctx.WQ, winv, ctx.y0, cam_idx, table_local, n, mm or dtype
            )
            S = -jax.lax.psum(S_sum.astype(dtype), axis)
            b = ctx.g_cams.reshape(-1) - jax.lax.psum(b_sum.astype(dtype), axis)
            S4 = S.reshape(n, 9, n, 9)
            ar = jnp.arange(n)
            S4 = S4.at[ar, :, ar, :].add(ctx.U + lam * jnp.eye(9, dtype=dtype))
            S = S4.reshape(9 * n, 9 * n)
            dxc = schur._camera_solve_chol(S, b).reshape(n, 9)
            t = ctx.g_pts - schur.point_coupling_sum(ctx.W, dxc, cam_idx, view)
            dxp = jnp.einsum(
                "mij,mj->mi",
                ctx.evecs,
                winv * jnp.einsum("mji,mj->mi", ctx.evecs, t),
            )
        elif use_qr_pairs:
            # Distributed Moré-cached qrkit: local weighted pair gram of the
            # cached B27 re-damp rows, ONE psum of the (9N)^2 correction,
            # replicated solve against the cached lambda-free S0 — the
            # factor-once/re-damp-cheap camera stage (BAFunctor.h:98-102,
            # BacktrackLevMarqMore.h:287-328) under shard_map.
            S_sum, b_sum = schur.qrkit_pair_trial_sums(ctx, lam, pairs_local, n)
            S_sum = jax.lax.psum(S_sum, axis)
            b_sum = jax.lax.psum(b_sum, axis)
            n9 = 9 * n
            Scam = (
                ctx.qr_S0cam
                + S_sum.astype(dtype)
                + lam * jnp.eye(n9, dtype=dtype)
            )
            b = ctx.qr_b0 + b_sum.reshape(-1).astype(dtype)
            dxc = schur._camera_solve_chol(Scam, b).reshape(n, 9)
            t = ctx.g_pts - schur.point_coupling_sum(ctx.W, dxc, cam_idx, view)
            Linv = schur._point_factor_inv(ctx, lam, mode, dtype)
            y2 = jnp.einsum("mij,mj->mi", Linv, t)
            dxp = jnp.einsum("mji,mj->mi", Linv, y2)
        else:
            Linv = schur._point_factor_inv(ctx, lam, mode, dtype)
            if camera_solver == "chol":
                C = jnp.einsum("kij,kcj->kic", ctx.W, Linv[pt_idx])
                y = jnp.einsum("mij,mj->mi", Linv, ctx.g_pts)
                S_sum, b_sum = schur._schur_gram_chunked(
                    C, None, y, cam_idx, table_local, n, mm or dtype
                )
                S = -jax.lax.psum(S_sum.astype(dtype), axis)
                b = ctx.g_cams.reshape(-1) - jax.lax.psum(
                    b_sum.astype(dtype), axis
                )
                S4 = S.reshape(n, 9, n, 9)
                ar = jnp.arange(n)
                S4 = S4.at[ar, :, ar, :].add(
                    ctx.U + lam * jnp.eye(9, dtype=dtype)
                )
                S = S4.reshape(9 * n, 9 * n)
                dxc = schur._camera_solve_chol(S, b).reshape(n, 9)
            else:
                # Distributed TSQR: local chunked reduction, all-gather the
                # per-shard R factors, reduce replicated.
                R_local = schur.camera_tsqr_reduce(
                    ctx, lam, view, Linv, mm_dtype=mm
                )
                R_all = jax.lax.all_gather(R_local, axis)  # (D, ncols, ncols)
                R_stack = R_all.reshape(-1, R_local.shape[-1])
                R_comb = jnp.linalg.qr(R_stack, mode="r")
                dxc = schur.finish_camera_qr(R_comb, lam, n).reshape(n, 9)
            t = ctx.g_pts - schur.point_coupling_sum(ctx.W, dxc, cam_idx, view)
            y2 = jnp.einsum("mij,mj->mi", Linv, t)
            dxp = jnp.einsum("mji,mj->mi", Linv, y2)
        return dxp, dxc

    def _rho_scale(ctx, lam, dxp, dxc):
        # f32 arrays sum in f32 (both rho-denominator terms are positive for
        # a descent step — no cancellation; a dtype=f64 reduce over M-sized
        # f32 data would hit the emulated-f64 TPU path), then the psum'd
        # scalars are combined in the accumulation dtype.
        acc = projection.accumulation_dtype(ctx.U.dtype)
        sd = ctx.U.dtype if ctx.U.dtype != jnp.float64 else acc
        jtres_dot = jnp.sum(dxc * ctx.g_cams, dtype=sd).astype(acc) + jax.lax.psum(
            jnp.sum(dxp * ctx.g_pts, dtype=sd), axis
        ).astype(acc)
        dx_norm2 = jnp.sum(dxc * dxc, dtype=sd).astype(acc) + jax.lax.psum(
            jnp.sum(dxp * dxp, dtype=sd), axis
        ).astype(acc)
        return jnp.asarray(lam, acc) * dx_norm2 + jtres_dot

    def trial_body(ctx, state, lam, obs_local, table_local, cam_table_local,
                   pairs_local=None, pt_banded_local=None):
        dtype = ctx.U.dtype
        dxp, dxc = _solve_sharded(
            ctx, lam, obs_local, table_local, cam_table_local, pairs_local,
            pt_banded_local,
        )
        x_test = problem_mod.apply_step(state, dxp, dxc)
        acc = projection.accumulation_dtype(dtype)
        e_test = jax.lax.psum(
            jnp.sum(
                (_local_blocks(x_test, obs_local, tau2, compute_dtype=mm).f) ** 2,
                dtype=acc,
            ),
            axis,
        )
        return x_test, e_test, _rho_scale(ctx, lam, dxp, dxc)

    trial_in = (
        ctx_spec, state_spec, P(), obs_spec, P(axis), P(axis),
        pairs_spec, pt_banded_spec,
    )
    trial_sm = shard_map(
        trial_body,
        mesh=mesh,
        in_specs=trial_in,
        out_specs=(state_spec, P(), P()),
        check_vma=False,
    )

    if geometry == "df32":
        from bundleadjustment_benchmarks_tpu.ops import pallas_chain
        from bundleadjustment_benchmarks_tpu.ops import twofloat as tf

        fast_spec = problem_mod.FastBAState(
            K=P(), R=P(), T=P(), k1=P(), k2=P(),
            points=tf.DF(hi=P(None, axis), lo=P(None, axis)),
        )

        def fast_prepare_body(fast, obs_local, table_local, cam_table_local,
                              kloc, pairs_local=None, cam_pt_local=None,
                              pt_banded_local=None, cam_banded_local=None):
            blocks, energy = pallas_chain.fused_blocks_energy(
                fast, obs_local, tau2, valid_count=kloc[0]
            )
            energy = jax.lax.psum(energy, axis)
            ctx = schur.build_context(
                blocks,
                local_view(obs_local, table_local, cam_table_local,
                           pairs_local, cam_pt_local,
                           pt_banded_local, cam_banded_local),
                mode,
                mm_dtype=mm,
                stack_f32=stack_f32,
                gram_f64=gram_f64,
                cached_camera=use_qr_pairs,
                force_qr_pair=use_qr_pairs,
                s0_partial=use_qr_pairs,
            )
            ctx = _finish_prepare(ctx)
            lam0 = schur.initial_lambda(ctx, mode).astype(energy.dtype)
            return ctx, energy, lam0

        def fast_trial_body(ctx, fast, lam, obs_local, table_local,
                            cam_table_local, kloc, pairs_local=None,
                            pt_banded_local=None):
            dxp, dxc = _solve_sharded(
                ctx, jnp.asarray(lam, jnp.float32), obs_local, table_local,
                cam_table_local, pairs_local, pt_banded_local,
            )
            x_test = problem_mod.apply_step_fast(fast, dxp, dxc)
            e_test = jax.lax.psum(
                pallas_chain.fused_energy(
                    x_test, obs_local, tau2, valid_count=kloc[0]
                ),
                axis,
            )
            return x_test, e_test, _rho_scale(ctx, lam, dxp, dxc)

        fprep_in = (
            fast_spec, obs_spec, P(axis), P(axis), P(axis),
            pairs_spec, P(axis) if any_pairs else None,
            pt_banded_spec, cam_banded_spec,
        )
        ftrial_in = (
            ctx_spec, fast_spec, P(), obs_spec, P(axis), P(axis), P(axis),
            pairs_spec, pt_banded_spec,
        )
        fast_prepare_sm = shard_map(
            fast_prepare_body, mesh=mesh, in_specs=fprep_in,
            out_specs=(ctx_spec, P(), P()), check_vma=False,
        )
        fast_trial_sm = shard_map(
            fast_trial_body, mesh=mesh, in_specs=ftrial_in,
            out_specs=(fast_spec, P(), P()), check_vma=False,
        )

        def prepare_fast(fast):
            return fast_prepare_sm(
                fast, sp.obs, sp.pt_obs_idx, sp.cam_obs_idx, sp.obs_counts,
                *_prepare_opt_args(),
            )

        def trial_fast(ctx, fast, lam):
            return fast_trial_sm(
                ctx, fast, jnp.asarray(lam), sp.obs, sp.pt_obs_idx,
                sp.cam_obs_idx, sp.obs_counts, *_trial_opt_args(),
            )

        return prepare_fast, trial_fast

    def prepare(state):
        return prepare_sm(
            state, sp.obs, sp.pt_obs_idx, sp.cam_obs_idx,
            *_prepare_opt_args(),
        )

    def trial(ctx, state, lam):
        return trial_sm(
            ctx, state, jnp.asarray(lam), sp.obs, sp.pt_obs_idx,
            sp.cam_obs_idx, *_trial_opt_args(),
        )

    return prepare, trial


def minimize_sharded(
    sp: ShardedProblem,
    mesh: Mesh,
    mode: str = "cholesky",
    config: Optional[lm_mod.LMConfig] = None,
    resume=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 0,
    metrics_path: Optional[str] = None,
    metrics_phase: Optional[str] = None,
) -> lm_mod.LMResult:
    """Distributed LM: same control flow as lm.minimize, sharded kernels.

    Observability (VERDICT r3 item 7): ``checkpoint_path``/``metrics_path``/
    ``resume`` are supported by routing the drive through the host loop
    (per-trial dispatches; the coordinator process writes host-side).
    Checkpoints store the UNSHARDED full state (layout-independent: a run
    checkpointed at D shards resumes at any shard count or single-chip —
    re-shard the problem from the loaded state and pass the meta as
    ``resume``). ``config.polish_iters`` runs the same two-phase
    fast-then-f64-polish drive as lm.minimize, distributed in both phases.
    """
    config = config or lm_mod.LMConfig()

    if config.polish_iters and (config.geometry or config.matmul_dtype):
        import dataclasses as _dc

        fast_cfg = _dc.replace(
            config, polish_iters=0,
            tol_fun=max(config.tol_fun, config.polish_fast_tol))
        fast_res = minimize_sharded(
            sp, mesh, mode=mode, config=fast_cfg, resume=resume,
            checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
            metrics_path=metrics_path, metrics_phase="fast",
        )
        polish_cfg = _dc.replace(
            config, polish_iters=0, geometry=None, matmul_dtype=None,
            pallas=False, max_iter=config.polish_iters,
        )
        sp_polish = _dc.replace(sp, state=fast_res.state)
        polish_res = minimize_sharded(
            sp_polish, mesh, mode=mode, config=polish_cfg,
            checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
            metrics_path=metrics_path, metrics_phase="polish",
        )
        import math as _math

        if not _math.isfinite(polish_res.energy):
            # Same fallback as lm.minimize: the f64 polish cannot evaluate
            # the df32 endpoint (non-finite energy) — keep the fast result.
            return fast_res._replace(
                iterations=fast_res.iterations + polish_res.iterations,
                fun_evals=fast_res.fun_evals + polish_res.fun_evals,
            )
        status = (fast_res.status
                  if polish_res.status == lm_mod.LMStatus.MaxItersReached
                  else polish_res.status)
        return polish_res._replace(
            iterations=fast_res.iterations + polish_res.iterations,
            fun_evals=fast_res.fun_evals + polish_res.fun_evals,
            status=status,
        )

    prepare, trial = make_sharded_kernels(
        sp, mesh, mode, matmul_dtype=config.matmul_dtype,
        geometry=config.geometry,
        stack_f32=config.stack_f32, gram_f64=config.gram_f64,
    )
    fast = config.geometry == "df32"
    state0 = problem_mod.to_fast(sp.state) if fast else sp.state
    dtype = sp.state.T.dtype

    def finish(x):
        return problem_mod.from_fast(x, dtype=dtype) if fast else x

    def checkpoint_convert(x):
        full = finish(x)
        return dataclasses.replace(full, points=unshard_points(sp, full))

    observed = bool(checkpoint_path or metrics_path or resume)
    if config.drive == "host" or observed:
        prepare_j = jax.jit(prepare)
        trial_j = jax.jit(trial)
        res = lm_mod.host_loop(
            state0, prepare_j, trial_j, config, resume=resume,
            checkpoint_every=checkpoint_every,
            checkpoint_path=checkpoint_path, metrics_path=metrics_path,
            metrics_phase=metrics_phase,
            checkpoint_convert=checkpoint_convert,
        )
        return res._replace(state=finish(res.state))

    @jax.jit
    def run(s0):
        return lm_mod.lm_loop(s0, prepare, trial, config, dtype)

    final = run(state0)
    final = final._replace(x=finish(final.x))
    return lm_mod.LMResult(
        state=final.x,
        status=lm_mod.LMStatus(int(final.status)),
        iterations=int(final.it),
        fun_evals=int(final.fun_evals),
        energy=float(final.energy),
        lam=float(final.lam),
    )


def unshard_points(sp: ShardedProblem, state: problem_mod.BAState) -> jax.Array:
    """Recover the (M, 3) global point array from a sharded state.

    Shards hold uneven contiguous point chunks (obs-balanced split) padded
    to points_per_shard; concatenate each shard's real slice."""
    ms = sp.points_per_shard
    starts = list(sp.pt_starts) or [0]
    ends = starts[1:] + [sp.n_points_global]
    pts = state.points
    return jnp.concatenate(
        [pts[s * ms : s * ms + (e - b)] for s, (b, e) in enumerate(zip(starts, ends))]
    )
