"""Fused Pallas TPU kernels for the per-observation BA chain.

WHY: the df32 planar chain (ops/jacobian.planar_blocks_chain) is ~250 f32
element-wise ops over (K,)-shaped rows. As individual XLA HLOs each op pays
fixed launch/relayout overhead; at BAL sizes (K ~ 4e4-3e5) the chain is
overhead-bound, not FLOP-bound — measured 6.8 ms for the Jacobian chain and
5.2 ms for the trial energy on problem-21 (v5e-class chip), against a
microsecond-scale FLOP floor. One Pallas kernel runs the whole chain over
(sublane, lane) tiles in VMEM: a single launch, one HBM read of the gathered
operands, one HBM write of the outputs.

The math is NOT duplicated here: the kernels call the exact same
planar_blocks_chain / planar_energy_df used by the XLA fallback path, with
tiles where the fallback has (K,) rows. Two-float (df32) arithmetic works
unchanged inside the kernel — Dekker two_prod/two_sum are plain mul/add/sub
sequences (ops/twofloat.py); kernel-vs-fallback equality is asserted by
tests/test_pallas_chain.py to ~1 ulp.

Layout: operands arrive planar (component, K) f32 — camg (27, K) camera
components gathered per observation, ptsg (6, K) two-float points, meas
(2, K) — padded to a lane-tile multiple and viewed as (C, K/128, 128); each
grid step processes a (C, SUBLANES, 128) block, so every component is a full
(SUBLANES, 128) VPU tile. The energy is accumulated across grid steps into a
persistent (SUBLANES, 128) two-float accumulator block (TPU grids execute
sequentially, so read-modify-write accumulation over a fixed output block is
the canonical reduction pattern), then tree-summed XLA-side.

Reference semantics covered (same citations as the fallback):
  * residual/Jacobian chain: BAFunctor.h:126-261
  * robust psi scaling: BAFunctor.h:147-178
  * world->camera transform: CameraMatrix.cpp:259-261
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bundleadjustment_benchmarks_tpu.ops import jacobian, projection
from bundleadjustment_benchmarks_tpu.ops import twofloat as tf

LANES = 128
SUBLANES = 32
TILE = SUBLANES * LANES


def _tiled(x, kpad):
    """(C, K) f32 -> (C, kpad/LANES, LANES), zero-padded (row-major reshape)."""
    c, k = x.shape
    if kpad != k:
        x = jnp.pad(x, ((0, 0), (0, kpad - k)))
    return x.reshape(c, kpad // LANES, LANES)


def _valid_mask(step, k_total):
    """(SUBLANES, LANES) bool: which slots of this grid step are real obs."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
    idx = step * TILE + sub * LANES + lane
    return idx < k_total


def _accumulate_energy(step, v: tf.DF, valid, ehi_ref, elo_ref):
    """Two-float accumulation of per-slot energy into the persistent block."""

    @pl.when(step == 0)
    def _():
        ehi_ref[...] = jnp.zeros_like(ehi_ref)
        elo_ref[...] = jnp.zeros_like(elo_ref)

    zero = jnp.zeros_like(v.hi)
    vm = tf.DF(jnp.where(valid, v.hi, zero), jnp.where(valid, v.lo, zero))
    acc = tf.add(tf.DF(ehi_ref[...], elo_ref[...]), vm)
    ehi_ref[...] = acc.hi
    elo_ref[...] = acc.lo


def _blocks_kernel(k_ref, tau2_ref, camg_ref, ptsg_ref, meas_ref,
                   out_ref, ehi_ref, elo_ref):
    step = pl.program_id(0)
    camg = camg_ref[...]  # (27, SUBLANES, LANES)
    ptsg = ptsg_ref[...]  # (6, SUBLANES, LANES)
    rows = jacobian.planar_blocks_chain(
        camg, ptsg, meas_ref[0], meas_ref[1], tau2_ref[0]
    )
    for r, comp in enumerate(rows):
        out_ref[r] = comp
    # Energy: sum over valid slots of f0^2 + f1^2 (exact products, DF acc).
    v = tf.add(tf.prod_ff(rows[0], rows[0]), tf.prod_ff(rows[1], rows[1]))
    _accumulate_energy(step, v, _valid_mask(step, k_ref[0]), ehi_ref, elo_ref)


def _energy_kernel(k_ref, tau2_ref, camg_ref, ptsg_ref, meas_ref,
                   ehi_ref, elo_ref):
    step = pl.program_id(0)
    camg = camg_ref[...]
    _, XX = projection.planar_transform_df(camg, ptsg_ref[...])
    v = projection.planar_energy_df(
        camg, XX, meas_ref[0], meas_ref[1], tau2_ref[0]
    )
    _accumulate_energy(step, v, _valid_mask(step, k_ref[0]), ehi_ref, elo_ref)


def _tiled_operands(fast, obs):
    """(camg_t (27, St, 128), ptsg_t (6, St, 128), meas_t (2, St, 128), k).

    Preferred path: gather straight into the kernel's tiled shape via the
    load-time (St, 128) index maps (BAObservations.cam_idx_t) — XLA emits
    ONE gather per operand with a natively tiled output. Fallback (problems
    without the tiled fields, e.g. sharded local views): planar gather +
    pad + reshape, which costs a relayout copy per planar row.
    """
    cam = projection.planar_camera_pack(fast)  # (27, N)
    pts = jnp.concatenate([fast.points.hi, fast.points.lo], axis=0)  # (6, M)
    k = obs.cam_idx.shape[0]
    cam_t = getattr(obs, "cam_idx_t", None)
    if cam_t is not None:
        return cam[:, cam_t], pts[:, obs.pt_idx_t], obs.meas_t, k
    kpad = -(-k // TILE) * TILE
    camg_t = _tiled(cam[:, obs.cam_idx], kpad)
    ptsg_t = _tiled(pts[:, obs.pt_idx], kpad)
    meas_t = _tiled(_meas_planar(obs), kpad)
    return camg_t, ptsg_t, meas_t, k


def _chain_call(kernel, n_out_rows, camg_t, ptsg_t, meas_t, k, tau2, interpret,
                valid_count=None):
    """Shared pallas_call plumbing for the chain kernels.

    ``valid_count``: optional traced scalar overriding the static ``k`` in
    the kernel's energy mask — the sharded path passes each shard's real
    observation count so its padding suffix contributes zero energy (shapes
    and output slicing still use the static k)."""
    if interpret is None:
        interpret = not available()  # CPU tests run the same kernels interpreted
    st = camg_t.shape[1]
    assert st % SUBLANES == 0, st
    grid = st // SUBLANES
    kpad = st * LANES
    k_arr = jnp.full((1,), k if valid_count is None else valid_count, jnp.int32)
    tau2_arr = jnp.full((1,), tau2, jnp.float32)

    # Index maps must return int32 under jax_enable_x64: Mosaic cannot
    # legalize an i64-returning index-map func.return on this stack. (A
    # concrete numpy scalar — index maps may not capture traced constants.)
    zero = np.int32(0)

    def block(c):
        return pl.BlockSpec(
            (c, SUBLANES, LANES),
            lambda i: (zero, jnp.asarray(i, jnp.int32), zero),
            memory_space=pltpu.VMEM,
        )

    acc_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda i: (zero, zero), memory_space=pltpu.VMEM
    )
    acc_shape = jax.ShapeDtypeStruct((SUBLANES, LANES), jnp.float32)
    out_specs = [acc_spec, acc_spec]
    out_shapes = [acc_shape, acc_shape]
    if n_out_rows:
        out_specs.insert(0, block(n_out_rows))
        out_shapes.insert(
            0, jax.ShapeDtypeStruct((n_out_rows, kpad // LANES, LANES), jnp.float32)
        )
    res = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (zero,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (zero,), memory_space=pltpu.SMEM),
            block(camg_t.shape[0]),
            block(ptsg_t.shape[0]),
            block(2),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(k_arr, tau2_arr, camg_t, ptsg_t, meas_t)
    if n_out_rows:
        out, ehi, elo = res
        out = out.reshape(n_out_rows, kpad)[:, :k]
    else:
        out = None
        ehi, elo = res
    energy = tf.sum_df(tf.DF(ehi, elo))
    acc = projection.accumulation_dtype(jnp.float32)
    energy = tf.to_f64(energy) if acc == jnp.float64 else tf.to_f32(energy)
    return out, energy


def _meas_planar(obs):
    """(2, K) f32 planar measurements — precomputed at load when available
    (per-trial column-slice relayouts of (K, 2) are not hoisted by XLA)."""
    mp = getattr(obs, "measurements_pl", None)
    if mp is not None:
        return mp
    return obs.measurements.astype(jnp.float32).T


def fused_blocks_energy(fast, obs, tau2, interpret=None, valid_count=None):
    """One fused kernel pass: robustified residuals, Jacobian blocks, energy.

    Drop-in for (jacobian.residuals_and_jacobian_fast +
    projection.compensated_square_sum) — returns (JacobianBlocks, energy).
    """
    camg_t, ptsg_t, meas_t, k = _tiled_operands(fast, obs)
    out, energy = _chain_call(
        _blocks_kernel, jacobian.PLANAR_CHAIN_ROWS,
        camg_t, ptsg_t, meas_t, k, tau2, interpret, valid_count=valid_count,
    )
    return jacobian.blocks_from_planar_rows(out), energy


def fused_energy(fast, obs, tau2, interpret=None, valid_count=None):
    """One fused kernel pass for the trial objective (drop-in for
    projection.energy_fast)."""
    camg_t, ptsg_t, meas_t, k = _tiled_operands(fast, obs)
    _, energy = _chain_call(
        _energy_kernel, 0, camg_t, ptsg_t, meas_t, k, tau2, interpret,
        valid_count=valid_count,
    )
    return energy


@functools.lru_cache(maxsize=1)
def available() -> bool:
    """True when the default backend can run these kernels compiled."""
    return jax.default_backend() == "tpu"
