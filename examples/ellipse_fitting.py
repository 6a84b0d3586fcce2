"""Ellipse fitting: the reference's missing LM smoke example, TPU-native.

The reference build declares an Ellipse_Fitting_Test target whose source is
absent from the repo (src/CMakeLists.txt:180-186); the LM headers cite
examples/ellipse_fitting.cpp (BacktrackLevMarqCholesky.h:8,94) as the
canonical small dense usage example of the backtracking LM driver. This
module restores that example: fit center/axes/rotation of an ellipse to
noisy 2D samples with the SAME kernel-parameterized lm_loop/host_loop the BA
solver uses — demonstrating the driver is problem-agnostic.

Parameterization: x = (cx, cy, a, b, phi); residual per sample point the
algebraic distance of the rotated/translated sample from the unit circle.
Jacobian via jax.jacfwd (no analytic chain needed at this size).

Run:  python examples/ellipse_fitting.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.solvers import lm


def ellipse_residuals(params, samples):
    """Algebraic residuals: |R(-phi) (p - c)| scaled by axes, minus 1."""
    cx, cy, a, b, phi = params
    d = samples - jnp.stack([cx, cy])
    c, s = jnp.cos(phi), jnp.sin(phi)
    u = (c * d[:, 0] + s * d[:, 1]) / a
    v = (-s * d[:, 0] + c * d[:, 1]) / b
    return jnp.sqrt(u * u + v * v + 1e-12) - 1.0


def make_kernels(samples):
    """(prepare, trial) LM kernels for the dense ellipse problem."""

    def prepare(x):
        r = ellipse_residuals(x, samples)
        J = jax.jacfwd(ellipse_residuals)(x, samples)
        energy = jnp.sum(r * r)
        jtres = -J.T @ r
        jtj = J.T @ J
        lam0 = 1e-12 * jnp.max(jnp.diagonal(jtj))  # cholesky-driver rule
        return (jtj, jtres), energy, lam0

    def trial(ctx, x, lam):
        jtj, jtres = ctx
        A = jtj + lam * jnp.eye(jtj.shape[0], dtype=jtj.dtype)
        Q, R = jnp.linalg.qr(A)
        dx = jax.scipy.linalg.solve_triangular(R, Q.T @ jtres, lower=False)
        x_test = x + dx
        r = ellipse_residuals(x_test, samples)
        e_test = jnp.sum(r * r)
        rho_scale = dx @ (lam * dx + jtres)
        return x_test, e_test, rho_scale

    return prepare, trial


def fit_ellipse(samples, x0=None, config=None):
    """Fit an ellipse with the shared backtracking LM driver."""
    samples = jnp.asarray(samples)
    if x0 is None:
        c = jnp.mean(samples, axis=0)
        r = jnp.std(samples, axis=0) * jnp.sqrt(2.0)
        x0 = jnp.concatenate([c, r, jnp.zeros((1,), samples.dtype)])
    config = config or lm.LMConfig(drive="host", max_iter=100)
    prepare, trial = make_kernels(samples)
    return lm.host_loop(
        x0, jax.jit(prepare), jax.jit(trial), config
    )


def sample_ellipse(n=200, center=(1.0, -2.0), axes=(3.0, 1.5), phi=0.6,
                   noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 2 * np.pi, n)
    c, s = np.cos(phi), np.sin(phi)
    x = axes[0] * np.cos(t)
    y = axes[1] * np.sin(t)
    pts = np.stack(
        [center[0] + c * x - s * y, center[1] + s * x + c * y], axis=1
    )
    return pts + rng.normal(scale=noise, size=pts.shape)


def main():
    samples = sample_ellipse()
    result = fit_ellipse(samples)
    cx, cy, a, b, phi = np.asarray(result.state)
    print(f"status: {lm.STATUS_STRINGS[result.status]}")
    print(f"iterations: {result.iterations}  funEvals: {result.fun_evals}")
    print(f"center=({cx:.4f}, {cy:.4f}) axes=({a:.4f}, {b:.4f}) phi={phi:.4f}")
    print(f"final energy: {result.energy:.6g}")


if __name__ == "__main__":
    main()
