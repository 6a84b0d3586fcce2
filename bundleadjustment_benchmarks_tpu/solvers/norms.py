"""estimateNorm: the diag-scaled state norm used by the external fork's driver.

Reimplements BAFunctor::estimateNorm (/root/reference/src/Optimization/
BAFunctor.cpp:25-61): given a diagonal scaling vector (the fork's
BacktrackLevMarq passes column-norm scalings), compute

    total = ( sum over cameras of
                |T_i . diag_T| + |omega_i . diag_w| + |k12_i . diag_k| +
                |f_i * diag_f| )^2
            + || points . diag_pts ||^2
    return sqrt(total)

where omega is the LOG MAP of the camera rotation. The reference's log map
routes through a quaternion conversion with a transcription bug (reads
R(1,2) for m21, MathUtils.h:30, corrupting a copysign at :37); per SURVEY.md
section 2.1 we use the CORRECT log map — no in-repo reference driver ever
calls this function, so no observable output depends on the bug.

``diag`` uses the reference's points-first layout: [0, 3M) point coords,
[3M, 3M+9N) camera params ordered T(3), omega(3), f, k1, k2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bundleadjustment_benchmarks_tpu.models.problem import BAState
from bundleadjustment_benchmarks_tpu.ops import rodrigues


def estimate_norm(state: BAState, diag: jax.Array) -> jax.Array:
    m = state.n_points
    n = state.n_cameras
    diag_pts = diag[: 3 * m].reshape(m, 3)
    diag_cam = diag[3 * m :].reshape(n, 9)

    omega = rodrigues.log_rodrigues(state.R)
    k12 = jnp.stack([state.k1, state.k2], axis=-1)

    per_cam = (
        jnp.linalg.norm(state.T * diag_cam[:, 0:3], axis=-1)
        + jnp.linalg.norm(omega * diag_cam[:, 3:6], axis=-1)
        + jnp.linalg.norm(k12 * diag_cam[:, 7:9], axis=-1)
        + jnp.abs(state.focal * diag_cam[:, 6])
    )
    total = jnp.sum(per_cam) ** 2
    total = total + jnp.sum((state.points * diag_pts) ** 2)
    return jnp.sqrt(total)
