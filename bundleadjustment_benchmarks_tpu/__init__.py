"""TPU-native bundle-adjustment benchmark framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
jasvob/BundleAdjustment_Benchmarks (reference: /root/reference): five sparse
linear-solver strategies (QRKIT / QRCHOL / MOREQR / SPQR / CHOLESKY) inside a
backtracking Levenberg-Marquardt loop for BAL (Bundle Adjustment in the Large)
problems.

Instead of the reference's CSC sparse Jacobian + sequential sparse
factorizations (reference src/Optimization/BAFunctor.h:98-117), the TPU design
keeps the Jacobian implicitly as dense per-observation block tensors
(K,2,9)/(K,2,3) plus index maps, and solves the damped normal equations via
batched small-block factorizations + a dense Schur-complement reduction that
maps onto the MXU.
"""

from bundleadjustment_benchmarks_tpu.models.problem import (  # noqa: F401
    BAObservations,
    BAProblem,
    BAState,
    load_bal_problem,
)
from bundleadjustment_benchmarks_tpu.solvers.lm import (  # noqa: F401
    LMConfig,
    LMStatus,
    minimize,
)

__version__ = "0.1.0"
