from bundleadjustment_benchmarks_tpu.solvers import schur  # noqa: F401
from bundleadjustment_benchmarks_tpu.solvers.lm import (  # noqa: F401
    LMConfig,
    LMResult,
    LMStatus,
    minimize,
)

SOLVER_MODES = ("cholesky", "qrchol", "qrkit", "moreqr", "spqr")
