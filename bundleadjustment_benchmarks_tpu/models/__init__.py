from bundleadjustment_benchmarks_tpu.models.problem import (  # noqa: F401
    BAObservations,
    BAProblem,
    BAState,
    apply_step,
    load_bal_problem,
)
