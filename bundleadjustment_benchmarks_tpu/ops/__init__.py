from bundleadjustment_benchmarks_tpu.ops import (  # noqa: F401
    jacobian,
    linalg,
    projection,
    robust,
    rodrigues,
)
