from bundleadjustment_benchmarks_tpu.io.bal import (  # noqa: F401
    BalDataset,
    read_bal,
    write_bal,
)
