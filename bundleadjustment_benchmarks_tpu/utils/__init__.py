from bundleadjustment_benchmarks_tpu.utils import logger, stats  # noqa: F401
