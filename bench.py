"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline metric (BASELINE.md): LM iterations/sec on a bundled BAL problem,
measured on whatever accelerator jax provides (real TPU chip under the
driver). The workload is a fixed-iteration budget of the fully-jitted LM
(drive='jit', cholesky mode) on problem-21-11315-pre; timing excludes
compilation (one warm-up run) and includes everything else (Jacobian, Schur
reduction, damped solves, manifold updates).

``vs_baseline`` compares against the recorded CPU reference-equivalent
measurement in bench_baseline.json (the reference repo publishes no numbers —
SURVEY.md section 6 — and its SuiteSparse/Windows build cannot run here, so the
baseline is a faithful scipy.sparse port of its CHOLESKY driver measured on
this machine's CPU; see benchmarks/cpu_reference.py).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

PROBLEM = "/root/reference/data/problem-21-11315-pre.txt"
#: 100 iterations (p21 flatlines around ~175, so the whole budget is real
#: descent): amortizes the one-time dispatch/tunnel overhead (~25-50 ms)
#: that a 25-iteration budget paid 4x more of per iteration.
MAX_ITER = 100
METRIC = "lm_iter_per_sec_problem21_cholesky"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm

    platform = jax.devices()[0].platform
    # Mixed precision (see cli.py): f64 camera state and tiny reductions; the
    # K/M-sized geometry in two-float compensated f32 (geometry='df32' — zero
    # f64 HLOs on observation-sized data); the big Schur matmuls in f32 on
    # accelerators (MXU path), f64 on CPU.
    jax.config.update("jax_enable_x64", True)
    matmul_dtype = None if platform == "cpu" else "float32"
    geometry = None if platform == "cpu" else "df32"

    problem = load_bal_problem(PROBLEM, dtype=jnp.float64)
    cfg = lm.LMConfig(
        drive="jit",
        max_iter=MAX_ITER,
        matmul_dtype=matmul_dtype,
        geometry=geometry,
    )

    # Warm-up: compile + first run.
    res = lm.minimize(problem, mode="cholesky", config=cfg)
    assert res.iterations >= 1

    # Timed run.
    t0 = time.perf_counter()
    res = lm.minimize(problem, mode="cholesky", config=cfg)
    jax.block_until_ready(res.state.points)
    wall = time.perf_counter() - t0
    iters_per_sec = res.iterations / wall

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_baseline.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get(METRIC)

    out = {
        "metric": METRIC,
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / baseline, 4) if baseline else 1.0,
    }

    # Scale headline (VERDICT r3 item 5): LM iter/s on the problem-257
    # STAND-IN (N=257, M=65132, K=260528 — committed balgen stand-in for the
    # stripped BAL blob; BASELINE.md "Stand-in data"), where the MXU actually
    # loads. Tracked as extra fields of the same JSON line so per-round
    # regressions off the p21 path are visible; the primary metric stays the
    # p21 number every prior round recorded.
    p257_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "problem-257-65132-pre.txt.gz")
    if os.path.exists(p257_path) and platform != "cpu":
        problem257 = load_bal_problem(p257_path, dtype=jnp.float64)
        for mode_ in ("cholesky", "qrchol"):
            res = lm.minimize(problem257, mode=mode_, config=cfg)  # warm-up
            t0 = time.perf_counter()
            res = lm.minimize(problem257, mode=mode_, config=cfg)
            jax.block_until_ready(res.state.points)
            out[f"p257_{mode_}_iter_per_sec"] = round(
                res.iterations / (time.perf_counter() - t0), 4
            )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
