"""Shard-scaling correctness + overhead on the problem-257 stand-in.

BASELINE.json config 5: the distributed Schur reduction must produce the
same optimization as the single-device program, and the sharded program's
overhead on ONE chip must be known. This driver:

* loads the committed problem-257 stand-in (data/problem-257-65132-pre.txt.gz
  — generated, statistically matched; see BASELINE.md "Stand-in data"),
* runs N LM iterations with the plain single-device jit drive, then with
  the sharded drive at --shards 1/2/4/8 (virtual CPU mesh via
  XLA_FLAGS=--xla_force_host_platform_device_count=8, or real chips),
* reports final energies + per-config wall time as one JSON line per config.

Correctness bar: all shard counts agree with each other to ~1e-9 relative
(identical f64 control flow; only reduction order differs) and with the
single-device drive to the same order.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/shard_scaling.py [--iters 3] [--shards 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBLEM = "data/problem-257-65132-pre.txt.gz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default=PROBLEM)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--shards", default="1,2,4,8")
    ap.add_argument("--mode", default="cholesky")
    ap.add_argument("--drive", default="f64", choices=["f64", "df32"])
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # The harness may pre-import jax on the TPU platform; the env var
        # alone is then too late (see tests/conftest.py) — force the config.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.parallel import sharded
    from bundleadjustment_benchmarks_tpu.solvers import lm

    kw = {}
    if args.drive == "df32":
        kw = dict(matmul_dtype="float32", geometry="df32")
    cfg = lm.LMConfig(drive="jit", max_iter=args.iters, **kw)

    problem = load_bal_problem(args.problem, dtype=jnp.float64)
    rows = []

    t0 = time.perf_counter()
    res = lm.minimize(problem, mode=args.mode, config=cfg)
    jax.block_until_ready(res.state.points)
    row = {"config": "single", "iters": res.iterations,
           "energy": res.energy, "wall_s": round(time.perf_counter() - t0, 3)}
    rows.append(row)
    print(json.dumps(row), flush=True)

    for s in [int(x) for x in args.shards.split(",")]:
        if len(jax.devices()) < s:
            print(json.dumps({"config": f"shards{s}", "skipped":
                              f"only {len(jax.devices())} devices"}),
                  flush=True)
            continue
        mesh = sharded.make_mesh(s)
        sp = sharded.shard_problem(problem, mesh)
        t0 = time.perf_counter()
        res = sharded.minimize_sharded(sp, mesh, mode=args.mode, config=cfg)
        jax.block_until_ready(res.state.points)
        row = {"config": f"shards{s}", "iters": res.iterations,
               "energy": res.energy,
               "wall_s": round(time.perf_counter() - t0, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    energies = [r["energy"] for r in rows if "energy" in r]
    ref = energies[0]
    spread = max(abs(e - ref) / abs(ref) for e in energies)
    print(json.dumps({"relative_energy_spread": spread,
                      "n_configs": len(energies)}), flush=True)


if __name__ == "__main__":
    main()
