"""p126 stand-in: scipy-oracle trajectory/statistics check for the TPU drive.

The problem-126 stand-in is the one BASELINE.json config whose scipy oracle
cannot reach flatline in a round: the faithful CPU port (cpu_reference.py,
splu of the full 121k-column normal matrix — the reference CHOLESKY
algorithm, /root/reference/src/Eigen_ext/BacktrackLevMarqCholesky.h:272-282)
runs ~20+ minutes PER LM ITERATION at this scale, so a ~hundreds-iteration
flatline is days of CPU. What IS affordable is an oracle PREFIX: the first
N accepted iterations' energies + the checkpointed state at the last saved
iteration (cpu_reference.py --save-state). This script grounds the TPU
drive against that prefix:

  1. parse the oracle's verbose log for its accepted-iteration trace
     (iter, energy, lambda);
  2. run the framework's f64 cholesky drive (same algorithm) on the same
     stand-in to the same iteration budget, recording per-iteration
     energies (host drive: exact per-iteration records);
  3. if the oracle checkpoint npz exists, evaluate the reference statistics
     (Utils.h:15-68) on BOTH states at the matched iteration count;
  4. write benchmarks/results/p126_oracle_check.json, consumed by
     tests/test_flatline_parity.py::test_p126_oracle_prefix.

The five-mode df32 flatline rows at p126 (parity_campaign.json) then anchor
to the oracle transitively: cholesky-f64-vs-oracle here, five-mode mutual
parity there. Documented in BASELINE.md (round 4).

Usage: python benchmarks/p126_oracle_check.py [--max-iter N] [--key p126|p257]

Round 5: generalized to the p257 stand-in (--key p257) — the same
prefix-anchoring treatment at the headline-scale config (BASELINE.json
configs 4-5), whose oracle runs ~1 h PER ITERATION on this host's 2 CPUs.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
#: Per-problem artifact paths: (oracle log, oracle state npz, output json,
#: tpu trace jsonl, BAL stand-in).
CONFIGS = {
    "p126": (
        os.path.join(RESULTS, "cpu_p126_flatline.log"),
        os.path.join(RESULTS, "cpu_p126_state.npz"),
        os.path.join(RESULTS, "p126_oracle_check.json"),
        os.path.join(RESULTS, "p126_tpu_trace.jsonl"),
        os.path.join(_DATA, "problem-126-40037-pre.txt.gz"),
    ),
    "p257": (
        os.path.join(RESULTS, "cpu_p257_prefix.log"),
        os.path.join(RESULTS, "cpu_p257_state.npz"),
        os.path.join(RESULTS, "p257_oracle_check.json"),
        os.path.join(RESULTS, "p257_tpu_trace.jsonl"),
        os.path.join(_DATA, "problem-257-65132-pre.txt.gz"),
    ),
}


def parse_oracle_trace(path):
    """[(iter, energy, lam)] accepted rows from the cpu_reference log."""
    rows = []
    pat = re.compile(
        r"^\s*(\d+) Accepted ([0-9.eE+-]+) rho=[0-9.eE+-]+ lam=([0-9.eE+-]+)"
    )
    with open(path) as f:
        for line in f:
            m = pat.match(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(2)),
                             float(m.group(3))))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iter", type=int, default=None,
                    help="TPU iteration budget (default: oracle trace length)")
    ap.add_argument("--key", default="p126", choices=sorted(CONFIGS))
    args = ap.parse_args()
    ORACLE_LOG, ORACLE_NPZ, OUT, TRACE, PROBLEM = CONFIGS[args.key]

    oracle_trace = parse_oracle_trace(ORACLE_LOG)
    if not oracle_trace:
        print("no oracle trace found; run cpu_reference.py on p126 first")
        return 1
    budget = args.max_iter or oracle_trace[-1][0]

    import numpy as np
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bundleadjustment_benchmarks_tpu.models.problem import load_bal_problem
    from bundleadjustment_benchmarks_tpu.solvers import lm
    from bundleadjustment_benchmarks_tpu.utils import stats as jstats

    problem = load_bal_problem(PROBLEM, dtype=jnp.float64)

    # Host drive: exact per-iteration energies (the reference's verbose
    # semantics), bounded per-trial dispatches on TPU.
    metrics_path = TRACE
    if os.path.exists(metrics_path):
        os.remove(metrics_path)
    cfg = lm.LMConfig(drive="host", max_iter=budget)
    res = lm.minimize(problem, mode="cholesky", config=cfg,
                      metrics_path=metrics_path)

    tpu_trace = []
    with open(metrics_path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("status") == "Accepted":
                # 'f' is the pre-accept energy of that iteration; the
                # accepted energy appears as the next iteration's f. Use the
                # same convention as the oracle trace (energy AFTER accept)
                # by shifting: record (iter, next f). Simpler: recompute from
                # rho bookkeeping is not needed — the final energy is in res.
                tpu_trace.append((r["iter"], r["f"], r["lambda"]))

    # Align conventions: oracle trace stores energy AFTER the accepted step
    # of iteration i; the JSONL 'f' is the energy BEFORE iteration i (i.e.
    # after iteration i-1). So oracle[i].energy == tpu_jsonl[i+1].f.
    pairs = []
    tpu_f = {it: f for it, f, _ in tpu_trace}
    for it, e_oracle, lam_o in oracle_trace:
        f_next = tpu_f.get(it + 1)
        if f_next is not None:
            pairs.append({
                "iter": it, "oracle_energy": e_oracle, "tpu_energy": f_next,
                "rel": abs(f_next - e_oracle) / e_oracle,
            })
    if pairs and pairs[-1]["iter"] == budget - 1 and res.energy:
        pairs.append({
            "iter": budget, "oracle_energy": oracle_trace[-1][1]
            if oracle_trace[-1][0] == budget else None,
            "tpu_energy": res.energy, "rel": None,
        })

    out = {
        "problem": os.path.basename(PROBLEM),
        "budget": budget,
        "oracle_trace": [
            {"iter": i, "energy": e, "lam": l} for i, e, l in oracle_trace
        ],
        "trajectory_pairs": pairs,
    }

    # Matched-iteration statistics if the oracle checkpoint exists.
    if os.path.exists(ORACLE_NPZ):
        d = np.load(ORACLE_NPZ)
        k = int(d["it"])
        # Rebuild a BAState from the oracle checkpoint. cpu_reference's
        # State stores f = K(0,0) = -focal ALREADY NEGATED
        # (cpu_reference.py State.__init__) and pre-scaled k1/k2 — the same
        # conventions as the framework's BAState, so the fields map 1:1.
        import dataclasses as _dc

        Kmat = np.zeros((d["f"].shape[0], 3, 3))
        Kmat[:, 0, 0] = d["f"]
        Kmat[:, 1, 1] = d["f"]
        Kmat[:, 2, 2] = 1.0
        oracle_state = _dc.replace(
            problem.state,
            K=jnp.asarray(Kmat),
            R=jnp.asarray(d["R"]),
            T=jnp.asarray(d["T"]),
            k1=jnp.asarray(d["k1"]),
            k2=jnp.asarray(d["k2"]),
            points=jnp.asarray(d["X"]),
        )
        res_k = lm.minimize(
            problem, mode="cholesky",
            config=lm.LMConfig(drive="jit", max_iter=k, chunked=True,
                               chunk_size=4),
        )

        def stats_of(state):
            s = jstats.error_statistics(state, problem.obs, 1.0, 0.5)
            return {
                "mean_reprojection_error": float(s.mean_reprojection_error),
                "inlier_mean_reprojection_error": float(
                    s.inlier_mean_reprojection_error),
                "n_inliers": int(s.n_inliers),
                "true_objective": float(
                    jstats.true_objective(state, problem.obs, 1.0, 0.5)),
            }

        out["matched_iteration"] = {
            "iter": k,
            "oracle": stats_of(oracle_state),
            "tpu": stats_of(res_k.state),
        }

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT} ({len(pairs)} trajectory pairs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
