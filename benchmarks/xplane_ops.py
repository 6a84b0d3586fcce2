"""Parse a jax.profiler xplane trace into per-HLO-op device-time totals.

Usage:
    from benchmarks.xplane_ops import trace_and_report
    trace_and_report(fn, *args, reps=10)       # prints top ops by device time
"""
import glob
import os
from collections import defaultdict


def _load_xplane(logdir):
    paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {logdir}"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def op_times(logdir, min_us=1.0):
    """Aggregate device-plane event durations by event name (microseconds)."""
    xs = _load_xplane(logdir)
    totals = defaultdict(float)
    counts = defaultdict(int)
    for plane in xs.planes:
        pname = plane.name
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            # XLA op lines carry per-op events; skip step lines.
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                dur_us = ev.duration_ps / 1e6
                totals[name] += dur_us
                counts[name] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    return [(n, t, counts[n]) for n, t in rows if t >= min_us]


def trace_and_report(fn, *args, reps=10, top=30, logdir="/tmp/jax_trace_ops"):
    import jax

    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    rows = op_times(logdir)
    print(f"{'op':64s} {'total_us':>12s} {'us/rep':>10s} {'count':>7s}")
    for n, t, c in rows[:top]:
        print(f"{n[:64]:64s} {t:12.1f} {t/reps:10.1f} {c:7d}")
    return rows
