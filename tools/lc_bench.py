#!/usr/bin/env python3
"""Multi-JVM evidence tier: the bench 9 under ``local-cluster[N,C,M]``.

Everything in BENCH_r*.json runs single-JVM ``local[32]``, where
"shuffle" is an in-process memory copy and Python workers talk to the
one driver JVM. ``local-cluster`` is Spark's real-standalone-in-a-box:
N separate executor JVM processes, real serialized+compressed shuffle
blocks over loopback, real broadcast distribution, real task
(de)serialization — the execution shape a 1000-executor cluster has,
minus the network fabric. It does NOT replace the canonical bench (the
2x bar stays single-JVM apples-to-apples vs BASELINE.md); it exists so
SCALE.md §9's "single-JVM only" honesty gap closes with a measurement.

ARBITERED PROTOCOL (default since round 15 — BASELINE.md round-15
addendum). Round 14 measured 8.24 s and 9.53 s on byte-identical code
that read 6.33 s the round before: shared-session LC totals are
dominated by multi-process scheduler/straggler variance (the same
effect the dd03 density probe isolated — rep spreads of 5.8–72.7 s
with byte-stable plan fingerprints and zero executor loss). The fix is
the protocol that resolved dd03, applied here:

- one FRESH local-cluster session per query, in its own SUBPROCESS
  (fresh driver + fresh executor JVMs — no cross-query broadcast/GC
  residue, no shared-scheduler tail);
- per query: untimed codegen warm-up, then min-of-N (default 5) timed
  reps, each rep's pre-execution plan fingerprint recorded (drift =
  real plan change, not noise);
- an LC-SPECIFIC reference probe (the bench.py pinned reference job —
  range source, codegen projection, one REAL serialized shuffle,
  checksum reduce) is interleaved between reps in the SAME session.
  Its min is ``lc_spark_calib``; cross-round comparisons divide the
  total by (lc_spark_calib / LC_SPARK_CALIB_REF). The per-session
  sample spread is the run's recorded noise band — a total that moved
  less than its noise band did not move.

Usage:
  python tools/lc_bench.py                  # arbitered, sf0.1, 4,8,6144
  python tools/lc_bench.py shared           # legacy shared-session mode
  python tools/lc_bench.py one <query>      # internal: one child run
  SPARK_GRAFT_SF_DIR=... SPARK_LC=2,4,4096 python tools/lc_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Reference floor for the LC probe, pinned from the first arbitered
# run (round 15) the same way SPARK_CALIB_REF pinned the single-JVM
# probe on the round-11 VM: the min across all per-session samples of
# that run. Later rounds compare value * LC_SPARK_CALIB_REF /
# lc_spark_calib. (The probe shares the queries' full LC stack —
# serialized shuffle between separate JVMs — unlike the single-JVM
# spark_calib, so it tracks exactly the variance source that made
# shared-session LC totals unreadable.)
LC_SPARK_CALIB_REF = float(os.environ.get("SPARK_LC_CALIB_REF", "0.5306"))

N_RUNS = int(os.environ.get("SPARK_LC_BENCH_REPS", "5"))


def _lc_session(app: str):
    from travel_data_ingestion_spark.session import get_spark

    n, cores, mem = (os.environ.get("SPARK_LC") or "4,8,6144").split(",")
    return get_spark(
        app_name=app,
        master=f"local-cluster[{n},{cores},{mem}]",
        extra_conf={
            "spark.sql.legacy.allowHashOnMapType": "true",
            # shuffle partitions sized to total executor cores, the
            # cluster rule (not the single-JVM 32)
            "spark.sql.shuffle.partitions": str(int(n) * int(cores)),
            "spark.default.parallelism": str(int(n) * int(cores)),
            "spark.executor.memory": f"{mem}m",
            # the driver no longer hosts executors: shrink its heap so
            # 1 driver + N executors fit the same box
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "8g"),
        },
    ), f"local-cluster[{n},{cores},{mem}]"


def run_one(name: str) -> None:
    """Child: one query, one fresh local-cluster session, min-of-N with
    interleaved LC reference-probe samples and per-rep plan
    fingerprints. Prints ONE JSON line."""
    from bench import checksum_plan, microbench_spark
    from tools.probe_util import plan_fingerprint
    from travel_data_ingestion_spark.queries import member_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, master = _lc_session(f"lc-bench-{name}")
    spec = member_queries()[name]

    # warm-ups: two probe runs (codegen + JIT profiling of the probe
    # loop; recorded separately — they include fresh-JVM compilation
    # and executor spin-up, so they must NOT widen the steady-state
    # noise band), one untimed query run (query codegen, parquet
    # footers, broadcast warm), then the timed block — same shape as
    # bench.py's per-query local warm-up.
    probe_warm = [round(microbench_spark(spark), 4) for _ in range(2)]
    checksum_plan(spec.fn(spark, sf_dir)).collect()
    probe_samples = []

    reps, fps = [], []
    for _ in range(N_RUNS):
        df = checksum_plan(spec.fn(spark, sf_dir))
        fps.append(plan_fingerprint(df._jdf.queryExecution()))
        t0 = time.perf_counter()
        df.collect()
        reps.append(round(time.perf_counter() - t0, 4))
        probe_samples.append(round(microbench_spark(spark), 4))

    print(json.dumps({
        "query": name,
        "sec": min(reps),
        "reps_sec": reps,
        "plan_fp": fps,
        "lc_probe_samples": probe_samples,
        "lc_probe_warm": probe_warm,
        "master": master,
        "executors": (
            spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
        ),
    }))
    spark.stop()


def run_arbitered() -> None:
    """Parent: one subprocess per bench query (fresh JVMs each), merged
    into the BENCH_LC JSON line."""
    from bench import BENCH_QUERIES

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    timings, details, errors = {}, {}, {}
    probe_all = []
    master = executors = None
    for name in BENCH_QUERIES:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one", name],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            errors[name] = (r.stderr or r.stdout)[-500:]
            continue
        timings[name] = d["sec"]
        details[name] = {k: d[k] for k in
                         ("reps_sec", "plan_fp", "lc_probe_samples")}
        probe_all.extend(d["lc_probe_samples"])
        master, executors = d["master"], d["executors"]

    total = round(sum(timings.values()), 4)
    lc_calib = min(probe_all) if probe_all else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import re as _re

    m = _re.search(r"sf([\d.]+)", sf_dir)
    out = {
        "metric": "bench_total_9q_lc",
        "protocol": "arbitered",  # fresh session+JVMs per query
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(m.group(1)) if m else None,
        "n_runs": N_RUNS,
        "lc_spark_calib": lc_calib,
        "lc_spark_calib_ref": LC_SPARK_CALIB_REF,
        "value_lc_calibrated": (
            round(total * LC_SPARK_CALIB_REF / lc_calib, 4)
            if lc_calib else None
        ),
        # the run's own noise band: the spread of the probe samples —
        # a cross-round delta smaller than this band is not a signal
        "lc_probe_band": (
            [min(probe_all), max(probe_all)] if probe_all else None
        ),
        "master": master,
        "executors": executors,
        "detail": details,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


def run_shared() -> None:
    """Legacy mode: the r13/r14 shared-session shape (kept for
    comparability experiments; its totals are session-classed —
    see the module docstring)."""
    from bench import run_bench
    from travel_data_ingestion_spark.queries import member_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark, master = _lc_session("bench-local-cluster")
    out = run_bench(spark, member_queries(), sf_dir)
    out["metric"] = "bench_total_9q_lc"
    out["protocol"] = "shared_session"
    out["master"] = master
    out["executors"] = (
        spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    )
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "arbitered"
    if mode == "one":
        run_one(sys.argv[2])
    elif mode == "shared":
        run_shared()
    else:
        run_arbitered()


if __name__ == "__main__":
    main()
