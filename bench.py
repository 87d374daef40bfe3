"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is a single compact JSON summary INCLUDING the
per-query medians (VERDICT r12 #2: the driver's PERF comparator reads
``queries`` from this line; 238 rounded floats is ~6 KB, well inside the
tail capture that the r02-era full detail dict overflowed):

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q01_events_daily": 0.12, ...},
     "sf": 0.1, "layout_sec": S, "n_queries": 238,
     "detail_file": "BENCH_DETAIL.json"}

The full detail (first samples, repeat samples, reruns, annotations) is
written to ``BENCH_DETAIL.json`` next to this script (and echoed to
stderr).

Each query executes its full plan to completion; results are drained with
count() on a cached-free plan (no collect of wide rows so driver transfer
doesn't pollute the measurement).

``--repeat N`` (default 1) runs every query N times and reports the
per-query MEDIAN: the shared host's co-tenant noise swings individual
queries 3-8x between rounds (VERDICT r7 #3 — fixed-size q63 has measured
1.7 s vs 13.8 s on different days), and a median-of-3 snapshot is what
lets a cross-round diff treat >1.5x moves as real. Repeats run
back-to-back per query (not whole-suite sweeps) so each query's samples
share cache/JIT state and differ only by host noise.

``cold_total`` (VERDICT r9 #1) = the sum of every query's FIRST sample —
the number a repeat-1 run (driver, judge) approximates, because the
memoized/shared one-time stage costs land in first samples and in no
warm median. Cross-protocol diffs compare cold_total vs repeat-1 totals
and median-vs-median; never median-vs-repeat-1. ``loadavg_start/_end``
stamp the host's 1/5/15-min load so a committed snapshot carries its own
noise-window evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# Per-query measurement caveats, copied into BENCH_DETAIL.json so a
# committed snapshot is self-describing (VERDICT r8 #3: q32's 0.04 s
# warm median was mistaken for decode cost). Three classes:
#   memoized  — the query shares a session-memoized fixture/stage, so
#               repeat samples (and any run after the first consumer)
#               are warm; the FIRST sample carries the real cost.
#   shared    — the query consumes a stage computed once per session for
#               a family (cluster family's pair-gen + connected
#               components); whichever family member runs first pays it.
#   tier      — the query ran its production tier (SPARK_GRAFT_TIER);
#               the correctness gate replays the slower oracle tier.
QUERY_ANNOTATIONS = {
    "q32_bag_decode": "memoized: demo-bag decode cached per session; repeats are warm",
    "q33_png_export": "memoized: shares q32's decoded demo bag",
    "q184_semantic_dedup_ivf": "tier: production (broadcast-matmul assignment); gate replays exact Lloyd",
    "q105_voc_map": "tier: production (declarative grid-bucketed matcher); gate replays the cogroup greedy walk",
    "q55_ann_ivf": "tier: production (declarative table assign/probe); gate replays the integer-quantized tier",
    "q70_ivf_index_persist": "tier: production (declarative table assign/probe)",
    "q103_ivf_incremental": "tier: production (declarative table assign/probe)",
    "q54_dedup_clusters": "shared: pair-gen+CC stage computed once per session for q54/q157/q203/q205",
    "q157_cluster_representatives": "shared: reuses the q54-family pair-gen+CC stage",
    "q203_cluster_aware_split": "shared: reuses the q54-family pair-gen+CC stage",
    "q205_incremental_clusters": "shared: reuses the q54-family pair table (runs its own CC)",
    "q68_minhash_lsh_capped": "shared: band keys recut from the session-shared minhash signature table",
    "q87_salted_lsh": "shared: band keys recut from the session-shared minhash signature table",
    "q89_persisted_lsh_index": "shared: persisted index built from the session-shared signature table",
    "q172_split_leakage": "shared: capped 0.5 pair table computed once per session for q172/q197",
    "q197_cross_source_dups": "shared: reuses the q172-family capped 0.5 pair table",
    "q204_threshold_tuned_lsh": "shared: adaptive plans recut the session-shared signature table",
    "q223_pq_adc_topk": "shared: flat-PQ train/encode stage computed once per session for q223/q226",
    "q226_pq_recall_eval": "shared: reuses the q223 flat-PQ stage (runs its own truth tier)",
    "q24_minhash_lsh": "shared: uncapped 0.2 pair table computed once per session for q24/q91/q201",
    "q91_pagerank_neardup": "shared: reuses the q24-family uncapped pair table (runs its own PageRank)",
    "q201_lsh_recall_eval": "shared: reuses the q24-family uncapped pair table (runs its own exact arm)",
    "q42_embedding_neardup": "shared: raw verified edge stage computed once per session for q42/q168/q180/q229",
    "q168_triangle_count": "shared: mutual-kNN edge stage computed once per session for q168/q180/q229",
    "q180_link_prediction": "shared: reuses the q168-family mutual-kNN edge stage",
    "q229_label_propagation": "shared: reuses the q168-family mutual-kNN edge stage",
}

# Monotone-noise guard (VERDICT r8 #3): a co-tenant load ramp can land
# ALL repeat samples inside one noise window — three monotone-increasing
# samples spanning >2x are indistinguishable from a real regression in
# the committed median. Take up to EXTRA_SAMPLES more; the median over
# 5 then needs 3 contaminated samples to lie.
NOISE_SPREAD = 2.0
EXTRA_SAMPLES = 2


def _load_prior_detail(sf: float) -> dict[str, float] | None:
    """Per-query medians of the newest committed BENCH_DETAIL_r*.json at
    the SAME scale factor — the round-over-round baseline for the rerun
    adjudication. None when no comparable prior exists (first round, or
    a non-default SF with no committed history)."""
    import glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    candidates = []
    for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r*.json")):
        m = _re.search(r"_r(\d+)\.json$", p)
        if m:
            candidates.append((int(m.group(1)), p))
    for _, p in sorted(candidates, reverse=True):
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if d.get("sf") == sf and isinstance(d.get("queries"), dict):
            return d["queries"]
    return None


def monotone_noisy(runs: list[float]) -> bool:
    return (
        len(runs) >= 3
        and all(a <= b for a, b in zip(runs, runs[1:]))
        and min(runs) > 0
        and max(runs) / min(runs) > NOISE_SPREAD
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1,
                    help="samples per query; the reported time is the median")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    # Bench measures the PRODUCTION tier where a query ships both a
    # bit-replayable gate plan and a faster equivalent (q184's
    # broadcast-matmul assignment vs exact-Lloyd codegen, VERDICT r8 #1);
    # the correctness gate runs without this env and keeps the replay
    # tier. Affected queries are listed in QUERY_ANNOTATIONS.
    os.environ.setdefault("SPARK_GRAFT_TIER", "production")

    import __spark_entry__ as se
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.session import (
        get_spark,
    )

    spark = get_spark("bench", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.tables import (
        drop_bucketed,
        materialize_bucketed,
    )

    # One-time bucketed fact layout (the ingest-time cost a production
    # deployment pays once): orders/lineitem bucketed+sorted on orderkey,
    # so fact-fact joins (q03-class) run shuffle-free. Reported separately
    # as layout_sec — it is not query time.
    t0 = time.perf_counter()
    materialize_bucketed(spark, sf_dir, buckets=int(cpus))
    layout_sec = round(time.perf_counter() - t0, 3)
    print(f"# bucketed layout: {layout_sec:.3f}s", file=sys.stderr)

    queries = se.queries()
    # warm the JVM/codegen once with the flagship query so q01's number is
    # not inflated by session startup
    queries["q01_events_daily"](spark, sf_dir).count()

    # Cross-protocol comparability (VERDICT r9 #1): a repeat-N run's
    # median total hides every memoized/shared one-time cost inside the
    # warm repeats, so it is NOT comparable to a repeat-1 run (driver or
    # judge). cold_total = sum of FIRST samples is the number a repeat-1
    # run approximates; loadavg stamps bound the co-tenant noise window
    # the run executed in. Both land in BENCH_DETAIL.json + the summary.
    loadavg_start = [round(x, 2) for x in os.getloadavg()]
    times: dict[str, float] = {}
    firsts: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(queries.items()):
        runs = []
        try:
            for _ in range(max(1, args.repeat)):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                runs.append(round(time.perf_counter() - t0, 3))
            if args.repeat > 1 and monotone_noisy(runs):
                # all samples rode one co-tenant load ramp — widen the
                # sample set so the median can escape the noise window.
                # Own try: a failure here must fall back to the valid
                # samples already in hand, not discard them (r9 review)
                print(
                    f"# {name}: monotone spread {min(runs)}->{max(runs)},"
                    f" taking {EXTRA_SAMPLES} extra samples",
                    file=sys.stderr,
                )
                try:
                    for _ in range(EXTRA_SAMPLES):
                        t0 = time.perf_counter()
                        fn(spark, sf_dir).count()
                        runs.append(round(time.perf_counter() - t0, 3))
                except Exception as e:  # noqa: BLE001
                    print(
                        f"# {name}: extra sample failed ({e!r:.120}), keeping"
                        f" the {len(runs)} collected samples",
                        file=sys.stderr,
                    )
        except Exception as e:  # noqa: BLE001 — one bad query must not
            # abort the suite: without this, a single co-tenant OOM or
            # plan regression at query k lost all k-1 timings, the JSON
            # summary, and the cleanup (r8 review)
            errors[name] = repr(e)[:200]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        samples[name] = runs
        firsts[name] = runs[0]
        times[name] = round(statistics.median(runs), 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows) {runs}", file=sys.stderr)

    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0

    # Round-over-round window-artifact adjudication (VERDICT r11 #3):
    # a co-tenant burst during a query's slot makes its committed warm
    # median read as a 1.5-2.5x regression that a quiet re-run reverses
    # — r11 shipped four such phantoms (q224/q180/q226/q225) that the
    # judge had to re-run by hand. Automate the re-run: any query whose
    # median exceeds the PRIOR ROUND's committed value by
    # >RERUN_THRESHOLD is re-sampled solo at the END of the suite (a
    # different noise window by construction); both numbers land in
    # detail["reruns"] with an adjudication verdict so the artifact
    # carries its own evidence instead of a silent phantom. The committed
    # metric is NEVER substituted (VERDICT r12 #1: value = the
    # unadjudicated protocol total; adjudication is evidence, not data).
    RERUN_THRESHOLD = 1.5
    RERUN_SAMPLES = 3
    prior = _load_prior_detail(sf)
    reruns: dict[str, dict] = {}
    if prior:
        suspects = [
            (name, t, prior[name])
            for name, t in times.items()
            if name in prior and prior[name] > 0 and t / prior[name] > RERUN_THRESHOLD
        ]
        for name, t_main, t_prior in suspects:
            print(
                f"# rerun {name}: median {t_main:.3f}s vs prior {t_prior:.3f}s"
                f" (> {RERUN_THRESHOLD}x) — re-sampling solo",
                file=sys.stderr,
            )
            rr: list[float] = []
            try:
                for _ in range(RERUN_SAMPLES):
                    t0 = time.perf_counter()
                    queries[name](spark, sf_dir).count()
                    rr.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001 — keep partial samples
                print(f"# rerun {name}: failed ({e!r:.120})", file=sys.stderr)
            if not rr:
                continue
            rerun_median = round(statistics.median(rr), 3)
            adjudication = (
                "window-artifact"
                if rerun_median / t_prior <= RERUN_THRESHOLD
                else "persists"
            )
            reruns[name] = {
                "prior": t_prior,
                "main_median": t_main,
                "rerun_samples": rr,
                "rerun_median": rerun_median,
                "adjudication": adjudication,
            }
            # VERDICT r12 #1: the committed value stays the UNADJUDICATED
            # protocol median — adjudication is recorded in `reruns` only,
            # never substituted into the metric (the r12 min() substitution
            # pulled the driver's repeat-1 `value` ~75 s below what ran).
            print(
                f"# rerun {name}: {rerun_median:.3f}s -> {adjudication}",
                file=sys.stderr,
            )

    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    detail = {
        "metric": "total_query_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "cold_total": round(sum(firsts.values()), 3),
        "queries": times,
        "first_samples": firsts,
        "sf": sf,
        "layout_sec": layout_sec,
        "repeat": max(1, args.repeat),
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "annotations": {
            q: note for q, note in QUERY_ANNOTATIONS.items() if q in times
        },
    }
    if args.repeat > 1:
        detail["samples"] = samples
    if reruns:
        detail["reruns"] = reruns
    if errors:
        detail["errors"] = errors
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr)
    # Compact summary LAST on stdout so a tail-capturing driver always gets
    # one complete parseable JSON line (the per-query dict lives in
    # BENCH_DETAIL.json / stderr).
    summary = {
        "metric": "total_query_sec",
        "value": detail["value"],
        "unit": "sec",
        "cold_total": detail["cold_total"],
        # VERDICT r12 #2: per-query medians back on the one-line summary so
        # the driver's round-over-round comparator (PERF per_query) has
        # data — 238 compact floats is ~6 KB, within tail capture.
        "queries": times,
        "sf": sf,
        "layout_sec": layout_sec,
        "n_queries": len(times),
        "n_errors": len(errors),
        "repeat": max(1, args.repeat),
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "detail_file": "BENCH_DETAIL.json",
    }
    print(json.dumps(summary))
    drop_bucketed(spark, sf_dir)
    spark.stop()
    # Reclaim temp warehouses orphaned by CRASHED runs (clean exits sweep
    # their own via atexit — session.py's per-process dir, ADVICE r8);
    # this process's own dir goes through its atexit hook.
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.session import (
        sweep_stale_warehouses,
    )

    for d in sweep_stale_warehouses():
        print(f"# swept stale warehouse {d}", file=sys.stderr)
    if errors:
        raise SystemExit(1)  # summary printed, artifacts written — but red


if __name__ == "__main__":
    main()
