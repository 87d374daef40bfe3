"""Semantic pins for the data-selection tier (q227-q231).

The registry oracles hash-check these against DuckDB at sf0.01/sf0.1;
these tests pin the algorithmic GUARANTEES on fixtures where the expected
answer is derivable by hand — the winnowing detection guarantee, DSIR's
target preference, LPA's seed clamp, the k-center monotone radius, and
the tercile arithmetic.
"""

import pytest
from pyspark.sql import functions as F

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.data_selection import (
    Q227_K,
    Q227_W,
    Q228_KEEP_FRAC,
    Q228_TARGET_LANG,
    Q229_SEED_MOD,
    Q230_T,
    q228_dsir_selection,
    q229_label_propagation,
    q230_kcenter_coreset,
    q231_ppl_buckets,
    winnowing_fingerprints,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- q227


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_detection_guarantee(spark):
    # Schleimer et al. guarantee: any shared token run of length
    # >= W + K - 1 produces at least one SHARED fingerprint, regardless
    # of surrounding context.
    shared = " ".join(f"s{i}" for i in range(Q227_W + Q227_K - 1))
    a = "alpha beta gamma " + shared + " delta epsilon zeta"
    b = "one two three four five " + shared + " six seven"
    rows = winnowing_fingerprints(_docs(spark, [(1, a), (2, b)])).collect()
    d1 = {r["fp_h"] for r in rows if r["doc_id"] == 1}
    d2 = {r["fp_h"] for r in rows if r["doc_id"] == 2}
    assert d1 & d2, "shared run of W+K-1 tokens must share a fingerprint"


def test_winnowing_short_doc_single_window(spark):
    # A doc shorter than W grams still emits exactly one fingerprint
    # (the whole-doc window minimum).
    text = " ".join(f"t{i}" for i in range(Q227_K + 1))  # 2 grams < W
    fps = winnowing_fingerprints(_docs(spark, [(7, text)])).collect()
    assert len(fps) == 1 and fps[0]["doc_id"] == 7


def test_winnowing_density_bound(spark):
    # At most one fingerprint per window start: fingerprint count is
    # bounded by the number of windows (and at least 1 per W-run).
    text = " ".join(f"w{i % 17}" for i in range(60))
    fps = winnowing_fingerprints(_docs(spark, [(3, text)])).collect()
    n_grams = 60 - (Q227_K - 1)
    n_windows = n_grams - (Q227_W - 1)
    assert 1 <= len(fps) <= n_windows


# ---------------------------------------------------------------- q228


def test_dsir_selects_exact_fraction_and_prefers_target(spark):
    import math

    out = q228_dsir_selection(spark, SF_DIR).collect()
    n = len(out)
    n_sel = sum(1 for r in out if r["selected"])
    assert n_sel == math.ceil(n * Q228_KEEP_FRAC)
    # docs in the target language should carry higher importance weight
    # on average than the rest (their features define the target dist)
    docs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    tgt = [r["weight"] for r in out if docs[r["doc_id"]] == Q228_TARGET_LANG]
    oth = [r["weight"] for r in out if docs[r["doc_id"]] != Q228_TARGET_LANG]
    assert sum(tgt) / len(tgt) > sum(oth) / len(oth)


# ---------------------------------------------------------------- q229


def test_lpa_seeds_clamped_and_labels_from_seed_set(spark):
    out = {r["vec_id"]: r for r in q229_label_propagation(spark, SF_DIR).collect()}
    src = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    seed_labels = {
        src[vid] for vid in out if vid % Q229_SEED_MOD == 0
    }
    for vid, r in out.items():
        if vid % Q229_SEED_MOD == 0:
            assert r["seeded"] and r["final_label"] == src[vid]
        else:
            assert not r["seeded"]
            # a propagated label must originate from some seed
            if r["final_label"] is not None:
                assert r["final_label"] in seed_labels


# ---------------------------------------------------------------- q230


def test_kcenter_monotone_radius_and_distinct(spark):
    rows = sorted(
        q230_kcenter_coreset(spark, SF_DIR).collect(),
        key=lambda r: r["sel_order"],
    )
    assert [r["sel_order"] for r in rows] == list(range(1, Q230_T + 1))
    assert len({r["vec_id"] for r in rows}) == Q230_T
    assert rows[0]["dist_q"] is None
    dists = [r["dist_q"] for r in rows[1:]]
    # farthest-point invariant: the selection radius never increases
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert all(d > 0 for d in dists)


# ---------------------------------------------------------------- q231


def test_ppl_tercile_arithmetic(spark):
    out = q231_ppl_buckets(spark, SF_DIR).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        n = len(rows)
        heads = sum(1 for r in rows if r["bucket"] == "head")
        mids = sum(1 for r in rows if r["bucket"] == "middle")
        assert heads == n // 3
        assert heads + mids == (2 * n) // 3
        # every score is finite (OOV smoothing is total)
        assert all(r["avg_logprob"] is not None for r in rows)


# ---------------------------------------------------------------- q232


def test_bh_step_up_properties(spark):
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (
        Q232_ALPHA,
        q232_fdr_bh,
    )

    rows = sorted(q232_fdr_bh(spark, SF_DIR).collect(), key=lambda r: r["rn"])
    m = len(rows)
    # discoveries are exactly the prefix ranks 1..k*
    flags = [r["discovery"] for r in rows]
    k = sum(flags)
    assert flags == [True] * k + [False] * (m - k)
    # every discovered rank satisfies the BH condition at k* — checked
    # in the same integer form the query uses (p is exact micros)
    if k:
        assert round(rows[k - 1]["p_value"] * 1_000_000) * m <= k * 100_000
    # p-values arrive sorted by rank
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)


# ---------------------------------------------------------------- q233


def test_psi_zero_for_identical_windows(spark, tmp_path):
    # PSI of a distribution against itself is EXACTLY 0 under the
    # smoothed estimator: craft a stream whose ref and cur halves hold
    # identical value multisets, so every bin ratio is 1 and every
    # ln-term is 0 before quantization — any symmetry break in the
    # estimator (e.g. swapped nr/nc in one leg) turns this nonzero.
    import datetime

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q233_psi_drift,
    )

    vals = [3.0, 27.5, 51.0, 51.0, 240.0, 9.99]
    rows = []
    eid = 0
    for day, base in ((1, datetime.datetime(2024, 1, 1)),
                      (11, datetime.datetime(2024, 1, 11))):
        for v in vals:
            eid += 1
            rows.append((eid, base, eid, "click", v, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    out = q233_psi_drift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["psi"] == 0.0
    assert r["n_ref"] == len(vals) and r["n_cur"] == len(vals)


def test_psi_detects_shift(spark, tmp_path):
    # moving the current window's mass into a different bin must yield
    # a strictly positive PSI
    import datetime

    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (
        q233_psi_drift,
    )

    rows = []
    eid = 0
    for v in [3.0] * 6:
        eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 1), eid, "click", v, "{}"))
    for v in [240.0] * 6:
        eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 11), eid, "click", v, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    ev.write.parquet(f"{tmp_path}/events.parquet")
    out = q233_psi_drift(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["psi"] > 1.0


def test_kcenter_stops_on_degenerate_corpus(spark, tmp_path):
    # 3 distinct points (plus exact duplicates): the greedy loop must
    # stop after 3 selections — mirroring the oracle, whose c{t} CTEs
    # go empty once no positive-distance candidate remains.
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.data_selection import (
        q230_kcenter_coreset,
    )

    def pad(v):
        return v + [0.0] * 62

    rows = [
        (1, pad([0.0, 0.0])),
        (2, pad([0.0, 0.0])),
        (3, pad([1.0, 0.0])),
        (4, pad([1.0, 0.0])),
        (5, pad([0.0, 1.0])),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).withColumn("label", F.lit(0))
    emb.write.parquet(f"{tmp_path}/embeddings.parquet")
    out = sorted(
        q230_kcenter_coreset(spark, str(tmp_path)).collect(),
        key=lambda r: r["sel_order"],
    )
    assert len(out) == 3
    assert len({r["vec_id"] for r in out}) == 3


# ---------------------------------------------------------------- q236
def test_stratified_kfold_balance(spark):
    """Every stratum's fold sizes differ by at most 1 (the property a
    plain hash-mod split does NOT have), and the assignment is
    deterministic across invocations."""
    from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.data_selection import (
        Q236_K,
        q236_stratified_kfold,
    )

    out = q236_stratified_kfold(spark, SF_DIR)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, {}).setdefault(r.fold, 0)
        per[r.lang][r.fold] += 1
    for lang, folds in per.items():
        sizes = [folds.get(k, 0) for k in range(Q236_K)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    again = {(r.doc_id, r.fold) for r in q236_stratified_kfold(spark, SF_DIR).collect()}
    assert again == {(r.doc_id, r.fold) for r in rows}
