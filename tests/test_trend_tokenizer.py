"""Value tests for the round-4 analytics additions: BPE pair counting
(q118), interpolated bigram LM scoring (q119), grouped OLS trend (q120),
and the calibration reliability table (q124) — each checked against an
independent pure-Python recomputation on real sf0.001 rows (the oracle
SQL already cross-checks DuckDB; these pin the semantics against a third
implementation and against hand constructions).
"""

import math
from collections import Counter

import __spark_entry__ as se

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_pairs_match_python(spark):
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text").collect()
    cnt = Counter()
    for (text,) in rows:
        for w in text.split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    cnt[w[i : i + 2]] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.pair, r.cnt)
        for r in se.queries()["q118_bpe_pairs"](spark, SF_DIR).collect()
    ]
    assert got == expect


def test_bigram_lm_matches_python(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    uni, big, toks = Counter(), Counter(), {}
    for doc_id, text in rows:
        ws = text.split(" ")
        toks[doc_id] = ws
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    total = sum(uni.values())
    lam = 0.7
    scores = {}
    for doc_id, ws in toks.items():
        lps = [
            math.log(lam * big[(a, b)] / uni[a] + (1 - lam) * uni[b] / total)
            for a, b in zip(ws, ws[1:])
        ]
        if lps:
            scores[doc_id] = (len(lps), round(sum(lps) / len(lps), 6))
    expect = sorted(
        ((v[1], k, v[0]) for k, v in scores.items())
    )[:20]
    got = [
        (r.avg_logprob, r.doc_id, r.n_bigrams)
        for r in se.queries()["q119_bigram_lm"](spark, SF_DIR).collect()
    ]
    assert got == expect


def test_ols_trend_recovers_known_line(spark, tmp_path):
    # synthetic exact line y = 3x + 7 (one event per day -> daily sum = y)
    import datetime

    origin = datetime.datetime(2023, 1, 1)
    data = [
        (
            i,
            origin + datetime.timedelta(days=i),
            1,
            "lin",
            3.0 * i + 7.0,
            "{}",
        )
        for i in range(10)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = se.queries()["q120_ols_trend"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 10
    assert abs(r.slope - 3.0) < 1e-9
    assert abs(r.intercept - 7.0) < 1e-9


def test_calibration_bins_partition_docs(spark):
    out = se.queries()["q124_calibration_bins"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in out) == n_docs  # bins partition the corpus
    for r in out:
        lo, hi = r.bin / 10.0, (r.bin + 1) / 10.0
        # mean confidence lies inside its bin (bin 9 also holds score=1.0)
        assert lo <= r.avg_conf <= (hi if r.bin < 9 else 1.0)
        assert 0.0 <= r.frac_pos <= 1.0
