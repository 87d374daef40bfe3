"""Generate a larger-SF copy of the driver's synthetic testdata layout.

The driver ships sf0.001/0.01/0.1 only; the scale audit (VERDICT r3 #7)
needs an sf1.0 datapoint (~6M lineitem) to prove the heavy-query profile
stays orchestration-bound at 10x. This generator synthesizes NEW rows
with the same schema and the same distributions as the driver data —
categorical vocabularies are sampled from the real sf0.1 tables, numeric
ranges and per-order line counts mimic the measured ones — rather than
replicating rows, so dedup/LSH/ANN queries see organic duplicate rates
instead of artificial 10x-copy families.

Usage: python tools/gen_scale.py [sf] [outdir]
       (defaults: 1.0 /tmp/spark_graft_sf1.0)

Output is a directory of one parquet per table, drop-in compatible with
$SPARK_GRAFT_SF_DIR. Nothing under /root/testdata is touched.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
BASE_SF = 0.1


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _distinct(col: str, table: str) -> list:
    import duckdb

    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT {col} FROM '{SRC}/{table}.parquet' ORDER BY 1"
        ).fetchall()
    ]


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_sf{sf}"
    scale = sf / BASE_SF
    rng = np.random.default_rng(42)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(15000 * scale)
    n_supp = int(1000 * scale)
    n_part = int(20000 * scale)
    n_ord = int(150000 * scale)
    n_ev = int(100000 * scale)
    n_doc = int(5000 * scale)
    n_vec = int(2000 * scale)

    # nation/region: fixed dimensions, copied verbatim
    for t in ("nation", "region"):
        shutil.copy(f"{SRC}/{t}.parquet", os.path.join(outdir, f"{t}.parquet"))
        print(f"  {t}: copied")

    # customer / supplier ------------------------------------------------
    segs = np.array(_distinct("c_mktsegment", "customer"))
    _write(outdir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": segs[rng.integers(0, len(segs), n_cust)],
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part ---------------------------------------------------------------
    names = np.array(_distinct("p_name", "part"))
    brands = np.array(_distinct("p_brand", "part"))
    types = np.array(_distinct("p_type", "part"))
    _write(outdir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": names[rng.integers(0, len(names), n_part)],
        "p_brand": brands[rng.integers(0, len(brands), n_part)],
        "p_type": types[rng.integers(0, len(types), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) % 1000 / 10.0, 2),
    }))

    # orders -------------------------------------------------------------
    day_us = 86_400_000_000
    o_date_days = rng.integers(0, 2404, n_ord)  # 1995-01-01 .. 2001-08-01
    epoch_1995 = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_orderdate = (epoch_1995 + o_date_days * day_us).astype("datetime64[us]")
    prios = np.array(_distinct("o_orderpriority", "orders"))
    _write(outdir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": o_orderdate,
        "o_orderpriority": prios[rng.integers(0, len(prios), n_ord)],
    }))

    # lineitem: 1 + Poisson(3) lines per order (measured mean 4.0) -------
    lines = 1 + rng.poisson(3.0, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines)
    n_li = l_orderkey.size
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1
    ).astype(np.int32)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship = np.repeat(o_orderdate.astype(np.int64), lines) + rng.integers(
        1, 96, n_li
    ) * day_us
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": l_linenumber,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship.astype("datetime64[us]"),
    }))

    # events -------------------------------------------------------------
    ev_types = np.array(_distinct("event_type", "events"))
    epoch_2024 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = epoch_2024 + rng.integers(0, 30 * day_us, n_ev, dtype=np.int64)
    _write(outdir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": np.sort(ts).astype("datetime64[us]"),
        "user_id": rng.integers(0, int(1500 * scale), n_ev),
        "event_type": ev_types[rng.integers(0, len(ev_types), n_ev)],
        "value": np.round(rng.exponential(90.0, n_ev).clip(0, 560), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: same word vocabulary, length range, lang mix ------------
    import duckdb

    vocab = np.array(sorted({
        w
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SRC}/documents.parquet'"
        ).fetchall()
        for w in t.split()
    }))
    langs = np.array(["en", "de", "fr", "zh", "es"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    n_words = rng.integers(8, 100, n_doc)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in n_words
    ]
    _write(outdir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs[rng.choice(len(langs), n_doc, p=lang_p)],
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)
        ],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 10 clusters on the unit sphere, like the original -----
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, 10, n_vec)
    vecs = centers[label] + rng.normal(0, 0.3, (n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": np.arange(n_vec, dtype=np.int64),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)], type=pa.list_(pa.float32())
        ),
        "label": label.astype(np.int32),
    }))
    print(f"done -> {outdir}")


if __name__ == "__main__":
    main()
