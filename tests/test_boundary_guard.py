"""Round-10 guard for the frozen-integer hash-gate boundary risk
(round-9 ADVICE): q228 (lrm), q232 (p_micros) and q233 (term_nano)
freeze ln()/exp() doubles to BIGINT micro/nano units with round(x, 0)
before the cross-engine hash gate. A libm-vs-JVM 1-ulp difference in
ln()/exp() can only flip the rounding if some scaled value sits within
~|x|*1e-15 of a .5 boundary. These tests recompute the RAW (unrounded)
scaled doubles at the gate SFs and assert every value keeps a margin of
at least BOUNDARY_EPS from the nearest half-integer — proving a 1-ulp
divergence cannot flip any frozen value on this data.

The raw expressions below mirror the registered oracles in
plans/data_selection.py (_q228_oracle), plans/modeling.py
(_q232_oracle) and plans/events_analytics.py (_q233_oracle) with the
round()/CAST freeze removed; if a constant changes there, change it
here.
"""

import glob
import math
import os

import duckdb
import pytest

from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.data_selection import (  # noqa: E501
    Q228_BUCKETS,
    Q228_TARGET_LANG,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.events_analytics import (  # noqa: E501
    Q233_BIN_W,
    Q233_NBINS,
)
from aws_autonomous_driving_data_lake_image_extraction_pipeline_from_ros_bagfiles_spark.plans.modeling import (  # noqa: E501
    _ARM_SQL,
    Q232_MIN_N,
)

# a 1-ulp ln()/exp() divergence moves a scaled value by ~|x| * 2.3e-16;
# the largest scaled magnitudes here are ~1e7, so 1e-6 absolute margin
# is ~500x the worst-case 1-ulp shift
BOUNDARY_EPS = 1e-6

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "events"):
        files = sorted(glob.glob(os.path.join(sf_dir, f"{t}*.parquet")))
        assert files, f"missing {t} at {sf_dir}"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet({files!r})"
        )
    return con


def _assert_margin(values, site):
    assert values, f"{site}: raw-value query returned no rows"
    worst = min(abs(v - math.floor(v) - 0.5) for v in values)
    assert worst > BOUNDARY_EPS, (
        f"{site}: a frozen value sits {worst:.2e} from a .5 rounding "
        f"boundary — cross-engine 1-ulp libm divergence could flip the "
        f"hash gate; apply the q231 rounded-average treatment here"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q228_lrm_boundary_margin(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(f"""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w
               FROM documents),
    tok AS (SELECT doc_id, lang, unnest(w) AS t,
                   generate_subscripts(w, 1) AS pos
            FROM d),
    feats AS (
      SELECT doc_id, lang, 'u ' || t AS f FROM tok
      UNION ALL
      SELECT doc_id, lang, 'b ' || t || ' ' ||
             lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS f
      FROM tok
      QUALIFY lead(t) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
    ),
    fb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(f), 1, 8))::BIGINT % {Q228_BUCKETS} AS b
      FROM feats
    ),
    rawc AS (SELECT b, count(*) AS cr FROM fb GROUP BY 1),
    tgtc AS (SELECT b, count(*) AS ct FROM fb
             WHERE lang = '{Q228_TARGET_LANG}' GROUP BY 1),
    tots AS (
      SELECT count(*) AS tr,
             count(*) FILTER (lang = '{Q228_TARGET_LANG}') AS tt
      FROM fb
    )
    SELECT ln(
             (coalesce(t.ct, 0) + 1) * 1.0 * (tots.tr + {Q228_BUCKETS})
             / ((r.cr + 1) * 1.0 * (tots.tt + {Q228_BUCKETS}))
           ) * 1000000 AS raw
    FROM rawc r LEFT JOIN tgtc t USING (b) CROSS JOIN tots
    """).fetchall()
    _assert_margin([r[0] for r in rows], f"q228 lrm @ {sf_dir}")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q232_p_micros_boundary_margin(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(f"""
    WITH seg AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) % 7 AS dow,
             {_ARM_SQL} AS arm,
             value
      FROM events
    ),
    stats AS (
      SELECT event_type, dow, arm, count(*) AS n,
             count(DISTINCT value) AS nd, avg(value) AS mean,
             var_pop(value) AS v
      FROM seg GROUP BY 1, 2, 3
    ),
    wide AS (
      SELECT event_type, dow,
             max(CASE WHEN arm = 'control' THEN n END) AS nc,
             max(CASE WHEN arm = 'control' THEN mean END) AS mc,
             max(CASE WHEN arm = 'control' THEN v END) AS vc,
             max(CASE WHEN arm = 'treatment' THEN n END) AS nt,
             max(CASE WHEN arm = 'treatment' THEN mean END) AS mt,
             max(CASE WHEN arm = 'treatment' THEN v END) AS vt
      FROM stats GROUP BY 1, 2
      HAVING min(n) >= {Q232_MIN_N} AND count(*) = 2 AND min(nd) >= 2
    )
    SELECT exp(-abs(round((mt - mc) / sqrt(vc / nc + vt / nt), 4)))
           * 1000000 AS raw,
           (mt - mc) / sqrt(vc / nc + vt / nt) * 10000 AS raw_z
    FROM wide WHERE vc > 0 AND vt > 0
    """).fetchall()
    _assert_margin([r[0] for r in rows], f"q232 p_micros @ {sf_dir}")
    # round-10 ADVICE follow-up: z_stat itself is frozen with
    # round(x, 4) before the gate; var_pop's partition-order float sum
    # can differ across engines by ~n ulps, so the scaled raw z must
    # also keep margin from every .5 boundary
    _assert_margin([r[1] for r in rows], f"q232 raw_z @ {sf_dir}")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_q233_term_nano_boundary_margin(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(f"""
    WITH ev AS (
      SELECT event_type, value,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
      FROM events
    ),
    split AS (
      SELECT (min(day) + max(day)) // 2 AS mid FROM ev
    ),
    binned AS (
      SELECT event_type,
             CASE WHEN ev.day <= split.mid THEN 'ref' ELSE 'cur' END AS win,
             greatest(0, least(CAST(floor(value / {Q233_BIN_W}) AS BIGINT),
                               {Q233_NBINS - 1})) AS bin
      FROM ev CROSS JOIN split
    ),
    cnt AS (
      SELECT event_type, win, bin, count(*) AS c FROM binned GROUP BY 1, 2, 3
    ),
    tots AS (
      SELECT event_type,
             sum(CASE WHEN win = 'ref' THEN c ELSE 0 END) AS nr,
             sum(CASE WHEN win = 'cur' THEN c ELSE 0 END) AS nc
      FROM cnt GROUP BY 1
    ),
    dom AS (
      SELECT t.event_type, t.nr, t.nc, g.bin
      FROM tots t,
           (SELECT unnest(generate_series(0, {Q233_NBINS - 1})) AS bin) g
    )
    SELECT (((coalesce(c2.c, 0) + 1) * 1.0 / (d.nc + {Q233_NBINS}))
            - ((coalesce(c1.c, 0) + 1) * 1.0 / (d.nr + {Q233_NBINS})))
           * ln(((coalesce(c2.c, 0) + 1) * 1.0 * (d.nr + {Q233_NBINS}))
                / (((coalesce(c1.c, 0) + 1)) * 1.0 * (d.nc + {Q233_NBINS})))
           * 1000000000 AS raw
    FROM dom d
    LEFT JOIN cnt c1 ON c1.event_type = d.event_type AND c1.bin = d.bin
                     AND c1.win = 'ref'
    LEFT JOIN cnt c2 ON c2.event_type = d.event_type AND c2.bin = d.bin
                     AND c2.win = 'cur'
    """).fetchall()
    _assert_margin([r[0] for r in rows], f"q233 term_nano @ {sf_dir}")
