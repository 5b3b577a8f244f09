"""Feature drift monitoring (functions/drift.py): hand-computed
histograms, PSI properties, a DuckDB differential on the bin counts
(the hash-compared surface), and a pytest-pinned PSI score."""

import math

import duckdb
import pytest

from featureform_spark.functions.drift import (
    drift_report,
    histogram_compare,
    psi,
)


def _frames(spark):
    ref = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "x double"
    )
    # shifted + nulls + out-of-range: all three drift modes at once
    cur_rows = [(float(i % 10) + 3.0,) for i in range(80)]
    cur_rows += [(None,)] * 10 + [(99.0,)] * 10
    cur = spark.createDataFrame(cur_rows, "x double")
    return ref, cur


def test_histogram_bins_and_edges(spark):
    ref, cur = _frames(spark)
    rows = {
        r["bin"]: (r["ref_count"], r["cur_count"])
        for r in histogram_compare(ref, cur, ["x"], bins=5).collect()
    }
    # ref: values 0..9 over [0,9], width 1.8 -> 10 per value, 2 values
    # per bin except the last (9 clamps into bin 4)
    assert sum(v[0] for v in rows.values()) == 100
    assert sum(v[1] for v in rows.values()) == 100
    assert rows[-1] == (0, 10)          # NULL bin counts drift-to-null
    assert rows[4][1] >= 10             # out-of-range clamps into edge
    assert rows[0][1] == 0              # shifted away from low bins


def test_psi_properties():
    same = [(50, 50), (30, 30), (20, 20)]
    assert psi(same) == pytest.approx(0.0, abs=1e-12)
    shifted = [(50, 5), (30, 30), (20, 65)]
    assert psi(shifted) > 0.25
    # symmetric-ish: swapping frames keeps the magnitude
    swapped = [(c, r) for r, c in shifted]
    assert psi(swapped) == pytest.approx(psi(shifted), rel=1e-9)
    with pytest.raises(ValueError, match="empty"):
        psi([(0, 0)])


def test_drift_report_flags_the_drifted_feature(spark):
    ref, cur = _frames(spark)
    ref2 = ref.withColumnRenamed("x", "a").crossJoin(
        spark.createDataFrame([(1.0,)], "b double")
    )
    cur2 = cur.withColumnRenamed("x", "a").crossJoin(
        spark.createDataFrame([(1.0,)], "b double")
    )
    rep = drift_report(ref2, cur2, ["a", "b"], bins=5)
    assert rep["a"] > 0.25          # drifted
    assert rep["b"] == pytest.approx(0.0, abs=1e-12)  # constant


def test_histogram_duckdb_differential(spark):
    """The hash-compared surface: integer bin counts must match a
    DuckDB re-derivation of the same fixed-width binning exactly."""
    ref, cur = _frames(spark)
    got = sorted(
        (r["bin"], r["ref_count"], r["cur_count"])
        for r in histogram_compare(ref, cur, ["x"], bins=5).collect()
    )
    con = duckdb.connect()
    ref_vals = [r["x"] for r in ref.collect()]
    cur_vals = [r["x"] for r in cur.collect()]
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ", ".join(f"({v})" for v in ref_vals) + ") t(x)"
    )
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ", ".join("(NULL)" if v is None else f"({v})" for v in cur_vals)
        + ") t(x)"
    )
    mn, mx = con.execute("SELECT MIN(x), MAX(x) FROM r").fetchone()
    width = (mx - mn) / 5
    bin_sql = (
        f"CASE WHEN x IS NULL THEN -1 ELSE "
        f"LEAST(GREATEST(FLOOR((x - {mn}) / {width}), 0), 4)::BIGINT END"
    )
    want = sorted(
        (int(b), int(rc), int(cc))
        for b, rc, cc in con.execute(
            f"""
            WITH rb AS (SELECT {bin_sql} AS bin, count(*) AS n
                        FROM r GROUP BY 1),
            cb AS (SELECT {bin_sql} AS bin, count(*) AS n
                   FROM c GROUP BY 1)
            SELECT COALESCE(rb.bin, cb.bin) AS bin,
                   COALESCE(rb.n, 0), COALESCE(cb.n, 0)
            FROM rb FULL OUTER JOIN cb ON rb.bin = cb.bin
            """
        ).fetchall()
    )
    assert got == want


def test_validation(spark):
    ref, cur = _frames(spark)
    with pytest.raises(ValueError, match="no feature columns"):
        histogram_compare(ref, cur, [])
    with pytest.raises(ValueError, match="bins"):
        histogram_compare(ref, cur, ["x"], bins=1)
    allnull = spark.createDataFrame([(None,)], "x double")
    with pytest.raises(ValueError, match="no \\(non-NULL, non-NaN\\)|non-NaN"):
        histogram_compare(allnull, cur, ["x"])
