"""Cross-engine differential tests for the in-repo table-format
implementations (delta_protocol / iceberg_protocol).

The one proof the protocol writers still lack is an INDEPENDENT reader
consuming their output. Candidate engines, re-attempted every round:

- ``delta-spark`` (pip): blocked — the sandbox has no network
  (``pip install delta-spark`` → "Name or service not known" against
  the pypi mirror; re-confirmed round 4, 2026-08-14).
- DuckDB's ``delta`` extension: blocked — ``INSTALL delta`` needs
  http://extensions.duckdb.org, same no-network wall (re-confirmed
  round 4).

When either ever lands, the suites below run dual-backend
automatically. Until then the protocol implementations are certified by
(a) their own reader + the DuckDB value oracle and (b) byte-level log
shape assertions in test_delta_protocol.py / test_iceberg_protocol.py.
"""

import pytest


def _delta_spark_available():
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _duckdb_delta_available():
    import duckdb

    try:
        con = duckdb.connect()
        con.execute("INSTALL delta; LOAD delta")
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _delta_spark_available(),
    reason="delta-spark not installable: sandbox has no network "
    "(pip -> 'Name or service not known'); re-attempted round 4",
)
def test_delta_spark_reads_protocol_table(spark, sf_dir, tmp_path):
    """Real delta-spark must read a delta_protocol-written table
    (minReader=1/minWriter=2) byte-for-byte."""
    from delta.tables import DeltaTable  # noqa: F401

    from featureform_spark.sources.delta_protocol import DeltaProtocolTable
    from featureform_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    t = DeltaProtocolTable(spark, str(tmp_path / "x"))
    t.create(orders.limit(100), partition_by=["o_orderstatus"])
    got = spark.read.format("delta").load(str(tmp_path / "x"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, t.snapshot().collect())
    )


@pytest.mark.skipif(
    not _duckdb_delta_available(),
    reason="duckdb delta extension not installable: sandbox has no "
    "network (INSTALL delta -> ERROR Connection); re-attempted round 4",
)
def test_duckdb_reads_protocol_table(spark, sf_dir, tmp_path):
    import duckdb

    from featureform_spark.sources.delta_protocol import DeltaProtocolTable
    from featureform_spark.sources.testdata import load_table

    orders = load_table(spark, sf_dir, "orders")
    t = DeltaProtocolTable(spark, str(tmp_path / "y"))
    t.create(orders.limit(100))
    con = duckdb.connect()
    con.execute("LOAD delta")
    n = con.execute(
        f"SELECT count(*) FROM delta_scan('{tmp_path / 'y'}')"
    ).fetchone()[0]
    assert n == 100
