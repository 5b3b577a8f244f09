"""Iceberg REST catalog server (serving/rest_catalog.py): the public
catalog load surface (the vendor-neutral analog of the reference's
Glue catalog loads, offline_store_spark_runner.py:965-980) served
sessionless over protocol-table directories — discovery endpoints +
LoadTableResult whose metadata a client can scan from directly."""

import json
import os
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from featureform_spark.serving.rest_catalog import IcebergRestCatalogServer
from featureform_spark.sources.iceberg_protocol import IcebergProtocolTable


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@pytest.fixture(scope="module")
def catalog(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("rest_catalog")
    ns = root / "analytics"
    ns.mkdir()
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(ns / "orders"))
    t.create(orders.limit(300).repartition(2))
    t.delete_rows(F.col("o_orderkey") % 5 == 0)
    (ns / "not_a_table").mkdir()  # ignored: no metadata dir
    server = IcebergRestCatalogServer(str(root))
    yield server, t
    server.shutdown()


def _get(server, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}{path}"
    ) as r:
        return json.loads(r.read())


def test_discovery_endpoints(catalog):
    server, _t = catalog
    assert _get(server, "/v1/config") == {"defaults": {}, "overrides": {}}
    assert ["analytics"] in _get(server, "/v1/namespaces")["namespaces"]
    idents = _get(server, "/v1/namespaces/analytics/tables")["identifiers"]
    assert idents == [{"namespace": ["analytics"], "name": "orders"}]


def test_load_table_result_scans(catalog, spark):
    server, t = catalog
    res = _get(server, "/v1/namespaces/analytics/tables/orders")
    assert os.path.isfile(res["metadata-location"])
    md = res["metadata"]
    assert md["format-version"] == 2
    # a catalog client can scan straight from the returned metadata:
    # the location field addresses the same table this engine wrote
    t2 = IcebergProtocolTable(spark, md["location"])
    assert sorted(map(tuple, t2.snapshot().collect())) == sorted(
        map(tuple, t.snapshot().collect())
    )
    # metadata-location matches the table's current metadata file
    assert res["metadata-location"] == t._current_metadata_file()


def test_head_and_errors(catalog):
    server, _t = catalog
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/namespaces/analytics/tables/orders",
        method="HEAD",
    )
    assert urllib.request.urlopen(req).status == 200
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/v1/namespaces/analytics/tables/nope")
    assert ei.value.code == 404
    body = json.loads(ei.value.read())
    assert body["error"]["code"] == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/v1/namespaces/ghost/tables")
    assert ei.value.code == 404


def test_path_traversal_refuses(catalog, tmp_path):
    """ns/name come straight off the URL: '..' components must not
    address tables outside the catalog root (ADVICE r6). The raw
    request is sent over a socket — urllib would normalize the
    dot-segments client-side."""
    import http.client

    server, _t = catalog
    # a real iceberg table OUTSIDE the catalog root
    outside = tmp_path / "outside_tbl"
    (outside / "metadata").mkdir(parents=True)
    (outside / "metadata" / "v1.metadata.json").write_text("{}")
    for raw in (
        "/v1/namespaces/../tables/outside_tbl",
        "/v1/namespaces/..%2F..%2Ftmp/tables/x",
        "/v1/namespaces/../tables",
    ):
        conn = http.client.HTTPConnection("127.0.0.1", server.port)
        try:
            conn.request("GET", raw)
            assert conn.getresponse().status in (400, 404)
        finally:
            conn.close()
