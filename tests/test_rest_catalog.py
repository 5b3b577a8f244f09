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


# ---------------------------------------------------------------------------
# commit endpoint (CommitTableRequest: requirements + updates, CAS)
# ---------------------------------------------------------------------------


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_commit_set_properties_round_trip(catalog):
    server, t = catalog
    md0 = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {
            "requirements": [
                {"type": "assert-table-uuid", "uuid": md0["table-uuid"]}
            ],
            "updates": [
                {"action": "set-properties",
                 "updates": {"owner": "etl", "comment": "via rest"}},
            ],
        },
    )
    assert code == 200, res
    assert res["metadata"]["properties"]["owner"] == "etl"
    # durable: a fresh load sees the committed version
    md1 = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    assert md1["properties"]["comment"] == "via rest"
    # the superseded metadata file is recorded in the metadata-log
    assert md1["metadata-log"][-1]["metadata-file"].endswith(
        ".metadata.json"
    )
    # remove-properties round-trip
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [
            {"action": "remove-properties", "removals": ["comment"]}]},
    )
    assert code == 200
    assert "comment" not in res["metadata"]["properties"]


def test_commit_add_snapshot_and_set_ref(catalog, spark):
    """Metadata-only snapshot commit (the rollback/cherry-pick shape):
    add-snapshot pointing at an existing manifest list + set-snapshot-ref
    main, guarded by assert-ref-snapshot-id. Scans keep working; the
    snapshot log grows."""
    server, t = catalog
    md0 = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    cur = md0["current-snapshot-id"]
    snap0 = next(
        s for s in md0["snapshots"] if s["snapshot-id"] == cur
    )
    new_id = cur + 1
    snap = dict(
        snap0,
        **{
            "snapshot-id": new_id,
            "parent-snapshot-id": cur,
            "sequence-number": int(md0["last-sequence-number"]) + 1,
            "summary": {"operation": "append", "added-data-files": "0",
                        "added-records": "0"},
        },
    )
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {
            "requirements": [
                {"type": "assert-ref-snapshot-id", "ref": "main",
                 "snapshot-id": cur},
            ],
            "updates": [
                {"action": "add-snapshot", "snapshot": snap},
                {"action": "set-snapshot-ref", "ref-name": "main",
                 "type": "branch", "snapshot-id": new_id},
            ],
        },
    )
    assert code == 200, res
    md1 = res["metadata"]
    assert md1["current-snapshot-id"] == new_id
    assert md1["snapshot-log"][-1]["snapshot-id"] == new_id
    assert int(md1["last-sequence-number"]) == snap["sequence-number"]
    # the table still scans (same manifest list) through the protocol
    n = t.snapshot().count()
    assert n > 0
    # stale CAS: the same requirement now fails with the spec's 409
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {
            "requirements": [
                {"type": "assert-ref-snapshot-id", "ref": "main",
                 "snapshot-id": cur},
            ],
            "updates": [
                {"action": "set-properties", "updates": {"x": "y"}},
            ],
        },
    )
    assert code == 409
    assert res["error"]["type"] == "CommitFailedException"
    # the failed commit left no new metadata version behind
    md2 = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    assert "x" not in (md2.get("properties") or {})


def test_commit_concurrent_version_conflict(catalog, monkeypatch):
    """A committer that lands between the server's metadata fold and
    its link(2) wins the O_EXCL race: the REST commit must observe
    FileExistsError and return the spec's 409, not overwrite. The race
    window is forced by having the winner commit (a valid no-op
    version) right before the server's own link."""
    import featureform_spark.sources.iceberg_protocol as ip

    server, t = catalog
    orig = ip.IcebergProtocolTable._commit_metadata

    def racing(self, md, version):
        target = os.path.join(
            self.metadata_path, f"v{version}.metadata.json"
        )
        if not os.path.exists(target):  # the concurrent winner
            with open(target, "w") as f:
                json.dump(t.metadata(), f)
        return orig(self, md, version)

    monkeypatch.setattr(ip.IcebergProtocolTable, "_commit_metadata", racing)
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [
            {"action": "set-properties", "updates": {"z": "1"}}]},
    )
    assert code == 409
    assert res["error"]["type"] == "CommitFailedException"
    # the lost commit's properties never landed
    md = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    assert "z" not in (md.get("properties") or {})


def test_commit_bad_requests(catalog):
    server, _t = catalog
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [{"action": "no-such-action"}]},
    )
    assert code == 400
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [{"action": "set-snapshot-ref", "ref-name": "main",
                      "type": "branch", "snapshot-id": 999999}]},
    )
    assert code == 400  # unknown snapshot id
    code, _res = _post(
        server, "/v1/namespaces/analytics/tables/nope", {"updates": []}
    )
    assert code == 404


def test_commit_ignores_lagging_version_hint(catalog):
    """The hint is written AFTER the O_EXCL link and can lag a version;
    a commit based on the hint-preferred file would build v(max+1)
    from v(max-1), silently dropping the newest commit (review r7).
    The endpoint must base requirements AND the new metadata on the
    highest version file."""
    server, t = catalog
    files = sorted(t._metadata_files())
    cur_version, fname = files[-1]
    with open(os.path.join(t.metadata_path, fname)) as f:
        latest_md = json.load(f)
    hint = os.path.join(t.metadata_path, "version-hint.text")
    with open(hint) as f:
        orig_hint = f.read()
    with open(hint, "w") as f:
        f.write(str(max(1, cur_version - 1)))  # lagging hint
    try:
        code, res = _post(
            server,
            "/v1/namespaces/analytics/tables/orders",
            {
                "requirements": [
                    # asserts against the LATEST metadata, which the
                    # lagging hint does not point at
                    {"type": "assert-ref-snapshot-id", "ref": "main",
                     "snapshot-id": latest_md["current-snapshot-id"]},
                ],
                "updates": [
                    {"action": "set-properties",
                     "updates": {"hint_lag": "ok"}}],
            },
        )
        assert code == 200, res
        # committed version builds on max, not hint
        assert res["metadata-location"].endswith(
            f"v{cur_version + 1}.metadata.json"
        )
        assert res["metadata"]["current-snapshot-id"] == (
            latest_md["current-snapshot-id"]
        )
    finally:
        with open(hint, "w") as f:
            f.write(orig_hint)


def test_create_table_then_ingest_and_commit(catalog, spark):
    """Spec CreateTableRequest: an external engine creates an empty
    table through the catalog, appends through the sessionless arrow
    writer, commits properties through the commit endpoint, and the
    result scans from Spark."""
    import pyarrow as pa

    server, _t = catalog
    schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "double"},
        ],
    }
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables",
        {"name": "created_via_rest", "schema": schema,
         "properties": {"owner": "ext"}},
    )
    assert code == 200, res
    md = res["metadata"]
    assert md["current-snapshot-id"] == -1 and md["snapshots"] == []
    # discoverable + loadable
    idents = _get(server, "/v1/namespaces/analytics/tables")["identifiers"]
    assert {"namespace": ["analytics"], "name": "created_via_rest"} in idents
    # duplicate create -> 409 AlreadyExists
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables",
        {"name": "created_via_rest", "schema": schema},
    )
    assert code == 409 and res["error"]["type"] == "AlreadyExistsException"
    # sessionless ingest into the created table
    t = IcebergProtocolTable(spark, md["location"])
    data = pa.table({"k": [1, 2, 3], "v": [1.5, 2.5, 3.5]})
    t.append_arrow(data.to_reader())
    assert sorted(map(tuple, t.snapshot().collect())) == [
        (1, 1.5), (2, 2.5), (3, 3.5)
    ]
    # commit endpoint works on the created table
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/created_via_rest",
        {"updates": [{"action": "set-properties",
                      "updates": {"stage": "live"}}]},
    )
    assert code == 200
    assert res["metadata"]["properties"]["stage"] == "live"
    # invalid requests
    code, _ = _post(
        server, "/v1/namespaces/analytics/tables", {"name": "x"}
    )
    assert code == 400  # no schema
    code, _ = _post(
        server, "/v1/namespaces/ghost/tables",
        {"name": "x", "schema": schema},
    )
    assert code == 404  # unknown namespace
    code, _ = _post(
        server,
        "/v1/namespaces/analytics/tables",
        {"name": "p", "schema": schema,
         "partition-spec": {"fields": [{"name": "k"}]}},
    )
    assert code == 400  # partitioned create gated


def test_create_table_malformed_and_nested_names(catalog):
    """Review r7: malformed CreateTableRequests must 400 cleanly (they
    previously killed the connection) and slash-names must be rejected
    (they created tables no route could ever address)."""
    server, _t = catalog
    good_schema = {
        "fields": [{"id": 1, "name": "k", "required": False,
                    "type": "long"}]
    }
    bad = [
        {"name": "m1", "schema": {"fields": [{"name": "k"}]}},  # no id
        {"name": "m2", "schema": good_schema, "partition-spec": None},
        {"name": 5, "schema": good_schema},                     # non-str
        {"name": "m3", "schema": {"fields": "abc"}},
        {"name": "m4", "schema": {"fields": [], "schema-id": "x"}},
        {"name": "", "schema": good_schema},
    ]
    for payload in bad:
        code, res = _post(
            server, "/v1/namespaces/analytics/tables", payload
        )
        # partition-spec None is VALID (absent); everything else 400
        if payload.get("name") == "m2":
            assert code == 200, res
        else:
            assert code == 400, (payload, res)
    code, _res = _post(
        server,
        "/v1/namespaces/analytics/tables",
        {"name": "sub/nested", "schema": good_schema},
    )
    assert code == 400
    # a crashed create (bare metadata dir, no versions) must not brick
    # the name
    import pathlib

    ns_dir = pathlib.Path(
        _get(server, "/v1/namespaces/analytics/tables/orders")[
            "metadata"
        ]["location"]
    ).parent
    (ns_dir / "half_created" / "metadata").mkdir(parents=True)
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables",
        {"name": "half_created", "schema": good_schema},
    )
    assert code == 200, res


@pytest.fixture()
def two_table_catalog(spark, sf_dir, tmp_path):
    root = tmp_path / "txn_catalog"
    ns = root / "analytics"
    ns.mkdir(parents=True)
    orders = _orders(spark, sf_dir)
    ta = IcebergProtocolTable(spark, str(ns / "ta"))
    ta.create(orders.limit(50))
    tb = IcebergProtocolTable(spark, str(ns / "tb"))
    tb.create(orders.limit(50))
    server = IcebergRestCatalogServer(str(root))
    yield server, ta, tb
    server.shutdown()


def _txn(server, changes):
    return _post(server, "/v1/transactions/commit",
                 {"table-changes": changes})


def _ident(name):
    return {"identifier": {"namespace": ["analytics"], "name": name}}


def test_transaction_two_table_atomic_commit(two_table_catalog):
    """Spec /v1/transactions/commit: one request commits BOTH tables
    (each through its own O_EXCL metadata version) and a fresh load of
    either sees its update."""
    server, ta, tb = two_table_catalog
    uuid_a = _get(server, "/v1/namespaces/analytics/tables/ta")[
        "metadata"]["table-uuid"]
    uuid_b = _get(server, "/v1/namespaces/analytics/tables/tb")[
        "metadata"]["table-uuid"]
    code, res = _txn(server, [
        dict(_ident("ta"),
             requirements=[{"type": "assert-table-uuid", "uuid": uuid_a}],
             updates=[{"action": "set-properties",
                       "updates": {"stage": "gold"}}]),
        dict(_ident("tb"),
             requirements=[{"type": "assert-table-uuid", "uuid": uuid_b}],
             updates=[{"action": "set-properties",
                       "updates": {"stage": "silver"}}]),
    ])
    assert code == 200, res
    md_a = _get(server, "/v1/namespaces/analytics/tables/ta")["metadata"]
    md_b = _get(server, "/v1/namespaces/analytics/tables/tb")["metadata"]
    assert md_a["properties"]["stage"] == "gold"
    assert md_b["properties"]["stage"] == "silver"


def test_transaction_stale_requirement_aborts_both(two_table_catalog):
    """A failed requirement on EITHER table aborts the whole
    transaction with 409 and neither table changes — even when the
    failing table is listed second."""
    server, ta, tb = two_table_catalog
    uuid_a = _get(server, "/v1/namespaces/analytics/tables/ta")[
        "metadata"]["table-uuid"]
    v_a = ta._current_metadata_file()
    v_b = tb._current_metadata_file()
    code, res = _txn(server, [
        dict(_ident("ta"),
             requirements=[{"type": "assert-table-uuid", "uuid": uuid_a}],
             updates=[{"action": "set-properties",
                       "updates": {"stage": "gold"}}]),
        dict(_ident("tb"),
             requirements=[{"type": "assert-table-uuid",
                            "uuid": "00000000-0000-0000-0000-000000000000"}],
             updates=[{"action": "set-properties",
                       "updates": {"stage": "silver"}}]),
    ])
    assert code == 409
    assert "aborted" in res["error"]["message"]
    assert res["error"]["type"] == "CommitFailedException"
    # nothing moved: same terminal metadata files, no properties
    assert ta._current_metadata_file() == v_a
    assert tb._current_metadata_file() == v_b
    md_a = _get(server, "/v1/namespaces/analytics/tables/ta")["metadata"]
    assert "stage" not in (md_a.get("properties") or {})
    # failing table FIRST aborts identically
    code, _ = _txn(server, [
        dict(_ident("tb"),
             requirements=[{"type": "assert-table-uuid",
                            "uuid": "00000000-0000-0000-0000-000000000000"}],
             updates=[]),
        dict(_ident("ta"), updates=[{"action": "set-properties",
                                     "updates": {"stage": "gold"}}]),
    ])
    assert code == 409
    assert ta._current_metadata_file() == v_a


def test_transaction_mid_commit_race_rolls_back(two_table_catalog, monkeypatch):
    """A direct committer winning the O_EXCL race on the SECOND table
    mid-transaction rolls back the first table's already-linked
    version: 409, no tables changed."""
    server, ta, tb = two_table_catalog
    v_a = ta._current_metadata_file()
    v_b = tb._current_metadata_file()

    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    real = IcebergProtocolTable._commit_metadata
    calls = {"n": 0}

    def racing(self, md, version):
        calls["n"] += 1
        if calls["n"] == 2:
            # simulate a concurrent direct commit landing v{n+1} on tb
            # between prepare and link
            import json as _json
            import os as _os

            target = _os.path.join(
                self.metadata_path, f"v{version}.metadata.json"
            )
            with open(target, "x") as f:
                _json.dump(md, f)
        return real(self, md, version)

    monkeypatch.setattr(
        IcebergProtocolTable, "_commit_metadata", racing
    )
    code, res = _txn(server, [
        dict(_ident("ta"), updates=[{"action": "set-properties",
                                     "updates": {"stage": "gold"}}]),
        dict(_ident("tb"), updates=[{"action": "set-properties",
                                     "updates": {"stage": "silver"}}]),
    ])
    assert code == 409
    assert "no tables changed" in res["error"]["message"]
    # ta's linked version was rolled back; terminal files unchanged
    assert ta._current_metadata_file() == v_a
    md_a = _get(server, "/v1/namespaces/analytics/tables/ta")["metadata"]
    assert "stage" not in (md_a.get("properties") or {})


def test_transaction_bad_requests(two_table_catalog):
    server, _ta, _tb = two_table_catalog
    code, _ = _post(server, "/v1/transactions/commit", {})
    assert code == 400
    code, _ = _txn(server, [])
    assert code == 400
    code, _ = _txn(server, [{"updates": []}])  # missing identifier
    assert code == 400
    code, _ = _txn(server, [
        dict(_ident("nope"), updates=[]),
    ])
    assert code == 404
    # duplicate table in one transaction is refused (second CAS would
    # race the first's own link)
    code, res = _txn(server, [
        dict(_ident("ta"), updates=[]),
        dict(_ident("ta"), updates=[]),
    ])
    assert code == 400
    assert "duplicate" in res["error"]["message"]


def test_transaction_non_list_changes_rejected(two_table_catalog):
    """table-changes that is a dict / contains non-objects answers 400
    (explicit validation — an assert would vanish under -O and crash
    the handler instead)."""
    server, _ta, _tb = two_table_catalog
    code, _ = _post(server, "/v1/transactions/commit",
                    {"table-changes": {"a": 1}})
    assert code == 400
    code, _ = _post(server, "/v1/transactions/commit",
                    {"table-changes": ["not-an-object"]})
    assert code == 400


def _delete(server, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", method="DELETE"
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_namespace_lifecycle_and_drop_table(spark, sf_dir, tmp_path):
    """Spec CreateNamespace / GetNamespace / DropTable / DropNamespace:
    create ns -> create table -> ingest -> drop table -> drop ns; a
    non-empty namespace refuses the drop (409 NamespaceNotEmpty)."""
    root = tmp_path / "lifecycle_catalog"
    root.mkdir()
    server = IcebergRestCatalogServer(str(root))
    try:
        code, res = _post(server, "/v1/namespaces",
                          {"namespace": ["stage"]})
        assert code == 200 and res["namespace"] == ["stage"]
        # idempotent create refused with 409 AlreadyExists
        code, res = _post(server, "/v1/namespaces",
                          {"namespace": ["stage"]})
        assert code == 409 and res["error"]["type"] == "AlreadyExistsException"
        # nested / traversal names are 400
        for bad in (["a", "b"], ["../evil"], [""], "notalist"):
            code, _ = _post(server, "/v1/namespaces", {"namespace": bad})
            assert code == 400, bad
        # load
        assert _get(server, "/v1/namespaces/stage")["namespace"] == ["stage"]
        assert _delete(server, "/v1/namespaces/nope") == 404

        # create a table inside, then the namespace refuses to drop
        code, _ = _post(server, "/v1/namespaces/stage/tables", {
            "name": "t1",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200
        code = _delete(server, "/v1/namespaces/stage")
        assert code == 409
        # drop the table (204), then the namespace drops clean
        assert _delete(server, "/v1/namespaces/stage/tables/t1") == 204
        assert _delete(server, "/v1/namespaces/stage/tables/t1") == 404
        assert _delete(server, "/v1/namespaces/stage") == 204
        assert _delete(server, "/v1/namespaces/stage") == 404
    finally:
        server.shutdown()


def test_rename_table(spark, sf_dir, tmp_path):
    """Spec RenameTableRequest: atomic catalog rename — old name 404s,
    new name serves the same table (scan-equal), cross-namespace moves
    work, missing source / missing dest-ns / occupied dest rejected."""
    root = tmp_path / "rename_catalog"
    root.mkdir()
    server = IcebergRestCatalogServer(str(root))
    try:
        for ns in ("a", "b"):
            code, _ = _post(server, "/v1/namespaces", {"namespace": [ns]})
            assert code == 200
        code, _ = _post(server, "/v1/namespaces/a/tables", {
            "name": "t1",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200

        def rename(s_ns, s_name, d_ns, d_name):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/tables/rename",
                data=json.dumps({
                    "source": {"namespace": [s_ns], "name": s_name},
                    "destination": {"namespace": [d_ns], "name": d_name},
                }).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, None
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read() or b"{}")

        def loads(path):
            try:
                _get(server, path)
                return 200
            except urllib.error.HTTPError as e:
                return e.code

        # same-namespace rename
        code, _ = rename("a", "t1", "a", "t2")
        assert code == 204
        assert loads("/v1/namespaces/a/tables/t2") == 200
        assert loads("/v1/namespaces/a/tables/t1") == 404
        # cross-namespace move
        code, _ = rename("a", "t2", "b", "t3")
        assert code == 204
        assert loads("/v1/namespaces/b/tables/t3") == 200
        # missing source
        code, _ = rename("a", "ghost", "b", "x")
        assert code == 404
        # missing destination namespace
        code, _ = rename("b", "t3", "nope", "x")
        assert code == 404
        # occupied destination
        code, _ = _post(server, "/v1/namespaces/a/tables", {
            "name": "t4",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200
        code, res = rename("b", "t3", "a", "t4")
        assert code == 409 and res["error"]["type"] == "AlreadyExistsException"
        assert loads("/v1/namespaces/b/tables/t3") == 200  # untouched
        # traversal in destination name
        code, _ = rename("b", "t3", "a", "../evil")
        assert code == 400
        # malformed body
        code, _ = _post(server, "/v1/tables/rename", {"source": "x"})
        assert code == 400
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# views (spec /v1/namespaces/{ns}/views family): create / list / load /
# commit (CAS) / rename / drop — the table endpoints' mirror matrix
# ---------------------------------------------------------------------------


def _mkview(server, ns, name, sql="SELECT 1 AS x", dialect="spark"):
    return _post(server, f"/v1/namespaces/{ns}/views", {
        "name": name,
        "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "x", "required": False, "type": "long"}]},
        "view-version": {
            "representations": [
                {"type": "sql", "sql": sql, "dialect": dialect}],
        },
        "properties": {"comment": "test view"},
    })


def test_view_lifecycle(tmp_path):
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        code, _ = _post(server, "/v1/namespaces", {"namespace": ["a"]})
        assert code == 200
        # create
        code, res = _mkview(server, "a", "v1",
                            "SELECT o_orderkey FROM orders")
        assert code == 200
        md = res["metadata"]
        assert md["format-version"] == 1
        assert md["current-version-id"] == 1
        assert len(md["versions"]) == 1
        rep = md["versions"][0]["representations"][0]
        assert rep == {"type": "sql",
                       "sql": "SELECT o_orderkey FROM orders",
                       "dialect": "spark"}
        assert os.path.isfile(res["metadata-location"])
        # duplicate create -> 409
        code, res = _mkview(server, "a", "v1")
        assert code == 409
        assert res["error"]["type"] == "AlreadyExistsException"
        # list: views route sees it, tables route does NOT
        assert _get(server, "/v1/namespaces/a/views")["identifiers"] == [
            {"namespace": ["a"], "name": "v1"}]
        assert _get(server, "/v1/namespaces/a/tables")["identifiers"] == []
        # load + HEAD
        loaded = _get(server, "/v1/namespaces/a/views/v1")
        assert loaded["metadata"]["view-uuid"] == md["view-uuid"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a/views/v1",
            method="HEAD")
        assert urllib.request.urlopen(req).status == 200
        # commit: replace the SQL (add-view-version + set-current -1)
        code, res = _post(server, "/v1/namespaces/a/views/v1", {
            "requirements": [
                {"type": "assert-view-uuid", "uuid": md["view-uuid"]}],
            "updates": [
                {"action": "set-properties",
                 "updates": {"owner": "etl"}},
                {"action": "add-view-version", "view-version": {
                    "schema-id": 0,
                    "representations": [{
                        "type": "sql",
                        "sql": "SELECT o_orderkey FROM orders WHERE "
                               "o_totalprice > 0",
                        "dialect": "spark"}]}},
                {"action": "set-current-view-version",
                 "view-version-id": -1},
            ],
        })
        assert code == 200, res
        md2 = res["metadata"]
        assert md2["current-version-id"] == 2
        assert len(md2["versions"]) == 2
        assert md2["properties"]["owner"] == "etl"
        assert [e["version-id"] for e in md2["version-log"]] == [1, 2]
        # reload reflects the commit
        again = _get(server, "/v1/namespaces/a/views/v1")["metadata"]
        assert again["current-version-id"] == 2
        # drop
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a/views/v1",
            method="DELETE")
        assert urllib.request.urlopen(req).status == 204
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, "/v1/namespaces/a/views/v1")
        assert ei.value.code == 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a/views/v1",
            method="HEAD")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 404
    finally:
        server.shutdown()


def test_view_commit_cas_and_bad_requests(tmp_path):
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, res = _mkview(server, "a", "v")
        assert code == 200
        uuid_ok = res["metadata"]["view-uuid"]
        # stale uuid -> spec 409 CommitFailedException
        code, res = _post(server, "/v1/namespaces/a/views/v", {
            "requirements": [
                {"type": "assert-view-uuid", "uuid": "not-the-uuid"}],
            "updates": [{"action": "set-properties", "updates": {"k": "1"}}],
        })
        assert code == 409
        assert res["error"]["type"] == "CommitFailedException"
        # unknown requirement / update action -> 400
        code, _ = _post(server, "/v1/namespaces/a/views/v", {
            "requirements": [{"type": "assert-ref-snapshot-id",
                              "ref": "main", "snapshot-id": 1}],
        })
        assert code == 400
        code, _ = _post(server, "/v1/namespaces/a/views/v", {
            "updates": [{"action": "add-snapshot", "snapshot": {}}],
        })
        assert code == 400
        # add-view-version against an unknown schema -> 400
        code, _ = _post(server, "/v1/namespaces/a/views/v", {
            "updates": [{"action": "add-view-version", "view-version": {
                "schema-id": 99,
                "representations": [{"type": "sql", "sql": "SELECT 1",
                                     "dialect": "spark"}]}}],
        })
        assert code == 400
        # set-current to an unknown version -> 400
        code, _ = _post(server, "/v1/namespaces/a/views/v", {
            "updates": [{"action": "set-current-view-version",
                         "view-version-id": 42}],
        })
        assert code == 400
        # -1 sentinels without the matching add in the same commit -> 400
        code, _ = _post(server, "/v1/namespaces/a/views/v", {
            "updates": [{"action": "set-current-view-version",
                         "view-version-id": -1}],
        })
        assert code == 400
        # malformed create bodies -> 400 (missing representations /
        # non-sql representation / missing schema)
        code, _ = _post(server, "/v1/namespaces/a/views", {
            "name": "bad1",
            "schema": {"fields": []},
            "view-version": {"representations": []},
        })
        assert code == 400
        code, _ = _post(server, "/v1/namespaces/a/views", {
            "name": "bad2",
            "schema": {"fields": []},
            "view-version": {"representations": [
                {"type": "python", "code": "x"}]},
        })
        assert code == 400
        code, _ = _post(server, "/v1/namespaces/a/views", {
            "name": "bad3",
            "view-version": {"representations": [
                {"type": "sql", "sql": "SELECT 1", "dialect": "spark"}]},
        })
        assert code == 400
        # create into a missing namespace -> 404
        code, _ = _mkview(server, "ghost", "v")
        assert code == 404
        # a valid commit with the right uuid still lands (CAS advanced
        # only by the successful path)
        code, res = _post(server, "/v1/namespaces/a/views/v", {
            "requirements": [
                {"type": "assert-view-uuid", "uuid": uuid_ok}],
            "updates": [{"action": "set-properties", "updates": {"k": "1"}}],
        })
        assert code == 200 and res["metadata"]["properties"]["k"] == "1"
    finally:
        server.shutdown()


def test_view_concurrent_commit_conflict(tmp_path, monkeypatch):
    """A committer that lands between the server's metadata fold and
    its link(2) wins the O_EXCL race: the view commit must observe
    FileExistsError and answer the spec's retryable 409, not
    overwrite — the table-side race test's mirror. (A version linked
    BEFORE the fold is simply the new base: the server builds v+1 on
    the terminal file, so only the in-window race can conflict.)"""
    import featureform_spark.serving.rest_catalog as rc

    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, res = _mkview(server, "a", "v")
        assert code == 200
        orig = rc._commit_view_metadata

        def racing(path, md, version):
            target = os.path.join(
                path, "metadata", f"v{version}.view-metadata.json"
            )
            if not os.path.exists(target):  # the concurrent winner
                with open(target, "w") as f:
                    json.dump(md, f)
            return orig(path, md, version)

        monkeypatch.setattr(rc, "_commit_view_metadata", racing)
        code, res = _post(server, "/v1/namespaces/a/views/v", {
            "updates": [{"action": "set-properties", "updates": {"k": "1"}}],
        })
        assert code == 409
        assert "concurrently" in res["error"]["message"]
    finally:
        server.shutdown()


def test_view_table_shared_identifier_space(tmp_path):
    """Spec: tables and views share one identifier space — creating
    either over the other is 409 AlreadyExists, and renames refuse an
    occupied destination regardless of its kind."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, _ = _post(server, "/v1/namespaces/a/tables", {
            "name": "t",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200
        code, res = _mkview(server, "a", "t")  # view over table
        assert code == 409
        assert res["error"]["type"] == "AlreadyExistsException"
        code, _ = _mkview(server, "a", "v")
        assert code == 200
        code, res = _post(server, "/v1/namespaces/a/tables", {
            "name": "v",  # table over view
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 409
        assert res["error"]["type"] == "AlreadyExistsException"
        # table list shows only t; view list only v
        assert _get(server, "/v1/namespaces/a/tables")["identifiers"] == [
            {"namespace": ["a"], "name": "t"}]
        assert _get(server, "/v1/namespaces/a/views")["identifiers"] == [
            {"namespace": ["a"], "name": "v"}]
        # view rename onto the table name -> 409
        code, res = _post(server, "/v1/views/rename", {
            "source": {"namespace": ["a"], "name": "v"},
            "destination": {"namespace": ["a"], "name": "t"},
        })
        assert code == 409
        # table rename onto the view name -> 409
        code, res = _post(server, "/v1/tables/rename", {
            "source": {"namespace": ["a"], "name": "t"},
            "destination": {"namespace": ["a"], "name": "v"},
        })
        assert code == 409
    finally:
        server.shutdown()


def test_view_rename(tmp_path):
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        _post(server, "/v1/namespaces", {"namespace": ["b"]})
        code, _ = _mkview(server, "a", "v1")
        assert code == 200

        def rename(s_ns, s_name, d_ns, d_name):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/v1/views/rename",
                data=json.dumps({
                    "source": {"namespace": [s_ns], "name": s_name},
                    "destination": {"namespace": [d_ns], "name": d_name},
                }).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, None
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read() or b"{}")

        def loads(path):
            try:
                _get(server, path)
                return 200
            except urllib.error.HTTPError as e:
                return e.code

        code, _ = rename("a", "v1", "a", "v2")
        assert code == 204
        assert loads("/v1/namespaces/a/views/v2") == 200
        assert loads("/v1/namespaces/a/views/v1") == 404
        code, _ = rename("a", "v2", "b", "v3")
        assert code == 204
        assert loads("/v1/namespaces/b/views/v3") == 200
        code, _ = rename("a", "ghost", "b", "x")
        assert code == 404
        code, _ = rename("b", "v3", "nope", "x")
        assert code == 404
        code, _ = _mkview(server, "a", "occupied")
        assert code == 200
        code, res = rename("b", "v3", "a", "occupied")
        assert code == 409 and res["error"]["type"] == "AlreadyExistsException"
        assert loads("/v1/namespaces/b/views/v3") == 200  # untouched
        code, _ = rename("b", "v3", "a", "../evil")
        assert code == 400
        code, _ = _post(server, "/v1/views/rename", {"source": "x"})
        assert code == 400
    finally:
        server.shutdown()


def test_view_sql_executes_on_engine(spark, sf_dir, tmp_path):
    """The P2-style payoff: a client loads the view over the wire and
    runs its current sql representation on the engine — results match
    running the SQL directly."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        sql = ("SELECT o_custkey, sum(o_totalprice) AS total FROM orders "
               "GROUP BY o_custkey")
        code, _ = _mkview(server, "a", "cust_totals", sql)
        assert code == 200
        loaded = _get(server, "/v1/namespaces/a/views/cust_totals")
        md = loaded["metadata"]
        cur = next(v for v in md["versions"]
                   if v["version-id"] == md["current-version-id"])
        rep = next(r for r in cur["representations"]
                   if r["type"] == "sql" and r["dialect"] == "spark")
        _orders(spark, sf_dir).selectExpr(
            "o_orderkey", "o_custkey", "o_totalprice"
        ).createOrReplaceTempView("orders")
        try:
            got = sorted(map(tuple, spark.sql(rep["sql"]).collect()))
            want = sorted(map(tuple, spark.sql(sql).collect()))
        finally:
            spark.catalog.dropTempView("orders")
        assert got == want and len(got) > 0
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# list pagination (spec pageToken/pageSize on the three list endpoints)
# ---------------------------------------------------------------------------


def _walk_pages(server, base, key):
    """Follow next-page-token until exhaustion; return every item and
    the page shapes."""
    items, pages, token = [], [], ""
    while True:
        sep = "&" if "?" in base else "?"
        url = base + (f"{sep}pageToken={token}" if token else "")
        got = _get(server, url)
        page = got[key]
        pages.append(len(page))
        items.extend(page)
        token = got.get("next-page-token")
        if not token:
            return items, pages


def test_list_pagination(tmp_path):
    """pageSize caps every page; the opaque token walks the full
    listing exactly once (no duplicates, no gaps) across namespaces,
    tables, and views; a final short page carries no token."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        for i in range(5):
            _post(server, "/v1/namespaces", {"namespace": [f"ns{i}"]})
        for i in range(7):
            code, _ = _post(server, "/v1/namespaces/ns0/tables", {
                "name": f"t{i:02d}",
                "schema": {"type": "struct", "fields": [
                    {"id": 1, "name": "k", "required": False,
                     "type": "long"}]},
            })
            assert code == 200
        for i in range(7):
            code, _ = _mkview(server, "ns0", f"v{i:02d}")
            assert code == 200
        # namespaces: 5 items, pages of 2 -> 2/2/1
        items, pages = _walk_pages(
            server, "/v1/namespaces?pageSize=2", "namespaces")
        assert items == [[f"ns{i}"] for i in range(5)]
        assert pages == [2, 2, 1]
        # tables: 7 items, pages of 3 -> 3/3/1, views untouched
        items, pages = _walk_pages(
            server, "/v1/namespaces/ns0/tables?pageSize=3", "identifiers")
        assert [x["name"] for x in items] == [f"t{i:02d}" for i in range(7)]
        assert pages == [3, 3, 1]
        # views: same walk on the views route
        items, pages = _walk_pages(
            server, "/v1/namespaces/ns0/views?pageSize=3", "identifiers")
        assert [x["name"] for x in items] == [f"v{i:02d}" for i in range(7)]
        assert pages == [3, 3, 1]
        # no pagination params: the whole listing, no token
        got = _get(server, "/v1/namespaces/ns0/tables")
        assert len(got["identifiers"]) == 7
        assert "next-page-token" not in got
        # exact-multiple boundary: 7 items, size 7 -> one full page;
        # the lazy kind-filter cannot know the remaining names hold no
        # tables, so a token MAY follow — walking it must end cleanly
        # on an empty tokenless page, never duplicate
        items, pages = _walk_pages(
            server, "/v1/namespaces/ns0/tables?pageSize=7", "identifiers")
        assert [x["name"] for x in items] == [f"t{i:02d}" for i in range(7)]
        assert pages[0] == 7 and sum(pages) == 7
        # a drop BEHIND the cursor never duplicates or skips ahead
        got = _get(server, "/v1/namespaces/ns0/views?pageSize=3")
        token = got["next-page-token"]
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/ns0/views/v00",
            method="DELETE")
        assert urllib.request.urlopen(req).status == 204
        got2 = _get(
            server,
            f"/v1/namespaces/ns0/views?pageSize=10&pageToken={token}")
        assert [x["name"] for x in got2["identifiers"]] == [
            f"v{i:02d}" for i in range(3, 7)]
        # malformed params -> 400
        for bad in ("pageSize=0", "pageSize=-1", "pageSize=abc",
                    "pageToken=%21%21notb64%21%21"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _get(server, f"/v1/namespaces/ns0/tables?{bad}")
            assert ei.value.code == 400, bad
    finally:
        server.shutdown()


def test_register_views_into_session(spark, sf_dir, tmp_path):
    """Client glue: register_views walks the paginated listing and
    makes every catalog view a session temp view spark.sql can
    resolve — views over views work, non-spark dialects are skipped."""
    from featureform_spark.serving.rest_catalog import register_views

    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        _orders(spark, sf_dir).createOrReplaceTempView("orders")
        code, _ = _mkview(
            server, "a", "big_orders",
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_totalprice > 1000")
        assert code == 200
        code, _ = _mkview(
            server, "a", "big_count",
            "SELECT count(*) AS n FROM big_orders")
        assert code == 200
        code, _ = _mkview(server, "a", "duck_only", "SELECT 1", "duckdb")
        assert code == 200
        try:
            got = register_views(
                spark, f"http://127.0.0.1:{server.port}", "a",
                page_size=1)  # force the token walk
            # big_count sorts BEFORE its dependency big_orders in the
            # listing — the fixpoint pass must still land both
            assert set(got) == {"big_orders", "big_count"}
            n = spark.sql("SELECT * FROM big_count").first()["n"]
            want = spark.sql(
                "SELECT count(*) AS n FROM orders WHERE o_totalprice > 1000"
            ).first()["n"]
            assert n == want and want > 0
            # an unresolvable view (missing base table) raises instead
            # of spinning or silently dropping
            code, _ = _mkview(
                server, "a", "broken", "SELECT * FROM no_such_table")
            assert code == 200
            with pytest.raises(Exception, match="no_such_table"):
                register_views(
                    spark, f"http://127.0.0.1:{server.port}", "a")
        finally:
            for v in ("big_count", "big_orders", "orders"):
                spark.catalog.dropTempView(v)
    finally:
        server.shutdown()


def test_cross_kind_create_race_rolls_back(tmp_path, monkeypatch):
    """The link(2) CAS only serializes same-kind creates (table and
    view metadata are different filenames): a CREATE VIEW racing a
    CREATE TABLE on one identifier must not leave both 200'd with the
    table silently orphaned. The later linker observes the other
    kind's files post-commit, rolls back its own link, and answers
    409."""
    import featureform_spark.serving.rest_catalog as rc
    import featureform_spark.sources.iceberg_protocol as ip

    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        # view loses to a table that links mid-commit
        orig_v = rc._commit_view_metadata

        def racing_view(path, md, version):
            tfile = os.path.join(path, "metadata", "v1.metadata.json")
            os.makedirs(os.path.dirname(tfile), exist_ok=True)
            if not os.path.exists(tfile):
                with open(tfile, "w") as f:
                    f.write("{}")
            return orig_v(path, md, version)

        monkeypatch.setattr(rc, "_commit_view_metadata", racing_view)
        code, res = _mkview(server, "a", "x")
        assert code == 409
        assert res["error"]["type"] == "AlreadyExistsException"
        # the view's own files are rolled back — only the table's remain
        mdir = tmp_path / "a" / "x" / "metadata"
        assert sorted(p.name for p in mdir.iterdir()) == [
            "v1.metadata.json"
        ]
        monkeypatch.setattr(rc, "_commit_view_metadata", orig_v)
        # table loses to a view that links mid-commit
        orig_t = ip.IcebergProtocolTable._commit_metadata

        def racing_table(self, md, version):
            vfile = os.path.join(
                self.metadata_path, "v1.view-metadata.json"
            )
            os.makedirs(self.metadata_path, exist_ok=True)
            if not os.path.exists(vfile):
                with open(vfile, "w") as f:
                    f.write("{}")
            return orig_t(self, md, version)

        monkeypatch.setattr(
            ip.IcebergProtocolTable, "_commit_metadata", racing_table
        )
        code, res = _post(server, "/v1/namespaces/a/tables", {
            "name": "y",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 409
        assert res["error"]["type"] == "AlreadyExistsException"
        mdir = tmp_path / "a" / "y" / "metadata"
        assert sorted(p.name for p in mdir.iterdir()) == [
            "v1.view-metadata.json"
        ]
    finally:
        server.shutdown()


def test_url_encoded_names_resolve(tmp_path):
    """Names land in the catalog via JSON bodies, so they can contain
    characters a conformant HTTP client percent-encodes on the path —
    the server must decode segments or its own listing returns
    unreachable entries."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, _ = _mkview(server, "a", "my view")
        assert code == 200
        got = _get(server, "/v1/namespaces/a/views")["identifiers"]
        assert got == [{"namespace": ["a"], "name": "my view"}]
        loaded = _get(server, "/v1/namespaces/a/views/my%20view")
        assert loaded["metadata"]["versions"]
        # encoded slash decodes INSIDE one segment -> confinement 404,
        # never a new path level
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(server, "/v1/namespaces/a/views/..%2Fescape")
        assert ei.value.code == 404
    finally:
        server.shutdown()


def test_non_object_json_bodies_answer_400(tmp_path):
    """'[1,2]' is valid JSON but no request shape — every POST surface
    must answer 400, never drop the connection with a handler
    traceback."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, _ = _mkview(server, "a", "v")
        assert code == 200
        code, _ = _post(server, "/v1/namespaces/a/tables", {
            "name": "t",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200
        for path in (
            "/v1/namespaces/a/views/v",       # view commit
            "/v1/namespaces/a/tables/t",      # table commit
            "/v1/views/rename",
            "/v1/tables/rename",
            "/v1/namespaces",
            "/v1/transactions/commit",
        ):
            for body in ([1, 2], "x", 7):
                code, res = _post(server, path, body)
                assert code == 400, (path, body, res)
    finally:
        server.shutdown()


def test_pagination_mixed_kinds_and_empty_final_page(tmp_path):
    """The kind filter applies lazily from the cursor: a views walk
    whose tail is all tables may end with one empty final page (no
    token) — never a duplicate, never a 500."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        for i in range(3):
            _mkview(server, "a", f"a{i}")
            _post(server, "/v1/namespaces/a/tables", {
                "name": f"t{i}",
                "schema": {"type": "struct", "fields": [
                    {"id": 1, "name": "k", "required": False,
                     "type": "long"}]},
            })
        items, pages = _walk_pages(
            server, "/v1/namespaces/a/views?pageSize=1", "identifiers")
        assert [x["name"] for x in items] == ["a0", "a1", "a2"]
        # the walk after a2 scans only tables -> one trailing empty page
        assert pages[-1] == 0 and pages[:-1] == [1, 1, 1]
        items, _pages = _walk_pages(
            server, "/v1/namespaces/a/tables?pageSize=2", "identifiers")
        assert [x["name"] for x in items] == ["t0", "t1", "t2"]
    finally:
        server.shutdown()


def test_namespace_properties_lifecycle(tmp_path):
    """Spec UpdateNamespacePropertiesRequest: create-with-properties,
    load reflects them, updates+removals answer the {updated, removed,
    missing} triple, a key in both lists is 400, and dropping an
    otherwise-empty namespace ignores the properties sidecar while a
    non-empty drop keeps its properties intact."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        code, res = _post(server, "/v1/namespaces", {
            "namespace": ["a"], "properties": {"owner": "etl"}})
        assert code == 200 and res["properties"] == {"owner": "etl"}
        got = _get(server, "/v1/namespaces/a")
        assert got["properties"] == {"owner": "etl"}
        code, res = _post(server, "/v1/namespaces/a/properties", {
            "updates": {"comment": "c1", "owner": "ml"},
            "removals": ["ghost"],
        })
        assert code == 200
        assert res == {"updated": ["comment", "owner"],
                       "removed": [], "missing": ["ghost"]}
        code, res = _post(server, "/v1/namespaces/a/properties", {
            "removals": ["comment"]})
        assert code == 200 and res["removed"] == ["comment"]
        assert _get(server, "/v1/namespaces/a")["properties"] == {
            "owner": "ml"}
        # key in both lists -> 400 per spec
        code, _ = _post(server, "/v1/namespaces/a/properties", {
            "updates": {"k": "1"}, "removals": ["k"]})
        assert code == 400
        # unknown namespace -> 404; malformed -> 400
        code, _ = _post(server, "/v1/namespaces/ghost/properties", {
            "updates": {"k": "1"}})
        assert code == 404
        code, _ = _post(server, "/v1/namespaces/a/properties", {
            "updates": {"k": 7}})
        assert code == 400
        # a STRING removals would iterate per character — must be 400
        code, _ = _post(server, "/v1/namespaces/a/properties", {
            "removals": "owner"})
        assert code == 400
        # non-empty namespace: drop 409s and properties SURVIVE
        code, _ = _mkview(server, "a", "v")
        assert code == 200
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a",
            method="DELETE")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 409
        assert _get(server, "/v1/namespaces/a")["properties"] == {
            "owner": "ml"}
        # empty it: the sidecar alone must not block the drop
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a/views/v",
            method="DELETE")
        assert urllib.request.urlopen(req).status == 204
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/namespaces/a",
            method="DELETE")
        assert urllib.request.urlopen(req).status == 204
    finally:
        server.shutdown()


def test_metrics_endpoint(tmp_path):
    """Spec ReportMetricsRequest: clients (Spark's RESTCatalog) POST
    scan reports after every scan and treat failures as errors — the
    endpoint answers 204 and retains the last reports for operators."""
    server = IcebergRestCatalogServer(str(tmp_path))
    try:
        _post(server, "/v1/namespaces", {"namespace": ["a"]})
        code, _ = _post(server, "/v1/namespaces/a/tables", {
            "name": "t",
            "schema": {"type": "struct", "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"}]},
        })
        assert code == 200
        report = {
            "report-type": "scan-report",
            "table-name": "a.t",
            "snapshot-id": 1,
            "filter": {"type": "true"},
            "metrics": {"total-planning-duration":
                        {"count": 1, "time-unit": "nanoseconds",
                         "total-duration": 12345}},
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}"
            "/v1/namespaces/a/tables/t/metrics",
            data=json.dumps(report).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        assert urllib.request.urlopen(req).status == 204
        assert server.metrics[-1]["table"] == "t"
        assert server.metrics[-1]["report"]["report-type"] == "scan-report"
        # unknown table -> 404; non-object body -> 400
        code, _ = _post(
            server, "/v1/namespaces/a/tables/ghost/metrics", report)
        assert code == 404
        code, _ = _post(
            server, "/v1/namespaces/a/tables/t/metrics", [1, 2])
        assert code == 400
    finally:
        server.shutdown()


def test_commit_set_and_remove_statistics(catalog):
    """Spec SetStatisticsUpdate / RemoveStatisticsUpdate (and the
    partition-statistics twins): entries replace per-snapshot, removals
    drop them, and an unknown snapshot id is a 400-class rejection."""
    server, t = catalog
    md0 = _get(server, "/v1/namespaces/analytics/tables/orders")["metadata"]
    sid = md0["current-snapshot-id"]
    entry = {
        "snapshot-id": sid,
        "statistics-path": "/tmp/nowhere.stats",
        "file-size-in-bytes": 100,
        "file-footer-size-in-bytes": 40,
        "blob-metadata": [
            {
                "type": "apache-datasketches-theta-v1",
                "fields": [1],
                "snapshot-id": sid,
                "sequence-number": 1,
                "properties": {"ndv": "42"},
            }
        ],
    }
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [{"action": "set-statistics", "statistics": entry}]},
    )
    assert code == 200, res
    assert res["metadata"]["statistics"][0]["blob-metadata"][0][
        "properties"
    ]["ndv"] == "42"
    # replace (same snapshot): still exactly one entry
    entry2 = dict(entry, **{"file-size-in-bytes": 200})
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [{"action": "set-statistics", "statistics": entry2}]},
    )
    assert code == 200
    stats = res["metadata"]["statistics"]
    assert len(stats) == 1 and stats[0]["file-size-in-bytes"] == 200
    # partition-statistics twin
    pentry = {
        "snapshot-id": sid,
        "statistics-path": "/tmp/nowhere-part.parquet",
        "file-size-in-bytes": 10,
    }
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [
            {"action": "set-partition-statistics",
             "partition-statistics": pentry}]},
    )
    assert code == 200
    assert len(res["metadata"]["partition-statistics"]) == 1
    # removals
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [
            {"action": "remove-statistics", "snapshot-id": sid},
            {"action": "remove-partition-statistics", "snapshot-id": sid},
        ]},
    )
    assert code == 200
    assert res["metadata"].get("statistics", []) == []
    assert res["metadata"].get("partition-statistics", []) == []
    # unknown snapshot id rejected
    bad = dict(entry, **{"snapshot-id": 999999999})
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [{"action": "set-statistics", "statistics": bad}]},
    )
    assert code == 400, res
    badp = dict(pentry, **{"snapshot-id": 999999999})
    code, res = _post(
        server,
        "/v1/namespaces/analytics/tables/orders",
        {"updates": [
            {"action": "set-partition-statistics",
             "partition-statistics": badp}]},
    )
    assert code == 400, res


def test_analyze_rest_table_commits_stats_through_catalog(
    catalog, spark
):
    """Client-side ANALYZE glue: sketches compute engine-side, the
    statistics entry registers through the catalog's set-statistics
    commit, and a wire-level LoadTableResult reader observes it."""
    from featureform_spark.serving.rest_catalog import analyze_rest_table

    server, _t = catalog
    base = f"http://127.0.0.1:{server.port}"
    est = analyze_rest_table(
        spark, base, "analytics", "orders",
        columns=["o_custkey", "o_orderkey"],
    )
    assert set(est) == {"o_custkey", "o_orderkey"}
    assert est["o_orderkey"] >= 1
    md = _get(server, "/v1/namespaces/analytics/tables/orders")[
        "metadata"
    ]
    stats = md.get("statistics") or []
    assert len(stats) == 1
    blobs = stats[0]["blob-metadata"]
    assert {len(b["fields"]) for b in blobs} == {1}
    assert all(
        b["type"] == "apache-datasketches-theta-v1" for b in blobs
    )
