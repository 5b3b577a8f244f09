"""Round-10 commit-safety regressions (ADVICE.md r9).

Four hazards around the pinned-CAS sweep:
1. append()'s follow-on manifest-merge losing a race must NOT fail the
   append (its snapshot already committed — a retry would double-append).
2. expire_snapshots must commit trimmed metadata BEFORE deleting files
   (delete-first + lost CAS = current metadata referencing dead files).
3. update_spec / upgrade_format_version must commit through the pinned
   CAS (stale-fold TOCTOU like every other write path).
4. position_deletes must emit ONE path format in delete_file_path
   across the parquet and DV branches.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.iceberg_protocol import (
    CommitConflictError,
    IcebergProtocolError,
    IcebergProtocolTable,
)


def _mk(spark, path, n=40, parts=2, properties=None):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(n)], "id long, s string"
    ).repartition(parts)
    t = IcebergProtocolTable(spark, str(path))
    t.create(df, properties=properties)
    return t


MERGE_PROPS = {
    "commit.manifest-merge.enabled": "true",
    "commit.manifest.min-count-to-merge": "2",
}


# ---------------------------------------------- 1. follow-on merge race


def test_append_survives_followon_merge_race(spark, tmp_path, monkeypatch):
    """A lost CAS inside the post-append manifest merge is swallowed:
    the append's own snapshot already landed, and surfacing the error
    would invite a retry that double-appends."""
    t = _mk(spark, tmp_path / "m", properties=MERGE_PROPS)
    before = t.snapshot().count()
    extra = spark.createDataFrame([(1000, "x")], "id long, s string")

    def boom():
        raise CommitConflictError(
            "rewrite_manifests lost a concurrent commit race — "
            "re-run it on fresh metadata"
        )

    monkeypatch.setattr(t, "rewrite_manifests", boom)
    sid = t.append(extra)  # must NOT raise
    assert sid is not None
    assert t.snapshot().count() == before + 1


def test_append_followon_merge_real_failure_propagates(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: only the lost CAS race may be swallowed — a real
    failure inside the follow-on merge (corrupt manifest, unsupported
    feature) is table damage and must surface, not hide until a later
    operation."""
    t = _mk(spark, tmp_path / "m3", properties=MERGE_PROPS)
    extra = spark.createDataFrame([(1000, "x")], "id long, s string")

    def boom():
        raise IcebergProtocolError("corrupt manifest during rewrite")

    monkeypatch.setattr(t, "rewrite_manifests", boom)
    with pytest.raises(IcebergProtocolError, match="corrupt manifest"):
        t.append(extra)
    # the append's OWN snapshot committed before the merge attempt —
    # the data is durable even though the follow-on surfaced its error
    assert t.snapshot().count() == 41


def test_append_followon_merge_still_runs(spark, tmp_path):
    """Sanity: without an injected race the merge threshold still
    triggers and folds manifests (the swallow didn't disable it)."""
    t = _mk(spark, tmp_path / "m2", parts=1, properties=MERGE_PROPS)
    extra = spark.createDataFrame([(1000, "x")], "id long, s string")
    t.append(extra)
    manifests = t.metadata_table("manifests").collect()
    assert len(manifests) == 1  # folded to one
    assert t.snapshot().count() == 41


# ------------------------------------- 2. expire commits before deleting


def test_expire_lost_cas_deletes_nothing(spark, tmp_path, monkeypatch):
    """If the expire's metadata commit loses the race, NO file may have
    been deleted yet — time travel to the still-referenced snapshots
    must keep working, and a plain retry must succeed."""
    t = _mk(spark, tmp_path / "e")
    first_sid = t.current_snapshot()["snapshot-id"]
    t.append(spark.createDataFrame([(99, "z")], "id long, s string"))

    before = set(glob.glob(str(tmp_path / "e" / "**" / "*"), recursive=True))

    orig = IcebergProtocolTable._commit_metadata_cas

    def lose(self, md, pinned, op):
        raise IcebergProtocolError(
            f"{op} lost a concurrent commit race — re-run it on "
            "fresh metadata"
        )

    monkeypatch.setattr(IcebergProtocolTable, "_commit_metadata_cas", lose)
    with pytest.raises(IcebergProtocolError):
        t.expire_snapshots(retain_last=1)
    after = set(glob.glob(str(tmp_path / "e" / "**" / "*"), recursive=True))
    assert before <= after  # nothing deleted on the failed commit
    # the expired-candidate snapshot still time-travels
    assert t.snapshot(snapshot_id=first_sid).count() == 40

    monkeypatch.setattr(IcebergProtocolTable, "_commit_metadata_cas", orig)
    out = t.expire_snapshots(retain_last=1)
    assert out["expired"] == 1
    assert t.snapshot().count() == 41


# ------------------------------- 3. metadata-only commands pin their CAS


@pytest.mark.parametrize("op", ["update_spec", "upgrade_format_version"])
def test_metadata_only_ops_loud_fail_on_stale_pin(
    spark, tmp_path, monkeypatch, op
):
    """A commit landing between the metadata read and the version
    computation must surface as a retryable error, never a silent
    clobber: force the staleness by pinning one version back."""
    t = _mk(spark, tmp_path / op)
    t.append(spark.createDataFrame([(99, "z")], "id long, s string"))

    orig = IcebergProtocolTable._pinned_metadata

    def stale(self):
        md, pinned = orig(self)
        return md, pinned - 1  # someone committed after "our" read

    monkeypatch.setattr(IcebergProtocolTable, "_pinned_metadata", stale)
    with pytest.raises(IcebergProtocolError, match="commit race"):
        if op == "update_spec":
            t.update_spec(["s"])
        else:
            t.upgrade_format_version(3)

    monkeypatch.setattr(IcebergProtocolTable, "_pinned_metadata", orig)
    if op == "update_spec":
        assert t.update_spec(["s"]) == 1
    else:
        t.upgrade_format_version(3)
        assert int(t.metadata().get("format-version")) == 3


# -------------------------------------- 4. one path format per column


def test_position_deletes_path_format_consistent(spark, tmp_path):
    """delete_file_path must join against metadata_table('delete_files')
    file_path for BOTH branches: parquet position deletes (v2) and
    puffin DVs (v3) — no file: URIs leaking from one branch only."""
    # v2 branch: parquet position deletes
    t2 = _mk(spark, tmp_path / "v2")
    t2.delete_rows(F.col("id") < 5)
    pd_rows = t2.position_deletes().collect()
    assert len(pd_rows) == 5
    del_files = {
        r["file_path"]
        for r in t2.metadata_table("delete_files").collect()
    }
    got = {r["delete_file_path"] for r in pd_rows}
    assert got <= del_files, f"{got} not within {del_files}"
    assert not any(p.startswith("file:") for p in got)

    # v3 branch: puffin DVs
    t3 = _mk(spark, tmp_path / "v3")
    t3.upgrade_format_version(3)
    t3.delete_rows(F.col("id") < 5)
    pd3 = t3.position_deletes().collect()
    assert len(pd3) == 5
    dv_files = {
        r["file_path"]
        for r in t3.metadata_table("delete_files").collect()
    }
    assert {r["delete_file_path"] for r in pd3} <= dv_files


# ------------------------------------- spec §refs retention fields


def test_expired_tag_stops_pinning_history(spark, tmp_path):
    """A tag with max-ref-age-ms in the past is removed FIRST, so the
    snapshot it pinned can expire (Iceberg's expire-refs-then-
    snapshots order); a fresh tag still pins."""
    t = _mk(spark, tmp_path / "refs")
    old_sid = t.current_snapshot()["snapshot-id"]
    t.create_ref("stale-tag", "tag", max_ref_age_ms=1)  # expires now
    t.append(spark.createDataFrame([(99, "z")], "id long, s string"))
    t.create_ref("fresh-tag", "tag", max_ref_age_ms=10**12)

    out = t.expire_snapshots(retain_last=1)
    assert out["removed_refs"] == ["stale-tag"]
    assert out["expired"] == 1
    refs = t.metadata().get("refs") or {}
    assert "stale-tag" not in refs and "fresh-tag" in refs
    # the expired snapshot is gone from metadata
    assert old_sid not in {
        s["snapshot-id"] for s in t.snapshots()
    }
    # the fresh tag still reads
    assert t.snapshot_ref("fresh-tag").count() == 41


def test_branch_min_snapshots_to_keep_bounds_ancestry(spark, tmp_path):
    """A branch with min-snapshots-to-keep=2 (and no snapshot age)
    retains exactly its 2 newest ancestors; older branch commits
    expire instead of the full-chain default."""
    t = _mk(spark, tmp_path / "br")
    for i in range(3):
        t.append(
            spark.createDataFrame([(100 + i, "b")], "id long, s string"),
            branch="audit",
        )
    audit_head = (t.metadata()["refs"])["audit"]["snapshot-id"]
    # re-register the branch with retention fields at its head
    md = t.metadata()
    t.create_ref(
        "audit2", "branch", snapshot_id=audit_head,
        min_snapshots_to_keep=2,
    )
    # drop the unbounded original so only the bounded branch pins
    import json as _json
    import os as _os

    md, pinned = t._pinned_metadata()
    md = dict(md)
    refs = dict(md["refs"])
    del refs["audit"]
    md["refs"] = refs
    t._commit_metadata_cas(md, pinned, "test-drop-ref")

    before = {s["snapshot-id"] for s in t.snapshots()}
    assert len(before) == 4  # create + 3 branch appends
    out = t.expire_snapshots(retain_last=1)
    after = {s["snapshot-id"] for s in t.snapshots()}
    # kept: main head (create) + 2 newest audit ancestors
    assert len(after) == 3, (before, after, out)
    assert audit_head in after
    assert t.snapshot_ref("audit2").count() == 43  # 40 + 3 appends


def test_branch_without_retention_keeps_full_chain(spark, tmp_path):
    """No retention fields -> the conservative full-ancestry keep this
    engine has always done (nothing a ref reaches is deleted)."""
    t = _mk(spark, tmp_path / "br2")
    for i in range(3):
        t.append(
            spark.createDataFrame([(100 + i, "b")], "id long, s string"),
            branch="audit",
        )
    out = t.expire_snapshots(retain_last=1)
    assert out["expired"] == 0
    assert len(t.snapshots()) == 4


def test_tag_refuses_branch_retention_fields(spark, tmp_path):
    t = _mk(spark, tmp_path / "tagf")
    with pytest.raises(Exception, match="branches only"):
        t.create_ref("x", "tag", min_snapshots_to_keep=2)
