"""Read-only Iceberg REST catalog server over protocol-table dirs.

The reference loads Iceberg tables through a catalog (Glue,
offline_store_spark_runner.py:965-980; streamer/iceberg_streamer.py
loads via pyiceberg ``load_catalog``). The REST catalog protocol is
the public, vendor-neutral version of that surface — any modern
Iceberg client (pyiceberg, Spark's RESTCatalog, Trino) speaks it. This
module serves the READ side of the spec over the in-repo
``IcebergProtocolTable`` directories, so a catalog-speaking client can
discover and load tables this engine wrote:

- ``GET /v1/config`` -> ``{"defaults": {}, "overrides": {}}``
- ``GET /v1/namespaces`` -> namespace listing
- ``GET /v1/namespaces/{ns}/tables`` -> table identifiers
- ``GET /v1/namespaces/{ns}/tables/{name}`` -> ``LoadTableResult``
  (``metadata-location`` + the full current metadata JSON)
- ``HEAD /v1/namespaces/{ns}/tables/{name}`` -> 200 / 404

Views (the spec's ``/v1/namespaces/{ns}/views`` family) get the same
lifecycle: list, ``CreateViewRequest`` (schema + sql representations,
committed as view-metadata v1), ``LoadViewResult``,
``CommitViewRequest`` (assert-view-uuid requirement; add-schema /
add-view-version / set-current-view-version updates with the spec's
``-1`` last-added sentinels), HEAD, DELETE, and
``POST /v1/views/rename``. View metadata versions live in the same
``metadata/`` layout as tables under a ``v<N>.view-metadata.json``
suffix and commit through the identical link(2) CAS, so concurrent
view committers get the spec's retryable 409. Tables and views share
one identifier space — creating either over the other is 409
AlreadyExists, per spec.

Like the Flight streamer (serving/flight_server.py), the serving path
holds no Spark session: table metadata is read with plain file IO, so
catalog pods are JVM-free.

Commits (spec ``POST /v1/namespaces/{ns}/tables/{name}`` with a
``CommitTableRequest`` of requirements + updates) are served through
the same O_EXCL metadata log the sessionless writers use: requirements
are validated against the CURRENT metadata, updates applied to a copy,
and the new version hard-linked into place — a concurrent committer
loses the link(2) race and gets the spec's 409 CommitFailedException,
exactly the compare-and-swap a real catalog performs on its metadata
pointer. External engines can therefore append through the catalog
while in-process writers commit directly, with one linearization point.
"""

from __future__ import annotations

import copy
import json
import os
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_VIEW_SUFFIX = ".view-metadata.json"
_VIEW_HINT = "view-version-hint.text"


class _BadPageRequest(Exception):
    """Malformed pageToken / pageSize on a list endpoint."""


def _paginate(
    names: list[str],
    query: str,
    pred=None,
) -> tuple[list[str], str | None]:
    """Spec list-endpoint pagination: ``pageSize`` caps the page,
    ``pageToken`` is an opaque cursor. The token encodes the last
    name already returned (exclusive lower bound, base64), so pages
    stay consistent under concurrent creates/drops — a name added
    behind the cursor is simply absent from this walk, never a
    duplicate or a skip of unrelated entries.

    ``pred`` is the kind filter (is-table / is-view), applied LAZILY
    from the cursor so a page request inspects ~pageSize entries, not
    the whole namespace — at the 100k-table scale the listing story
    targets, filtering everything per page would be O(catalog) stat
    calls per request. A paginated walk may end with one short or
    empty final page when the tail holds no matches. Returns
    ``(page, next_token_or_None)``; ``names`` must be sorted."""
    import base64
    import binascii
    from urllib.parse import parse_qs

    pred = pred or (lambda _n: True)
    q = parse_qs(query, keep_blank_values=True)
    size_raw = q.get("pageSize", [None])[0]
    token_raw = q.get("pageToken", [None])[0]
    size: int | None = None
    if size_raw not in (None, ""):
        try:
            size = int(size_raw)
        except ValueError:
            raise _BadPageRequest(f"invalid pageSize {size_raw!r}") from None
        if size <= 0:
            raise _BadPageRequest(f"invalid pageSize {size_raw!r}")
    start = 0
    if token_raw:  # empty string = first page, per spec
        try:
            after = base64.urlsafe_b64decode(
                token_raw.encode()
            ).decode()
        except (binascii.Error, UnicodeDecodeError):
            raise _BadPageRequest(
                f"invalid pageToken {token_raw!r}"
            ) from None
        import bisect

        start = bisect.bisect_right(names, after)
    if size is None and not token_raw:
        # unpaginated client: the whole (filtered) listing
        return [n for n in names if pred(n)], None
    size = size or len(names) or 1
    page: list[str] = []
    i = start
    while i < len(names) and len(page) < size:
        if pred(names[i]):
            page.append(names[i])
        i += 1
    nxt = None
    if i < len(names) and page:
        nxt = base64.urlsafe_b64encode(page[-1].encode()).decode()
    return page, nxt


def _view_metadata_files(path: str) -> list[tuple[int, str]]:
    """``v<N>.view-metadata.json`` versions under ``<path>/metadata``.
    The suffix disambiguates views from tables sharing the same catalog
    layout (the table reader's ``v<N>.metadata.json`` parse skips the
    compound ``v1.view`` stem, so neither surface lists the other)."""
    mdir = os.path.join(path, "metadata")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if not (name.startswith("v") and name.endswith(_VIEW_SUFFIX)):
            continue
        try:
            out.append((int(name[1 : -len(_VIEW_SUFFIX)]), name))
        except ValueError:
            continue
    return sorted(out)


def _is_iceberg_view(path: str) -> bool:
    """O(1) on anything this server wrote: the kind hints
    (``view-version-hint.text`` / ``version-hint.text``) are stamped on
    every commit, so the per-entry listing predicate is two stats, not
    a listdir of a metadata dir that grows by one file per commit.
    Externally-built dirs without either hint fall back to the full
    scan once per call."""
    mdir = os.path.join(path, "metadata")
    if os.path.exists(os.path.join(mdir, _VIEW_HINT)):
        return True
    if os.path.exists(os.path.join(mdir, "version-hint.text")):
        return False
    return bool(_view_metadata_files(path))


def _is_iceberg_table(path: str) -> bool:
    return os.path.isdir(
        os.path.join(path, "metadata")
    ) and not _is_iceberg_view(path)


def _current_view_metadata_file(path: str) -> str | None:
    mdir = os.path.join(path, "metadata")
    hint = os.path.join(mdir, _VIEW_HINT)
    if os.path.exists(hint):
        try:
            with open(hint) as f:
                v = int(f.read().strip())
            cand = os.path.join(mdir, f"v{v}{_VIEW_SUFFIX}")
            if os.path.exists(cand):
                return cand
        except (OSError, ValueError):
            pass
    files = _view_metadata_files(path)
    return os.path.join(mdir, files[-1][1]) if files else None


def _commit_view_metadata(path: str, md: dict, version: int) -> None:
    """Same put-if-absent CAS as the table log: stage to a hidden temp
    file, hard-link into place (concurrent committers lose the link(2)
    race with FileExistsError), then advance the hint monotonically."""
    mdir = os.path.join(path, "metadata")
    os.makedirs(mdir, exist_ok=True)
    target = os.path.join(mdir, f"v{version}{_VIEW_SUFFIX}")
    tmp = os.path.join(mdir, f".v{version}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(md, f, indent=2)
    try:
        os.link(tmp, target)
    except FileExistsError:
        os.unlink(tmp)
        raise
    os.unlink(tmp)
    hint_path = os.path.join(mdir, _VIEW_HINT)
    try:
        with open(hint_path) as f:
            cur = int(f.read().strip())
    except (OSError, ValueError):
        cur = -1
    if version > cur:
        tmp = os.path.join(mdir, f".{_VIEW_HINT}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, hint_path)


class CommitConflict(Exception):
    """A CommitTableRequest requirement failed against current metadata."""


def _check_requirements(md: dict, reqs: list[dict]) -> None:
    refs = md.get("refs") or {}
    for r in reqs:
        t = r.get("type")
        if t == "assert-table-uuid":
            if md.get("table-uuid") != r.get("uuid"):
                raise CommitConflict(
                    f"table uuid changed: {md.get('table-uuid')}"
                )
        elif t == "assert-ref-snapshot-id":
            ref = r.get("ref")
            want = r.get("snapshot-id")
            have = (refs.get(ref) or {}).get("snapshot-id")
            if ref == "main" and have is None:
                have = md.get("current-snapshot-id")
                if have in (None, -1):
                    have = None
            if want is None:
                if have is not None:
                    raise CommitConflict(
                        f"ref {ref!r} exists at snapshot {have}"
                    )
            elif have != want:
                raise CommitConflict(
                    f"ref {ref!r} at snapshot {have}, expected {want}"
                )
        elif t == "assert-current-schema-id":
            if md.get("current-schema-id") != r.get("current-schema-id"):
                raise CommitConflict("current-schema-id changed")
        elif t == "assert-default-spec-id":
            if md.get("default-spec-id") != r.get("default-spec-id"):
                raise CommitConflict("default-spec-id changed")
        elif t == "assert-last-assigned-field-id":
            if md.get("last-column-id") != r.get("last-assigned-field-id"):
                raise CommitConflict("last-assigned-field-id changed")
        elif t == "assert-last-assigned-partition-id":
            if md.get("last-partition-id") != r.get(
                "last-assigned-partition-id"
            ):
                raise CommitConflict("last-assigned-partition-id changed")
        else:
            raise ValueError(f"unsupported requirement type {t!r}")


def _apply_updates(md: dict, updates: list[dict], now_ms: int) -> dict:
    md = copy.deepcopy(md)
    for u in updates:
        a = u.get("action")
        if a == "assign-uuid":
            md["table-uuid"] = u["uuid"]
        elif a == "set-properties":
            props = dict(md.get("properties") or {})
            props.update(u["updates"])
            md["properties"] = props
        elif a == "remove-properties":
            props = dict(md.get("properties") or {})
            for k in u.get("removals", []):
                props.pop(k, None)
            md["properties"] = props
        elif a == "add-snapshot":
            snap = u["snapshot"]
            md["snapshots"] = list(md.get("snapshots") or []) + [snap]
            seq = int(snap.get("sequence-number", 0))
            if seq > int(md.get("last-sequence-number", 0)):
                md["last-sequence-number"] = seq
        elif a == "set-snapshot-ref":
            name = u["ref-name"]
            sid = u["snapshot-id"]
            ids = {
                s["snapshot-id"] for s in (md.get("snapshots") or [])
            }
            if sid not in ids:
                raise ValueError(
                    f"set-snapshot-ref: unknown snapshot {sid}"
                )
            refs = dict(md.get("refs") or {})
            refs[name] = {
                "snapshot-id": sid,
                "type": u.get("type", "branch"),
            }
            md["refs"] = refs
            if name == "main":
                md["current-snapshot-id"] = sid
                md["snapshot-log"] = list(
                    md.get("snapshot-log") or []
                ) + [{"timestamp-ms": now_ms, "snapshot-id": sid}]
        elif a == "remove-snapshot-ref":
            refs = dict(md.get("refs") or {})
            refs.pop(u["ref-name"], None)
            md["refs"] = refs
        elif a == "set-statistics":
            # spec SetStatisticsUpdate: replace the statistics file
            # entry for its snapshot (one file per snapshot)
            stats = u["statistics"]
            sid = int(stats["snapshot-id"])
            ids = {
                int(s["snapshot-id"])
                for s in (md.get("snapshots") or [])
            }
            if sid not in ids:
                raise ValueError(
                    f"set-statistics: unknown snapshot {sid}"
                )
            md["statistics"] = [
                e
                for e in (md.get("statistics") or [])
                if int(e["snapshot-id"]) != sid
            ] + [stats]
        elif a == "remove-statistics":
            sid = int(u["snapshot-id"])
            md["statistics"] = [
                e
                for e in (md.get("statistics") or [])
                if int(e["snapshot-id"]) != sid
            ]
        elif a == "set-partition-statistics":
            stats = u["partition-statistics"]
            sid = int(stats["snapshot-id"])
            ids = {
                int(s["snapshot-id"])
                for s in (md.get("snapshots") or [])
            }
            if sid not in ids:
                raise ValueError(
                    f"set-partition-statistics: unknown snapshot {sid}"
                )
            md["partition-statistics"] = [
                e
                for e in (md.get("partition-statistics") or [])
                if int(e["snapshot-id"]) != sid
            ] + [stats]
        elif a == "remove-partition-statistics":
            sid = int(u["snapshot-id"])
            md["partition-statistics"] = [
                e
                for e in (md.get("partition-statistics") or [])
                if int(e["snapshot-id"]) != sid
            ]
        else:
            raise ValueError(f"unsupported update action {a!r}")
    return md


def _check_view_requirements(md: dict, reqs: list[dict]) -> None:
    """Spec CommitViewRequest requirements: views carry exactly one
    (assert-view-uuid) — the metadata pointer CAS is the concurrency
    control, same as the table side's link(2) race."""
    for r in reqs:
        t = r.get("type")
        if t == "assert-view-uuid":
            if md.get("view-uuid") != r.get("uuid"):
                raise CommitConflict(
                    f"view uuid changed: {md.get('view-uuid')}"
                )
        else:
            raise ValueError(f"unsupported view requirement type {t!r}")


def _validate_view_version(vv: dict, schema_ids: set[int]) -> None:
    reps = vv.get("representations")
    if not isinstance(reps, list) or not reps:
        raise ValueError("view-version needs a representations list")
    for rep in reps:
        if (
            not isinstance(rep, dict)
            or rep.get("type") != "sql"
            or not isinstance(rep.get("sql"), str)
            or not rep.get("sql")
            or not isinstance(rep.get("dialect"), str)
            or not rep.get("dialect")
        ):
            raise ValueError(f"bad sql representation: {rep!r}")
    if int(vv["schema-id"]) not in schema_ids:
        raise ValueError(f"view-version schema-id {vv['schema-id']} unknown")


def _apply_view_updates(md: dict, updates: list[dict], now_ms: int) -> dict:
    """Spec view update actions: assign-uuid, set-properties,
    remove-properties, add-schema, add-view-version,
    set-current-view-version (view-version-id -1 = the version added
    in THIS commit, the spec's last-added sentinel; same for a
    view-version's schema-id -1)."""
    md = copy.deepcopy(md)
    last_added_schema: int | None = None
    last_added_version: int | None = None
    for u in updates:
        a = u.get("action")
        if a == "assign-uuid":
            md["view-uuid"] = u["uuid"]
        elif a == "set-properties":
            props = dict(md.get("properties") or {})
            props.update(u["updates"])
            md["properties"] = props
        elif a == "remove-properties":
            props = dict(md.get("properties") or {})
            for k in u.get("removals", []):
                props.pop(k, None)
            md["properties"] = props
        elif a == "add-schema":
            schema = dict(u["schema"])
            schema.setdefault("type", "struct")
            sid = int(schema.get("schema-id", -1))
            if sid == -1:
                sid = 1 + max(
                    (int(s["schema-id"]) for s in md.get("schemas") or []),
                    default=-1,
                )
                schema["schema-id"] = sid
            if sid in {
                int(s["schema-id"]) for s in md.get("schemas") or []
            }:
                raise ValueError(f"schema-id {sid} already present")
            md["schemas"] = list(md.get("schemas") or []) + [schema]
            last_added_schema = sid
        elif a == "add-view-version":
            vv = dict(u["view-version"])
            if int(vv.get("schema-id", 0)) == -1:
                if last_added_schema is None:
                    raise ValueError(
                        "schema-id -1 without an add-schema in this commit"
                    )
                vv["schema-id"] = last_added_schema
            schema_ids = {
                int(s["schema-id"]) for s in md.get("schemas") or []
            }
            _validate_view_version(vv, schema_ids)
            vid = int(vv.get("version-id", -1))
            existing = {
                int(v["version-id"]) for v in md.get("versions") or []
            }
            if vid == -1:
                vid = 1 + max(existing, default=0)
                vv["version-id"] = vid
            elif vid in existing:
                raise ValueError(f"version-id {vid} already present")
            vv.setdefault("timestamp-ms", now_ms)
            vv.setdefault("summary", {})
            md["versions"] = list(md.get("versions") or []) + [vv]
            last_added_version = vid
        elif a == "set-current-view-version":
            vid = int(u["view-version-id"])
            if vid == -1:
                if last_added_version is None:
                    raise ValueError(
                        "view-version-id -1 without an add-view-version "
                        "in this commit"
                    )
                vid = last_added_version
            if vid not in {
                int(v["version-id"]) for v in md.get("versions") or []
            }:
                raise ValueError(f"unknown view version {vid}")
            md["current-version-id"] = vid
            md["version-log"] = list(md.get("version-log") or []) + [
                {"timestamp-ms": now_ms, "version-id": vid}
            ]
        else:
            raise ValueError(f"unsupported view update action {a!r}")
    return md


def register_views(
    spark,
    base_url: str,
    namespace: str,
    dialect: str = "spark",
    page_size: int = 100,
) -> list[str]:
    """Client-side consumption glue: walk a REST catalog's (paginated)
    view listing and register each view's CURRENT ``dialect``
    representation as a Spark temp view, so ``spark.sql`` resolves the
    catalog's views by name. Table names inside the view SQL resolve
    against the session as usual — register the base tables first.
    Returns the view names registered; views with no representation in
    ``dialect`` are skipped (vendor-neutral catalogs may carry several
    dialects). Views referencing OTHER catalog views register in
    dependency order regardless of listing order (spark.sql analyzes
    at register time, so a fixpoint pass retries names whose
    dependencies had not landed yet; a view that still fails once
    every resolvable one is in re-raises its analysis error)."""
    import urllib.parse
    import urllib.request

    base = base_url.rstrip("/")
    pending: list[tuple[str, str]] = []
    token = ""
    while True:
        url = (
            f"{base}/v1/namespaces/{namespace}/views"
            f"?pageSize={int(page_size)}"
        )
        if token:
            url += f"&pageToken={urllib.parse.quote(token)}"
        with urllib.request.urlopen(url) as r:
            listing = json.loads(r.read())
        for ident in listing.get("identifiers") or []:
            name = ident["name"]
            with urllib.request.urlopen(
                f"{base}/v1/namespaces/{namespace}/views/"
                f"{urllib.parse.quote(name)}"
            ) as r:
                md = json.loads(r.read())["metadata"]
            cur = next(
                v
                for v in md["versions"]
                if v["version-id"] == md["current-version-id"]
            )
            sql = next(
                (
                    rep["sql"]
                    for rep in cur["representations"]
                    if rep.get("type") == "sql"
                    and rep.get("dialect") == dialect
                ),
                None,
            )
            if sql is not None:
                pending.append((name, sql))
        token = listing.get("next-page-token")
        if not token:
            break
    registered: list[str] = []
    while pending:
        progressed = False
        failures: list[tuple[str, str, Exception]] = []
        for name, sql in pending:
            try:
                spark.sql(sql).createOrReplaceTempView(name)
            except Exception as exc:  # noqa: BLE001 — retried at fixpoint
                failures.append((name, sql, exc))
                continue
            registered.append(name)
            progressed = True
        if not failures:
            break
        if not progressed:
            name, _sql, exc = failures[0]
            raise exc  # unresolvable (missing base table / cycle)
        pending = [(n, s) for n, s, _e in failures]
    return registered


class IcebergRestCatalogServer:
    """Serve ``<root>/<namespace>/<table>`` directories as an Iceberg
    REST catalog. Bind port 0 for ephemeral (read ``.port`` back)."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.root = root
        # last <=100 ReportMetricsRequest payloads (spec metrics
        # endpoint) — operators read these off the server object
        self.metrics: list[dict] = []
        # serializes namespace-property read-modify-writes (handlers
        # run on ThreadingHTTPServer threads)
        self._ns_props_lock = threading.Lock()
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet test output
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _error(self, code: int, msg: str) -> None:
                # spec ErrorModel shape
                self._json(
                    code,
                    {
                        "error": {
                            "message": msg,
                            "type": "NoSuchObjectException"
                            if code == 404
                            else "BadRequestException",
                            "code": code,
                        }
                    },
                )

            def _route(self):
                from urllib.parse import unquote

                # split FIRST, then percent-decode each segment: a
                # correctly-encoding client sends 'my%20view' for a
                # view named 'my view', and an encoded %2F decodes
                # into a slash INSIDE one segment where the realpath
                # confinement in _child_dir rejects it (never a new
                # path level)
                parts = [
                    unquote(p)
                    for p in self.path.split("?")[0].split("/")
                    if p
                ]
                # /v1/config
                if parts == ["v1", "config"]:
                    return ("config", None, None)
                if parts == ["v1", "transactions", "commit"]:
                    return ("transaction", None, None)
                if parts == ["v1", "tables", "rename"]:
                    return ("rename", None, None)
                if parts == ["v1", "views", "rename"]:
                    return ("view-rename", None, None)
                if len(parts) >= 2 and parts[:2] == ["v1", "namespaces"]:
                    if len(parts) == 2:
                        return ("namespaces", None, None)
                    ns = parts[2]
                    if len(parts) == 3:
                        return ("namespace", ns, None)
                    if len(parts) == 4 and parts[3] == "tables":
                        return ("tables", ns, None)
                    if len(parts) == 5 and parts[3] == "tables":
                        return ("table", ns, parts[4])
                    if len(parts) == 4 and parts[3] == "views":
                        return ("views", ns, None)
                    if len(parts) == 5 and parts[3] == "views":
                        return ("view", ns, parts[4])
                    if len(parts) == 4 and parts[3] == "properties":
                        return ("ns-properties", ns, None)
                    if (
                        len(parts) == 6
                        and parts[3] == "tables"
                        and parts[5] == "metrics"
                    ):
                        return ("table-metrics", ns, parts[4])
                return (None, None, None)

            def _child_dir(self, ns: str, name: str, pred) -> str | None:
                # ns/name come straight off the URL — realpath-confine
                # the join so "..", absolute components, or symlink
                # hops cannot address entries outside the catalog root
                root = os.path.realpath(outer.root)
                p = os.path.realpath(os.path.join(root, ns, name))
                if not p.startswith(root + os.sep):
                    return None
                return p if pred(p) else None

            def _table_dir(self, ns: str, name: str) -> str | None:
                return self._child_dir(ns, name, _is_iceberg_table)

            def _view_dir(self, ns: str, name: str) -> str | None:
                return self._child_dir(ns, name, _is_iceberg_view)

            def _ns_dir(self, ns: str) -> str | None:
                root = os.path.realpath(outer.root)
                p = os.path.realpath(os.path.join(root, ns))
                if not p.startswith(root + os.sep) or not os.path.isdir(p):
                    return None
                return p

            def _ns_props(self, ns_dir: str) -> dict:
                """Namespace properties live in a dot-prefixed sidecar
                (a FILE, so table/view listings — which isdir() their
                entries — never see it)."""
                try:
                    with open(
                        os.path.join(ns_dir, ".ns-properties.json")
                    ) as f:
                        return json.load(f)
                except (OSError, ValueError):
                    return {}

            def _write_ns_props(self, ns_dir: str, props: dict) -> None:
                tmp = os.path.join(
                    ns_dir, f".ns-properties.{uuid.uuid4().hex}.tmp"
                )
                with open(tmp, "w") as f:
                    json.dump(props, f, indent=1)
                os.replace(
                    tmp, os.path.join(ns_dir, ".ns-properties.json")
                )

            def _update_ns_properties(self, ns: str):
                """Spec UpdateNamespacePropertiesRequest: apply
                ``removals`` then ``updates``; answer with the spec's
                {updated, removed, missing} triple (missing = removals
                that were not set). A key in BOTH lists is a 400 per
                spec."""
                ns_dir = self._ns_dir(ns)
                if ns_dir is None:
                    return self._error(404, f"namespace {ns!r}")
                try:
                    req = self._read_body()
                    removals = req.get("removals") or []
                    # a STRING would iterate per character and "pass"
                    # validation — require a real list
                    if not isinstance(removals, list):
                        raise ValueError(removals)
                    updates = dict(req.get("updates") or {})
                    if not all(isinstance(r, str) for r in removals):
                        raise ValueError(removals)
                    if not all(
                        isinstance(k, str) and isinstance(v, str)
                        for k, v in updates.items()
                    ):
                        raise ValueError(updates)
                except (ValueError, json.JSONDecodeError, TypeError,
                        AttributeError):
                    return self._error(
                        400, "invalid UpdateNamespacePropertiesRequest"
                    )
                both = set(removals) & set(updates)
                if both:
                    return self._error(
                        400,
                        f"keys in both updates and removals: "
                        f"{sorted(both)}",
                    )
                with outer._ns_props_lock:
                    # read-modify-write on a shared file under a
                    # threaded server: without the lock two concurrent
                    # 200-acknowledged updates could clobber each other
                    props = self._ns_props(ns_dir)
                    removed = [k for k in removals if k in props]
                    missing = [k for k in removals if k not in props]
                    for k in removed:
                        props.pop(k)
                    props.update(updates)
                    self._write_ns_props(ns_dir, props)
                return self._json(
                    200,
                    {
                        "updated": sorted(updates),
                        "removed": sorted(removed),
                        "missing": sorted(missing),
                    },
                )

            def _report_metrics(self, ns: str, name: str):
                """Spec ReportMetricsRequest: accept scan/commit
                reports (clients like Spark's RESTCatalog POST these
                after every scan and treat failures as errors). The
                last reports are retained in memory for operators to
                read off ``server.metrics``; the endpoint never 5xxs
                on report content."""
                if self._table_dir(ns, name) is None:
                    return self._error(404, f"table {ns}.{name} not found")
                try:
                    report = self._read_body()
                except (ValueError, json.JSONDecodeError):
                    return self._error(400, "invalid ReportMetricsRequest")
                outer.metrics.append(
                    {"namespace": ns, "table": name, "report": report}
                )
                del outer.metrics[:-100]  # bounded retention
                self.send_response(204)
                self.end_headers()
                return None

            def _already_exists(self, msg: str):
                return self._json(
                    409,
                    {
                        "error": {
                            "message": msg,
                            "type": "AlreadyExistsException",
                            "code": 409,
                        }
                    },
                )

            def _list_kind(self, ns: str, pred):
                """Shared tables/views listing: resolve the namespace,
                paginate with the kind predicate applied lazily."""
                ns_dir = self._ns_dir(ns)
                if ns_dir is None:
                    return self._error(404, f"namespace {ns!r}")
                names = sorted(os.listdir(ns_dir))
                try:
                    page, nxt = self._page(
                        names,
                        lambda n: pred(os.path.join(ns_dir, n)),
                    )
                except _BadPageRequest as exc:
                    return self._error(400, str(exc))
                body = {
                    "identifiers": [
                        {"namespace": [ns], "name": n} for n in page
                    ]
                }
                if nxt:
                    body["next-page-token"] = nxt
                return self._json(200, body)

            def _page(self, names: list[str], pred=None):
                """Apply spec pagination from this request's query
                string; raises _BadPageRequest on malformed params."""
                qs = (
                    self.path.split("?", 1)[1]
                    if "?" in self.path
                    else ""
                )
                return _paginate(names, qs, pred)

            def do_GET(self):
                kind, ns, name = self._route()
                if kind == "config":
                    return self._json(
                        200, {"defaults": {}, "overrides": {}}
                    )
                if kind == "namespaces":
                    out = sorted(
                        d
                        for d in os.listdir(outer.root)
                        if os.path.isdir(os.path.join(outer.root, d))
                    )
                    try:
                        page, nxt = self._page(out)
                    except _BadPageRequest as exc:
                        return self._error(400, str(exc))
                    body: dict = {"namespaces": [[d] for d in page]}
                    if nxt:
                        body["next-page-token"] = nxt
                    return self._json(200, body)
                if kind == "namespace":
                    ns_dir = self._ns_dir(ns)
                    if ns_dir is None:
                        return self._error(404, f"namespace {ns!r}")
                    return self._json(
                        200,
                        {
                            "namespace": [ns],
                            "properties": self._ns_props(ns_dir),
                        },
                    )
                if kind == "tables":
                    return self._list_kind(ns, _is_iceberg_table)
                if kind == "views":
                    return self._list_kind(ns, _is_iceberg_view)
                if kind == "view":
                    vdir = self._view_dir(ns, name)
                    if vdir is None:
                        return self._error(
                            404, f"view {ns}.{name} not found"
                        )
                    loc = _current_view_metadata_file(vdir)
                    with open(loc) as f:
                        md = json.load(f)
                    # spec LoadViewResult
                    return self._json(
                        200,
                        {
                            "metadata-location": loc,
                            "metadata": md,
                            "config": {},
                        },
                    )
                if kind == "table":
                    tdir = self._table_dir(ns, name)
                    if tdir is None:
                        return self._error(
                            404, f"table {ns}.{name} not found"
                        )
                    from featureform_spark.sources.iceberg_protocol import (
                        IcebergProtocolTable,
                    )

                    t = IcebergProtocolTable(None, tdir)
                    loc = t._current_metadata_file()
                    with open(loc) as f:
                        md = json.load(f)
                    return self._json(
                        200,
                        {
                            "metadata-location": loc,
                            "metadata": md,
                            "config": {},
                        },
                    )
                return self._error(400, f"unknown route {self.path}")

            def _409(self, msg: str):
                return self._json(
                    409,
                    {
                        "error": {
                            "message": msg,
                            "type": "CommitFailedException",
                            "code": 409,
                        }
                    },
                )

            def _read_body(self):
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(body, dict):
                    # '[1,2]' / '"x"' are valid JSON but no request
                    # shape — without this every handler's req.get(...)
                    # would AttributeError into a dropped connection
                    # instead of the 400 other malformed bodies get
                    raise ValueError(
                        f"request body must be a JSON object, "
                        f"got {type(body).__name__}"
                    )
                return body

            def _prepare_commit(self, tdir: str, req: dict, now_ms: int):
                """Validate + apply one CommitTableRequest against the
                table's terminal metadata WITHOUT writing anything.
                Returns (table, new_md, cur_version); raises
                LookupError (no versions), CommitConflict (failed
                requirement), or ValueError-family (bad request)."""
                from featureform_spark.sources.iceberg_protocol import (
                    IcebergProtocolTable,
                )

                t = IcebergProtocolTable(None, tdir)
                files = sorted(t._metadata_files())
                if not files:
                    raise LookupError("table has no metadata versions")
                # base the commit on the HIGHEST version file, not the
                # VERSION_HINT-preferred one: the hint is written after
                # the O_EXCL link and may lag a version, and building on
                # the lagging file would link v{max+1} from v{max-1} —
                # silently dropping the concurrent commit the CAS exists
                # to surface
                cur_version, fname = files[-1]  # bare names, not paths
                old_file = os.path.join(t.metadata_path, fname)
                with open(old_file) as f:
                    md = json.load(f)
                _check_requirements(md, req.get("requirements") or [])
                new_md = _apply_updates(md, req.get("updates") or [], now_ms)
                new_md["last-updated-ms"] = now_ms
                new_md["metadata-log"] = list(
                    md.get("metadata-log") or []
                ) + [{"timestamp-ms": now_ms, "metadata-file": old_file}]
                return t, new_md, cur_version

            def do_POST(self):
                kind, ns, name = self._route()
                if kind == "transaction":
                    return self._commit_transaction()
                if kind == "rename":
                    return self._rename_table()
                if kind == "view-rename":
                    return self._rename_view()
                if kind == "namespaces":
                    return self._create_namespace()
                if kind == "tables":
                    return self._create_table(ns)
                if kind == "views":
                    return self._create_view(ns)
                if kind == "view":
                    return self._commit_view(ns, name)
                if kind == "ns-properties":
                    return self._update_ns_properties(ns)
                if kind == "table-metrics":
                    return self._report_metrics(ns, name)
                if kind != "table":
                    return self._error(400, f"unknown route {self.path}")
                tdir = self._table_dir(ns, name)
                if tdir is None:
                    return self._error(404, f"table {ns}.{name} not found")
                try:
                    req = self._read_body()
                except (ValueError, json.JSONDecodeError):
                    return self._error(400, "invalid CommitTableRequest")
                now_ms = int(time.time() * 1000)
                try:
                    t, new_md, cur_version = self._prepare_commit(
                        tdir, req, now_ms
                    )
                except LookupError:
                    return self._error(
                        404, f"table {ns}.{name} has no metadata versions"
                    )
                except CommitConflict as exc:
                    return self._409(str(exc))
                except (ValueError, KeyError, TypeError) as exc:
                    return self._error(400, f"bad commit request: {exc}")
                try:
                    t._commit_metadata(new_md, cur_version + 1)
                except FileExistsError:
                    # lost the link(2) race to a concurrent committer —
                    # the spec's retryable commit conflict
                    return self._409(
                        f"metadata version {cur_version + 1} "
                        "was committed concurrently"
                    )
                return self._json(
                    200,
                    {
                        "metadata-location": t._current_metadata_file(),
                        "metadata": new_md,
                    },
                )

            def _commit_transaction(self):
                """Spec ``/v1/transactions/commit``: atomic multi-table
                CAS (CommitTransactionRequest.table-changes). All
                requirements are validated against every table's
                terminal metadata first — any failure aborts with
                nothing written; then the prepared versions are linked
                through the same O_EXCL log, rolling back
                already-linked versions if a concurrent single-table
                committer wins a race mid-transaction (the rollback
                only unlinks a version that is still terminal — a
                version someone already built on stays, reported as a
                500). Transactions serialize against each other via a
                catalog-root lock file so two transactions can never
                interleave their link phases."""
                try:
                    req = self._read_body()
                    changes = req["table-changes"]
                except (ValueError, json.JSONDecodeError, KeyError, TypeError):
                    return self._error(
                        400, "invalid CommitTransactionRequest"
                    )
                # explicit check, not assert — asserts vanish under -O
                # and a malformed body would then crash the handler
                # instead of answering 400
                if not isinstance(changes, list) or not changes or not all(
                    isinstance(ch, dict) for ch in changes
                ):
                    return self._error(
                        400, "invalid CommitTransactionRequest"
                    )
                now_ms = int(time.time() * 1000)
                lock = os.path.join(
                    os.path.realpath(outer.root), ".txn.lock"
                )
                fd = None
                deadline = time.time() + 10.0
                while True:
                    try:
                        fd = os.open(
                            lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                        )
                        break
                    except FileExistsError:
                        if time.time() > deadline:
                            return self._409(
                                "transaction lock busy (another "
                                "transaction in flight)"
                            )
                        time.sleep(0.01)
                try:
                    prepared = []
                    seen: set[str] = set()
                    for ch in changes:
                        ident = ch.get("identifier") or {}
                        ns_parts = ident.get("namespace") or []
                        name = ident.get("name")
                        if not ns_parts or not name:
                            return self._error(
                                400,
                                "table-change missing identifier",
                            )
                        ns = "/".join(str(p) for p in ns_parts)
                        tdir = self._table_dir(ns, str(name))
                        if tdir is None:
                            return self._error(
                                404, f"table {ns}.{name} not found"
                            )
                        if tdir in seen:
                            return self._error(
                                400,
                                f"duplicate table in transaction: "
                                f"{ns}.{name}",
                            )
                        seen.add(tdir)
                        try:
                            t, new_md, cur_version = self._prepare_commit(
                                tdir, ch, now_ms
                            )
                        except LookupError:
                            return self._error(
                                404,
                                f"table {ns}.{name} has no metadata "
                                "versions",
                            )
                        except CommitConflict as exc:
                            return self._409(
                                f"{ns}.{name}: {exc} — transaction "
                                "aborted, no tables changed"
                            )
                        except (ValueError, KeyError, TypeError) as exc:
                            return self._error(
                                400, f"bad commit for {ns}.{name}: {exc}"
                            )
                        prepared.append((ns, name, t, new_md, cur_version))
                    committed: list[tuple] = []
                    for ns, name, t, new_md, cur_version in prepared:
                        try:
                            t._commit_metadata(new_md, cur_version + 1)
                        except FileExistsError:
                            # a concurrent DIRECT committer (not a
                            # transaction — we hold the lock) linked
                            # this version first: roll back our links
                            failed = self._rollback(committed)
                            if failed:
                                return self._json(
                                    500,
                                    {
                                        "error": {
                                            "message": (
                                                "transaction partially "
                                                "committed and not "
                                                "rollback-able: "
                                                f"{failed}"
                                            ),
                                            "type": "CommitStateUnknownException",
                                            "code": 500,
                                        }
                                    },
                                )
                            return self._409(
                                f"{ns}.{name}: metadata version "
                                f"{cur_version + 1} was committed "
                                "concurrently — transaction aborted, "
                                "no tables changed"
                            )
                        committed.append((ns, name, t, cur_version + 1))
                    return self._json(200, {})
                finally:
                    if fd is not None:
                        os.close(fd)
                        try:
                            os.unlink(lock)
                        except OSError:
                            pass

            def _rollback(self, committed: list[tuple]) -> list[str]:
                """Unlink versions this transaction linked, newest
                first, restoring each table's version hint. A version
                a concurrent writer already built on (no longer
                terminal) cannot be removed — returned as failures."""
                failures: list[str] = []
                for ns, name, t, version in reversed(committed):
                    files = sorted(t._metadata_files())
                    if not files or files[-1][0] != version:
                        failures.append(f"{ns}.{name}@v{version}")
                        continue
                    target = os.path.join(
                        t.metadata_path, f"v{version}.metadata.json"
                    )
                    try:
                        os.unlink(target)
                    except OSError:
                        failures.append(f"{ns}.{name}@v{version}")
                        continue
                    remaining = sorted(t._metadata_files())
                    if remaining:
                        hint = os.path.join(
                            t.metadata_path, "version-hint.text"
                        )
                        tmp = hint + ".rollback.tmp"
                        with open(tmp, "w") as f:
                            f.write(str(remaining[-1][0]))
                        os.replace(tmp, hint)
                return failures

            def _rename_table(self):
                """Spec RenameTableRequest (POST /v1/tables/rename):
                atomic catalog-level rename via rename(2) inside the
                confined root — source must exist (404), destination
                namespace must exist (404 NoSuchNamespace),
                destination name must be free (409 AlreadyExists).
                The table directory moves; data/metadata inside it are
                untouched (all intra-table paths re-anchor on read)."""
                try:
                    req = self._read_body()
                    s, d = req["source"], req["destination"]
                    s_ns, s_name = s["namespace"][0], s["name"]
                    d_ns, d_name = d["namespace"][0], d["name"]
                    for part in (s_ns, s_name, d_ns, d_name):
                        if not isinstance(part, str) or not part:
                            raise ValueError(part)
                except (ValueError, json.JSONDecodeError, KeyError,
                        TypeError, IndexError):
                    return self._error(400, "invalid RenameTableRequest")
                src_dir = self._table_dir(s_ns, s_name)
                if src_dir is None:
                    return self._error(
                        404, f"table {s_ns}.{s_name} not found"
                    )
                root = os.path.realpath(outer.root)
                dns_dir = os.path.realpath(os.path.join(root, d_ns))
                if (
                    not dns_dir.startswith(root + os.sep)
                    or os.path.dirname(dns_dir) != root
                    or not os.path.isdir(dns_dir)
                ):
                    return self._error(
                        404, f"namespace {d_ns!r} not found"
                    )
                dst_dir = os.path.realpath(
                    os.path.join(dns_dir, d_name)
                )
                if (
                    not dst_dir.startswith(dns_dir + os.sep)
                    or os.path.dirname(dst_dir) != dns_dir
                ):
                    return self._error(400, f"invalid name {d_name!r}")
                if os.path.exists(dst_dir):
                    return self._already_exists(
                        f"table {d_ns}.{d_name} exists"
                    )
                try:
                    os.rename(src_dir, dst_dir)
                except OSError as exc:
                    return self._error(500, f"rename failed: {exc}")
                self.send_response(204)
                self.end_headers()
                return None

            def _create_view(self, ns: str):
                """Spec CreateViewRequest: name + schema + view-version
                (sql representations) + properties. The server assigns
                version-id 1 / schema-id, stamps timestamp-ms, and
                commits v1 through the same O_EXCL log as tables — a
                concurrent creator loses the link(2) race with the
                spec's 409 AlreadyExists."""
                try:
                    req = self._read_body()
                    name = req["name"]
                    if not isinstance(name, str) or not name:
                        raise ValueError("name must be a non-empty string")
                    schema = dict(req["schema"])
                    schema.setdefault("type", "struct")
                    schema.setdefault("schema-id", 0)
                    if not isinstance(schema["fields"], list):
                        raise ValueError("schema.fields must be a list")
                    vv = dict(req["view-version"])
                    vv["schema-id"] = int(schema["schema-id"])
                    _validate_view_version(
                        vv, {int(schema["schema-id"])}
                    )
                    properties = dict(req.get("properties") or {})
                except (ValueError, KeyError, TypeError,
                        AttributeError, json.JSONDecodeError):
                    return self._error(400, "invalid CreateViewRequest")
                root = os.path.realpath(outer.root)
                ns_dir = os.path.realpath(os.path.join(root, ns))
                if not ns_dir.startswith(
                    root + os.sep
                ) or not os.path.isdir(ns_dir):
                    return self._error(404, f"namespace {ns!r}")
                vdir = os.path.realpath(os.path.join(ns_dir, name))
                if (
                    not vdir.startswith(ns_dir + os.sep)
                    or os.path.dirname(vdir) != ns_dir
                ):
                    return self._error(400, f"invalid view name {name!r}")
                # tables and views share one identifier space (spec:
                # a view must not shadow a table and vice versa)
                if _is_iceberg_view(vdir) or _is_iceberg_table(vdir):
                    return self._already_exists(f"{ns}.{name} exists")
                now = int(time.time() * 1000)
                vv["version-id"] = 1
                vv.setdefault("timestamp-ms", now)
                vv.setdefault("summary", {})
                vv.setdefault("default-namespace", [ns])
                md = {
                    "view-uuid": str(uuid.uuid4()),
                    "format-version": 1,
                    "location": vdir,
                    "schemas": [schema],
                    "current-version-id": 1,
                    "versions": [vv],
                    "version-log": [
                        {"timestamp-ms": now, "version-id": 1}
                    ],
                    "properties": properties,
                }
                try:
                    _commit_view_metadata(vdir, md, 1)
                except FileExistsError:
                    return self._already_exists(
                        f"view {ns}.{name} exists"
                    )
                # cross-kind race arbiter: the link(2) CAS only
                # serializes same-kind creates (table and view metadata
                # are different filenames). If a concurrent CREATE TABLE
                # linked into this directory, the later of the two
                # observes the other's files here and rolls back its
                # own — at most one kind survives, never a silently
                # orphaned sibling. Direct FILE scan, not the hint fast
                # path (the racer's hint write may lag its link).
                from featureform_spark.sources.iceberg_protocol import (
                    IcebergProtocolTable,
                )

                if IcebergProtocolTable(None, vdir)._metadata_files():
                    mdir = os.path.join(vdir, "metadata")
                    for leftover in (
                        f"v1{_VIEW_SUFFIX}",
                        _VIEW_HINT,
                    ):
                        try:
                            os.unlink(os.path.join(mdir, leftover))
                        except OSError:
                            pass
                    return self._already_exists(
                        f"{ns}.{name} exists (created concurrently as "
                        "a table)"
                    )
                return self._json(
                    200,
                    {
                        "metadata-location": _current_view_metadata_file(
                            vdir
                        ),
                        "metadata": md,
                        "config": {},
                    },
                )

            def _commit_view(self, ns: str, name: str):
                """Spec CommitViewRequest (POST the view route):
                assert-view-uuid requirement + update actions applied
                to a copy of the TERMINAL metadata version, then CAS'd
                in — concurrent committers get the retryable 409."""
                vdir = self._view_dir(ns, name)
                if vdir is None:
                    return self._error(404, f"view {ns}.{name} not found")
                try:
                    req = self._read_body()
                except (ValueError, json.JSONDecodeError):
                    return self._error(400, "invalid CommitViewRequest")
                files = _view_metadata_files(vdir)
                cur_version, fname = files[-1]
                old_file = os.path.join(vdir, "metadata", fname)
                with open(old_file) as f:
                    md = json.load(f)
                now_ms = int(time.time() * 1000)
                try:
                    _check_view_requirements(
                        md, req.get("requirements") or []
                    )
                    new_md = _apply_view_updates(
                        md, req.get("updates") or [], now_ms
                    )
                except CommitConflict as exc:
                    return self._409(str(exc))
                except (ValueError, KeyError, TypeError) as exc:
                    return self._error(
                        400, f"bad view commit request: {exc}"
                    )
                try:
                    _commit_view_metadata(vdir, new_md, cur_version + 1)
                except FileExistsError:
                    return self._409(
                        f"view metadata version {cur_version + 1} "
                        "was committed concurrently"
                    )
                return self._json(
                    200,
                    {
                        "metadata-location": _current_view_metadata_file(
                            vdir
                        ),
                        "metadata": new_md,
                        "config": {},
                    },
                )

            def _rename_view(self):
                """Spec RenameViewRequest (POST /v1/views/rename):
                same contract as table rename — source view must exist
                (404), destination namespace must exist (404),
                destination name must be free of BOTH views and tables
                (409 AlreadyExists); rename(2) inside the confined
                root is the atomic move."""
                try:
                    req = self._read_body()
                    s, d = req["source"], req["destination"]
                    s_ns, s_name = s["namespace"][0], s["name"]
                    d_ns, d_name = d["namespace"][0], d["name"]
                    for part in (s_ns, s_name, d_ns, d_name):
                        if not isinstance(part, str) or not part:
                            raise ValueError(part)
                except (ValueError, json.JSONDecodeError, KeyError,
                        TypeError, IndexError):
                    return self._error(400, "invalid RenameViewRequest")
                src_dir = self._view_dir(s_ns, s_name)
                if src_dir is None:
                    return self._error(
                        404, f"view {s_ns}.{s_name} not found"
                    )
                root = os.path.realpath(outer.root)
                dns_dir = os.path.realpath(os.path.join(root, d_ns))
                if (
                    not dns_dir.startswith(root + os.sep)
                    or os.path.dirname(dns_dir) != root
                    or not os.path.isdir(dns_dir)
                ):
                    return self._error(
                        404, f"namespace {d_ns!r} not found"
                    )
                dst_dir = os.path.realpath(
                    os.path.join(dns_dir, d_name)
                )
                if (
                    not dst_dir.startswith(dns_dir + os.sep)
                    or os.path.dirname(dst_dir) != dns_dir
                ):
                    return self._error(400, f"invalid name {d_name!r}")
                if os.path.exists(dst_dir):
                    return self._already_exists(
                        f"{d_ns}.{d_name} exists"
                    )
                try:
                    os.rename(src_dir, dst_dir)
                except OSError as exc:
                    return self._error(500, f"rename failed: {exc}")
                self.send_response(204)
                self.end_headers()
                return None

            def _create_namespace(self):
                """Spec CreateNamespaceRequest: one directory level (a
                flat catalog — nested namespaces would create tables
                the list/load routes can't address). 409 AlreadyExists
                via mkdir's own atomicity."""
                try:
                    req = self._read_body()
                    levels = req["namespace"]
                    if (
                        not isinstance(levels, list)
                        or len(levels) != 1
                        or not isinstance(levels[0], str)
                        or not levels[0]
                    ):
                        raise ValueError(levels)
                    ns = levels[0]
                    properties = dict(req.get("properties") or {})
                    if not all(
                        isinstance(k, str) and isinstance(v, str)
                        for k, v in properties.items()
                    ):
                        raise ValueError(properties)
                except (ValueError, json.JSONDecodeError, KeyError,
                        TypeError, AttributeError):
                    return self._error(
                        400, "invalid CreateNamespaceRequest "
                        "(single-level namespace required)"
                    )
                root = os.path.realpath(outer.root)
                ns_dir = os.path.realpath(os.path.join(root, ns))
                if (
                    not ns_dir.startswith(root + os.sep)
                    or os.path.dirname(ns_dir) != root
                ):
                    return self._error(400, f"invalid namespace {ns!r}")
                try:
                    os.mkdir(ns_dir)
                except FileExistsError:
                    return self._already_exists(
                        f"namespace {ns!r} exists"
                    )
                if properties:
                    self._write_ns_props(ns_dir, properties)
                return self._json(
                    200, {"namespace": [ns], "properties": properties}
                )

            def do_DELETE(self):
                """Spec DropTable / DropNamespace: 204 on success;
                dropping a non-empty namespace is 409 (the spec's
                NamespaceNotEmptyException)."""
                kind, ns, name = self._route()
                if kind == "table":
                    tdir = self._table_dir(ns, name)
                    if tdir is None:
                        return self._error(
                            404, f"table {ns}.{name} not found"
                        )
                    import shutil as _shutil

                    try:
                        _shutil.rmtree(tdir)
                    except FileNotFoundError:
                        # lost the race to a concurrent DELETE: answer
                        # 404, never a dropped connection
                        return self._error(
                            404, f"table {ns}.{name} not found"
                        )
                    except OSError as exc:
                        return self._409(f"drop failed: {exc}")
                    self.send_response(204)
                    self.end_headers()
                    return
                if kind == "view":
                    vdir = self._view_dir(ns, name)
                    if vdir is None:
                        return self._error(
                            404, f"view {ns}.{name} not found"
                        )
                    import shutil as _shutil

                    try:
                        _shutil.rmtree(vdir)
                    except FileNotFoundError:
                        return self._error(
                            404, f"view {ns}.{name} not found"
                        )
                    except OSError as exc:
                        return self._409(f"drop failed: {exc}")
                    self.send_response(204)
                    self.end_headers()
                    return
                if kind == "namespace":
                    root = os.path.realpath(outer.root)
                    ns_dir = os.path.realpath(os.path.join(root, ns))
                    if not ns_dir.startswith(
                        root + os.sep
                    ) or not os.path.isdir(ns_dir):
                        return self._error(404, f"namespace {ns!r}")
                    import errno as _errno

                    def _rmdir():
                        # rmdir is the atomic emptiness check — a table
                        # created between a listdir and the rmdir would
                        # otherwise drop the connection (TOCTOU)
                        os.rmdir(ns_dir)

                    try:
                        try:
                            _rmdir()
                        except OSError as exc:
                            if isinstance(exc, FileNotFoundError):
                                raise
                            if exc.errno not in (
                                _errno.ENOTEMPTY, _errno.EEXIST
                            ):
                                raise  # EACCES/EBUSY etc: not ours
                            # the properties sidecar doesn't count as
                            # content — but only clear it when it is
                            # the SOLE entry, and RESTORE it if the
                            # retry still fails (a table created in the
                            # race window must not cost the namespace
                            # its properties on the way to the 409)
                            if os.listdir(ns_dir) != [
                                ".ns-properties.json"
                            ]:
                                raise
                            with outer._ns_props_lock:
                                saved = self._ns_props(ns_dir)
                                os.unlink(
                                    os.path.join(
                                        ns_dir, ".ns-properties.json"
                                    )
                                )
                                try:
                                    _rmdir()
                                except OSError:
                                    if saved:
                                        self._write_ns_props(
                                            ns_dir, saved
                                        )
                                    raise
                    except FileNotFoundError:
                        return self._error(404, f"namespace {ns!r}")
                    except OSError:
                        return self._json(
                            409,
                            {
                                "error": {
                                    "message": (
                                        f"namespace {ns!r} is not empty"
                                    ),
                                    "type": "NamespaceNotEmptyException",
                                    "code": 409,
                                }
                            },
                        )
                    self.send_response(204)
                    self.end_headers()
                    return
                return self._error(400, f"unknown route {self.path}")

            def _create_table(self, ns: str):
                """Spec CreateTableRequest: stage an EMPTY table (v1
                metadata, no snapshots) through the same O_EXCL log —
                external engines create here, then append through
                commit / append_arrow."""
                import time as _time
                import uuid as _uuid

                def _exists_409():
                    return self._already_exists(
                        f"table {ns}.{name} exists"
                    )

                # validate the ENTIRE request shape up front — any
                # malformed body is a clean 400, never a dead connection
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    name = req["name"]
                    if not isinstance(name, str) or not name:
                        raise ValueError("name must be a non-empty string")
                    schema = dict(req["schema"])
                    schema.setdefault("type", "struct")
                    schema.setdefault("schema-id", 0)
                    schema_id = int(schema["schema-id"])
                    fields = schema["fields"]
                    last_col_id = max(
                        (int(f["id"]) for f in fields), default=0
                    )
                    spec_fields = (req.get("partition-spec") or {}).get(
                        "fields"
                    )
                    properties = dict(req.get("properties") or {})
                except (ValueError, KeyError, TypeError,
                        AttributeError, json.JSONDecodeError):
                    return self._error(400, "invalid CreateTableRequest")
                if spec_fields:
                    return self._error(
                        400,
                        "partitioned create not supported over REST — "
                        "create unpartitioned, or create through the "
                        "engine API",
                    )
                root = os.path.realpath(outer.root)
                ns_dir = os.path.realpath(os.path.join(root, ns))
                if not ns_dir.startswith(root + os.sep) or not os.path.isdir(
                    ns_dir
                ):
                    return self._error(404, f"namespace {ns!r}")
                tdir = os.path.realpath(os.path.join(ns_dir, name))
                # confine AND flat: 'sub/t' would create a table no
                # read/list/commit route can ever address
                if (
                    not tdir.startswith(ns_dir + os.sep)
                    or os.path.dirname(tdir) != ns_dir
                ):
                    return self._error(400, f"invalid table name {name!r}")
                from featureform_spark.sources.iceberg_protocol import (
                    IcebergProtocolTable,
                )

                t = IcebergProtocolTable(None, tdir)
                # check for actual metadata VERSIONS, not a bare
                # metadata/ dir — a crash between makedirs and the
                # O_EXCL link must not brick the name; the link below
                # stays the sole arbiter of the race. Views share the
                # identifier space: a view at this name is a 409 too.
                if t._metadata_files() or _is_iceberg_view(tdir):
                    return _exists_409()
                now = int(_time.time() * 1000)
                md = {
                    "format-version": 2,
                    "table-uuid": str(_uuid.uuid4()),
                    "location": tdir,
                    "last-sequence-number": 0,
                    "last-updated-ms": now,
                    "last-column-id": last_col_id,
                    "current-schema-id": schema_id,
                    "schemas": [schema],
                    "default-spec-id": 0,
                    "partition-specs": [{"spec-id": 0, "fields": []}],
                    "last-partition-id": 999,
                    "default-sort-order-id": 0,
                    "sort-orders": [{"order-id": 0, "fields": []}],
                    "properties": properties,
                    "current-snapshot-id": -1,
                    "snapshots": [],
                    "snapshot-log": [],
                    "metadata-log": [],
                }
                try:
                    t._commit_metadata(md, 1)
                except FileExistsError:
                    return _exists_409()
                # cross-kind race arbiter (see _create_view): a
                # concurrent CREATE VIEW's link is a different filename,
                # so the CAS alone cannot surface it — the later
                # creator rolls its own link back and answers 409
                if _view_metadata_files(tdir):
                    for leftover in (
                        "v1.metadata.json",
                        "version-hint.text",
                    ):
                        try:
                            os.unlink(
                                os.path.join(t.metadata_path, leftover)
                            )
                        except OSError:
                            pass
                    return self._already_exists(
                        f"{ns}.{name} exists (created concurrently as "
                        "a view)"
                    )
                return self._json(
                    200,
                    {
                        "metadata-location": t._current_metadata_file(),
                        "metadata": md,
                    },
                )

            def do_HEAD(self):
                kind, ns, name = self._route()
                if kind == "table":
                    code = 200 if self._table_dir(ns, name) else 404
                    self.send_response(code)
                    self.end_headers()
                    return
                if kind == "view":
                    code = 200 if self._view_dir(ns, name) else 404
                    self.send_response(code)
                    self.end_headers()
                    return
                self.send_response(400)
                self.end_headers()

        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    def shutdown(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "IcebergRestCatalogServer":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def analyze_rest_table(
    spark,
    base_url: str,
    namespace: str,
    table: str,
    columns=None,
    lg_k: int = 12,
) -> dict:
    """Client-side ANALYZE against a REST-catalog table: load the
    table (LoadTableResult → metadata-location → storage path),
    compute the NDV theta sketches and the Puffin statistics file with
    ``IcebergProtocolTable.analyze_table``, then REGISTER the
    resulting entry through the catalog's ``set-statistics`` commit
    action — so the CATALOG's metadata pointer carries the statistics
    even though the sketch compute ran engine-side (the split real
    deployments use: Trino/Spark compute, the REST catalog owns the
    commit). Returns the committed ndv estimates.

    The direct analyze_table commit already CAS-bumped the table's own
    metadata files; the REST commit here re-registers the SAME entry
    through the catalog so wire-level readers (LoadTableResult
    consumers that trust the catalog pointer) observe it — the action
    is idempotent per snapshot (set-statistics replaces)."""
    import urllib.request

    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    base = base_url.rstrip("/")
    url = f"{base}/v1/namespaces/{namespace}/tables/{table}"
    with urllib.request.urlopen(url) as r:
        loaded = json.loads(r.read())
    location = loaded["metadata"]["location"]
    t = IcebergProtocolTable(spark, location)
    t.analyze_table(columns=columns, lg_k=lg_k)
    md = t.metadata()
    sid = int(t.current_snapshot(md)["snapshot-id"])
    entry = next(
        e
        for e in md["statistics"]
        if int(e["snapshot-id"]) == sid
    )
    body = json.dumps(
        {
            "updates": [
                {"action": "set-statistics", "statistics": entry}
            ]
        }
    ).encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        res = json.loads(r.read())
    committed = res["metadata"].get("statistics") or []
    assert any(int(e["snapshot-id"]) == sid for e in committed)
    return t.ndv_estimates()
