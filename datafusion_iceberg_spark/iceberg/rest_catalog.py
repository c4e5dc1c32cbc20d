"""Iceberg REST catalog client + eager mirror — the Spark rebuild of the
reference's second crate (datafusion_iceberg_catalog_rest):

- :class:`RestCatalogClient` speaks the public Iceberg REST catalog API
  (GET /v1/namespaces, /v1/namespaces/{ns}/tables,
  /v1/namespaces/{ns}/tables/{t}, POST /v1/namespaces/{ns}/register,
  DELETE /v1/namespaces/{ns}/tables/{t}) over stdlib urllib — the role
  iceberg_catalog_rest_client plays for the reference
  (catalog_rest/src/catalog.rs:57-81 builds the HTTP Configuration).
- :class:`RestCatalog` eagerly walks list_namespaces → list_tables →
  load_table into an in-memory mirror exactly like ``Mirror::new``
  (catalog_rest/src/mirror.rs:23-53), exposing the same surface as the
  filesystem :class:`~datafusion_iceberg_spark.iceberg.catalog.Catalog`.
  register/drop write back to the remote catalog **synchronously** —
  the reference spawns these calls on a LocalPool it never polls
  (mirror.rs:123-144, 175-183; SURVEY.md §4.4 bug #3), leaving the
  remote stale.  Ours completes the HTTP call before returning.
- :class:`LocalRestServer` is an in-process test double backed by a
  warehouse directory, standing in for the ``localhost:8080`` REST
  catalog the reference's gated integration test expects
  (catalog_rest/src/catalog.rs:73, 83-135).

Table metadata arriving over REST is parsed with
:func:`metadata_from_dict`; data/manifest IO then routes through the
FileIO registry (io.py), so a REST catalog pointing at ``file://`` or
``s3://`` warehouses uses one code path.
"""

from __future__ import annotations

import copy
import glob
import json
import os
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from datafusion_iceberg_spark.iceberg.catalog import SqlSurface
from datafusion_iceberg_spark.iceberg.metadata import metadata_from_dict
from datafusion_iceberg_spark.iceberg.table import IcebergTable
from datafusion_iceberg_spark.iceberg.writer import IcebergWriter


class RestCatalogClient:
    """Iceberg REST catalog API client: reads, register/drop, OAuth2
    client-credentials auth, paginated listings, and the table COMMIT
    endpoint (CommitTableRequest — see :mod:`rest_commit`).

    ``credential`` is the spec's ``client_id:client_secret`` pair,
    exchanged for a bearer token at ``POST /v1/oauth/tokens``
    (grant_type=client_credentials); ``token`` passes a static bearer
    token directly.  Either way every request carries
    ``Authorization: Bearer <token>``."""

    def __init__(
        self,
        base_url: str,
        prefix: str = "",
        token: Optional[str] = None,
        credential: Optional[str] = None,
    ):
        self.base = base_url.rstrip("/")
        self.prefix = f"/{prefix.strip('/')}" if prefix else ""
        self._token = token
        if token is None and credential is not None:
            self._token = self._fetch_token(credential)

    def _fetch_token(self, credential: str) -> str:
        """OAuth2 client-credentials exchange (form-encoded, per the
        REST spec's tokens endpoint)."""
        cid, _, secret = credential.partition(":")
        form = urllib.parse.urlencode(
            {
                "grant_type": "client_credentials",
                "client_id": cid,
                "client_secret": secret,
                "scope": "catalog",
            }
        ).encode()
        req = urllib.request.Request(
            f"{self.base}/v1/oauth/tokens",
            data=form,
            method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        with urllib.request.urlopen(req) as resp:
            out = json.loads(resp.read())
        return out["access_token"]

    def _url(self, path: str) -> str:
        return f"{self.base}/v1{self.prefix}{path}"

    def _request(self, method: str, path: str, body: Optional[dict] = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        headers = {"Content-Type": "application/json"}
        if self._token:
            headers["Authorization"] = f"Bearer {self._token}"
        req = urllib.request.Request(
            self._url(path), data=data, method=method, headers=headers
        )
        with urllib.request.urlopen(req) as resp:
            payload = resp.read()
        return json.loads(payload) if payload else {}

    def _paged(self, path: str, key: str) -> list:
        """Follow ``next-page-token`` pagination until exhausted — a
        catalog with 10⁵ tables streams in pages instead of one
        unbounded response."""
        out: list = []
        token: Optional[str] = None
        while True:
            q = (
                f"?pageToken={urllib.parse.quote(token, safe='')}"
                if token
                else ""
            )
            res = self._request("GET", f"{path}{q}")
            out.extend(res.get(key, []))
            token = res.get("next-page-token")
            if not token:
                return out

    # -- read side (mirror.rs:23-53 walk) ----------------------------------

    def list_namespaces(self) -> list[str]:
        return [
            ".".join(ns) for ns in self._paged("/namespaces", "namespaces")
        ]

    def list_tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace, safe="")
        return [
            ident["name"]
            for ident in self._paged(
                f"/namespaces/{ns}/tables", "identifiers"
            )
        ]

    def load_table(self, namespace: str, name: str) -> dict:
        """→ LoadTableResult: {"metadata-location": ..., "metadata": {...}}"""
        ns = urllib.parse.quote(namespace, safe="")
        return self._request("GET", f"/namespaces/{ns}/tables/{name}")

    # -- write-back (synchronous; contrast mirror.rs:123-144) --------------

    def create_namespace(self, namespace: str) -> None:
        """Ensure-exists semantics: the spec's AlreadyExistsError (409)
        is benign — internal callers (create_table, register) use this
        to guarantee the parent namespace; SQL-level duplicate detection
        happens against the listing before this call."""
        import urllib.error

        try:
            self._request(
                "POST", "/namespaces", {"namespace": namespace.split(".")}
            )
        except urllib.error.HTTPError as e:
            if e.code != 409:
                raise

    def drop_namespace(self, namespace: str) -> None:
        ns = urllib.parse.quote(namespace, safe="")
        self._request("DELETE", f"/namespaces/{ns}")

    def load_namespace(self, namespace: str) -> dict:
        """GET /v1/namespaces/{ns} → {"namespace": [...], "properties": {}}"""
        ns = urllib.parse.quote(namespace, safe="")
        return self._request("GET", f"/namespaces/{ns}")

    def update_namespace_properties(
        self, namespace: str, updates: dict, removals=None
    ) -> dict:
        """POST /v1/namespaces/{ns}/properties
        (UpdateNamespacePropertiesRequest → {updated, removed, missing})."""
        ns = urllib.parse.quote(namespace, safe="")
        return self._request(
            "POST",
            f"/namespaces/{ns}/properties",
            {"removals": list(removals or []), "updates": dict(updates or {})},
        )

    def register_table(
        self, namespace: str, name: str, metadata_location: str
    ) -> dict:
        ns = urllib.parse.quote(namespace, safe="")
        return self._request(
            "POST",
            f"/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def drop_table(self, namespace: str, name: str) -> None:
        ns = urllib.parse.quote(namespace, safe="")
        self._request("DELETE", f"/namespaces/{ns}/tables/{name}")

    # -- view endpoints (Iceberg REST view spec) ----------------------------

    def list_views(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace, safe="")
        return [
            ident["name"]
            for ident in self._paged(f"/namespaces/{ns}/views", "identifiers")
        ]

    def load_view(self, namespace: str, name: str) -> dict:
        """→ LoadViewResult: {"metadata-location": ..., "metadata": {...}}"""
        ns = urllib.parse.quote(namespace, safe="")
        return self._request("GET", f"/namespaces/{ns}/views/{name}")

    def create_view(
        self, namespace: str, name: str, sql: str, dialect: str = "spark"
    ) -> dict:
        """POST /v1/namespaces/{ns}/views — CreateViewRequest; the
        SERVICE owns and persists the view metadata (the reference's
        mirror carries Relation::View the same way, mirror.rs:34,67-78)."""
        ns = urllib.parse.quote(namespace, safe="")
        body = {
            "name": name,
            "view-version": {
                "version-id": 1,
                "schema-id": 0,
                "summary": {"operation": "create"},
                "representations": [
                    {"type": "sql", "sql": sql, "dialect": dialect}
                ],
                "default-namespace": [namespace],
            },
            "schema": {"type": "struct", "schema-id": 0, "fields": []},
            "properties": {},
        }
        return self._request("POST", f"/namespaces/{ns}/views", body)

    def drop_view(self, namespace: str, name: str) -> None:
        ns = urllib.parse.quote(namespace, safe="")
        self._request("DELETE", f"/namespaces/{ns}/views/{name}")

    def commit_view(
        self, namespace: str, name: str, sql: str, dialect: str = "spark"
    ) -> dict:
        """POST /v1/namespaces/{ns}/views/{view} — CommitViewRequest
        carrying add-view-version + set-current-view-version (-1 = the
        version just added, per spec), so REPLACE VIEW is a versioned
        commit, not a drop+create."""
        ns = urllib.parse.quote(namespace, safe="")
        body = {
            "identifier": {"namespace": namespace.split("."), "name": name},
            "requirements": [],
            "updates": [
                {
                    "action": "add-view-version",
                    "view-version": {
                        "schema-id": 0,
                        "summary": {"operation": "replace"},
                        "representations": [
                            {"type": "sql", "sql": sql, "dialect": dialect}
                        ],
                        "default-namespace": [namespace],
                    },
                },
                {"action": "set-current-view-version", "view-version-id": -1},
            ],
        }
        return self._request("POST", f"/namespaces/{ns}/views/{name}", body)

    # -- service-owned writes (CreateTableRequest / CommitTableRequest) ----

    def create_table(
        self,
        namespace: str,
        name: str,
        schema: dict,
        partition_spec: Optional[dict] = None,
        write_order: Optional[dict] = None,
        properties: Optional[dict] = None,
        location: Optional[str] = None,
    ) -> dict:
        """POST /v1/namespaces/{ns}/tables — the SERVICE assigns the
        location (unless given) and writes v0 metadata; the client never
        touches a metadata file.  → LoadTableResult."""
        ns = urllib.parse.quote(namespace, safe="")
        body: dict = {"name": name, "schema": schema}
        if partition_spec is not None:
            body["partition-spec"] = partition_spec
        if write_order is not None:
            body["write-order"] = write_order
        if properties:
            body["properties"] = properties
        if location:
            body["location"] = location
        return self._request("POST", f"/namespaces/{ns}/tables", body)

    def commit_table(
        self,
        namespace: str,
        name: str,
        requirements: list,
        updates: list,
    ) -> dict:
        """POST /v1/namespaces/{ns}/tables/{t} — CommitTableRequest.
        HTTP 409 (a requirement failed against the service's current
        metadata) surfaces as :class:`writer.CommitConflict` so every
        existing optimistic-retry loop re-plans against a fresh GET."""
        from datafusion_iceberg_spark.iceberg.writer import CommitConflict

        ns = urllib.parse.quote(namespace, safe="")
        try:
            return self._request(
                "POST",
                f"/namespaces/{ns}/tables/{name}",
                {
                    "identifier": {
                        "namespace": namespace.split("."),
                        "name": name,
                    },
                    "requirements": requirements,
                    "updates": updates,
                },
            )
        except urllib.error.HTTPError as e:
            if e.code == 409:
                detail = e.read().decode("utf-8", "replace")
                raise CommitConflict(
                    f"{namespace}.{name}: commit rejected by catalog "
                    f"service: {detail}"
                ) from None
            raise

    def commit_transaction(self, table_changes: list) -> None:
        """POST /v1/transactions/commit — atomic multi-table commit.
        Each change is a CommitTableRequest dict (identifier +
        requirements + updates); the service validates every table's
        requirements before publishing any version."""
        from datafusion_iceberg_spark.iceberg.writer import CommitConflict

        try:
            self._request(
                "POST",
                "/transactions/commit",
                {"table-changes": table_changes},
            )
        except urllib.error.HTTPError as e:
            if e.code == 409:
                detail = e.read().decode("utf-8", "replace")
                raise CommitConflict(
                    f"transaction rejected by catalog service: {detail}"
                ) from None
            raise


class RestCommitWriter(IcebergWriter):
    """An :class:`IcebergWriter` whose metadata lifecycle is owned by a
    REST catalog service: current metadata comes from ``GET tables/{t}``
    and every commit goes through the COMMIT endpoint as typed updates —
    the client never writes ``vN.metadata.json``.

    Data, manifest, and puffin files still land at the table's
    ``location`` through the normal write path (exactly as real REST
    catalog clients write data files directly to object storage and
    commit only the metadata delta).  Because ALL of the parent's
    mutations funnel through ``_load_current`` → mutate →
    ``_commit_metadata``, overriding those two methods routes the entire
    DML/DDL/maintenance surface — append, COW/MOR/DV delete, update,
    MERGE, schema evolution, refs, expiration — through the service,
    and a 409 maps to :class:`CommitConflict` so the parent's existing
    optimistic-retry loops re-plan against a fresh GET."""

    def __init__(
        self, client: RestCatalogClient, namespace: str, name: str, **kw
    ):
        super().__init__(**kw)
        self._client = client
        self._rest_ns = namespace
        self._rest_name = name
        self._base_meta: Optional[dict] = None

    def _load_current(self) -> dict:
        res = self._client.load_table(self._rest_ns, self._rest_name)
        meta = res["metadata"]
        self._base_meta = copy.deepcopy(meta)
        return meta

    def _load_table(self) -> IcebergTable:
        # read-side view resolved through the SERVICE, not local disk
        res = self._client.load_table(self._rest_ns, self._rest_name)
        return IcebergTable(
            metadata_from_dict(
                res["metadata"], res.get("metadata-location", "")
            )
        )

    def _commit_metadata(self, meta: dict) -> None:
        from datafusion_iceberg_spark.iceberg.rest_commit import (
            metadata_updates,
        )

        if self._base_meta is None:
            raise RuntimeError(
                "commit without a loaded base — call _load_current first"
            )
        reqs, ups = metadata_updates(self._base_meta, meta)
        self._client.commit_table(
            self._rest_ns, self._rest_name, reqs, ups
        )

    def create(self, properties: Optional[dict] = None) -> None:
        raise NotImplementedError(
            "REST tables are created by the service — use "
            "RestCatalog.create_table (CreateTableRequest)"
        )


class _StagedRestWriter(RestCommitWriter):
    """A :class:`RestCommitWriter` participating in a multi-table
    transaction: reads chain through the transaction's PENDING metadata
    (so a second operation on the same table sees the first's staged
    commit) and ``_commit_metadata`` stages instead of POSTing — the
    transaction sends everything at once via
    ``POST /v1/transactions/commit``."""

    def __init__(self, txn: "RestTransaction", ident: str, **kw):
        super().__init__(**kw)
        self._txn = txn
        self._ident = ident

    def _load_current(self) -> dict:
        if self._ident in self._txn._pending:
            meta = copy.deepcopy(self._txn._pending[self._ident])
            self._base_meta = copy.deepcopy(meta)
            return meta
        meta = super()._load_current()
        self._txn._base.setdefault(self._ident, copy.deepcopy(meta))
        return meta

    def _load_table(self) -> IcebergTable:
        if self._ident in self._txn._pending:
            return IcebergTable(
                metadata_from_dict(
                    copy.deepcopy(self._txn._pending[self._ident]),
                    self._txn._pending[self._ident].get("location", ""),
                )
            )
        return super()._load_table()

    def _commit_metadata(self, meta: dict) -> None:
        from datafusion_iceberg_spark.iceberg.rest_commit import (
            metadata_updates,
        )

        if self._ident not in self._txn._base:
            self._txn._base[self._ident] = copy.deepcopy(self._base_meta)
        # fail-fast: refuse to stage a mutation the commit protocol
        # cannot express (same self-check the immediate path runs)
        metadata_updates(self._txn._base[self._ident], meta)
        self._txn._pending[self._ident] = copy.deepcopy(meta)


class RestTransaction:
    """Atomic multi-table commit over the REST catalog
    (``POST /v1/transactions/commit``): every staged operation's DATA
    files are written as it runs, but no table's metadata moves until
    :meth:`commit` sends one CommitTransactionRequest — the service
    validates every table's requirements first and then publishes all
    versions, so readers never observe a partial cross-table state.
    Usable as a context manager (commit on clean exit, discard on
    exception — staged data files become orphans for
    ``remove_orphan_files``, exactly Iceberg's abandoned-commit story).
    """

    def __init__(self, catalog: "RestCatalog"):
        self._cat = catalog
        self._base: dict[str, dict] = {}
        self._pending: dict[str, dict] = {}
        self._done = False

    def writer(self, ident: str) -> _StagedRestWriter:
        ns, name = ident.rsplit(".", 1)
        if ident in self._pending:
            meta = metadata_from_dict(
                copy.deepcopy(self._pending[ident]),
                self._pending[ident].get("location", ""),
            )
        else:
            meta = self._cat._mirror[ident].metadata
        return _StagedRestWriter(
            self,
            ident,
            client=self._cat.client,
            namespace=ns,
            name=name,
            **_writer_kwargs(meta),
        )

    # the staged operation surface (each writes data files now, stages
    # the metadata commit)
    def append(
        self, ident: str, spark, df, merge_schema=None, wap_id=None
    ) -> int:
        return self.writer(ident).append(
            spark, df, merge_schema=merge_schema, wap_id=wap_id
        )

    def overwrite(self, ident: str, spark, df) -> int:
        return self.writer(ident).overwrite(spark, df)

    def delete_where(self, ident: str, spark, pred) -> int:
        return self.writer(ident).delete(spark, pred)

    def delete_where_dv(self, ident: str, spark, pred) -> int:
        return self.writer(ident).delete_where_dv(spark, pred)

    def update_where(self, ident: str, spark, pred, set_exprs: dict) -> int:
        return self.writer(ident).update(spark, pred, set_exprs)

    def merge_into(self, ident: str, spark, source, on, **kw) -> int:
        return self.writer(ident).merge(spark, source, on, **kw)

    def upsert(self, ident: str, spark, df, on=None, merge_schema=None) -> int:
        return self.writer(ident).upsert(spark, df, on, merge_schema=merge_schema)

    def add_column(self, ident: str, name: str, dtype, default=None) -> int:
        return self.writer(ident).add_column(name, dtype, default)

    def set_properties(self, ident: str, props: dict) -> None:
        self.writer(ident).set_properties(props)

    def commit(self) -> None:
        """All-or-nothing publish of every staged table."""
        from datafusion_iceberg_spark.iceberg.rest_commit import (
            metadata_updates,
        )

        if self._done:
            raise RuntimeError("transaction already finished")
        self._done = True
        if not self._pending:
            return
        changes = []
        for ident, final in self._pending.items():
            ns, name = ident.rsplit(".", 1)
            reqs, ups = metadata_updates(self._base[ident], final)
            changes.append(
                {
                    "identifier": {"namespace": ns.split("."), "name": name},
                    "requirements": reqs,
                    "updates": ups,
                }
            )
        self._cat.client.commit_transaction(changes)
        for ident in self._pending:
            self._cat._refresh(ident)

    def __enter__(self) -> "RestTransaction":
        return self

    def __exit__(self, exc_type, *exc) -> None:
        if exc_type is None and not self._done:
            self.commit()
        else:
            self._done = True  # discard staged state


def _writer_kwargs(meta) -> dict:
    """Writer construction kwargs from a TableMetadata — shared by the
    immediate and transactional REST writers (mirrors Catalog.writer)."""
    return dict(
        root=meta.root,
        schema=meta.struct_type(),
        partition_by=meta.partition_spec_entries(),
        field_ids=meta.field_ids_by_name(),
        sort_by=meta.sort_order_columns(),
        spec_id=meta.default_spec_id,
        iceberg_types={
            f["name"]: f["type"] for f in meta.current_schema["fields"]
        },
        last_column_id=meta.last_column_id,
        write_defaults={
            f["name"]: f["write-default"]
            for f in meta.current_schema["fields"]
            if f.get("write-default") is not None
        },
    )


class RestCatalog(SqlSurface):
    """Eager mirror over a REST catalog (Mirror::new analogue) exposing
    the same query surface as the filesystem Catalog — including, via
    the shared :class:`SqlSurface` mixin, 3-part names, time travel
    (``FOR VERSION/TIMESTAMP AS OF``, refs) and ``$``-metadata tables."""

    def __init__(
        self,
        client: RestCatalogClient,
        name: str = "rest",
        eager: bool = False,
    ):
        self.client = client
        self.name = name
        self._mirror: dict[str, IcebergTable] = {}
        self._locations: dict[str, str] = {}
        self._namespaces: set[str] = set()
        self._known: dict[str, str] = {}  # ident -> "table" | "view"
        self.refresh()
        if eager:
            self.prefetch()

    def prefetch(self) -> None:
        """Resolve EVERY listed relation now (the r2-r9 behavior, and
        the reference's Mirror::new walk): callers that query after the
        service goes away need the metadata cached up front."""
        for ident in self._relation_keys():
            self._resolve(ident)

    def refresh(self, ident: Optional[str] = None) -> None:
        """Mirror rebuild, or one table (REFRESH TABLE ident).  The walk
        is LAZY (r10, VERDICT r9 #2): only the namespace/table/view
        LISTINGS load here; metadata GETs happen on first reference via
        :meth:`_resolve` — a catalog with 10⁴ tables costs 10⁴ paged
        list rows at attach, not 10⁴ LoadTableResult round-trips."""
        if ident is not None:
            self._refresh(ident)
            return
        self._mirror.clear()
        self._locations.clear()
        self._known.clear()
        self._namespaces = set(self.client.list_namespaces())
        for ns in self._namespaces:
            for t in self.client.list_tables(ns):
                self._known[f"{ns}.{t}"] = "table"
            for v in self.client.list_views(ns):
                self._known[f"{ns}.{v}"] = "view"

    def _resolve(self, ident: str):
        """The relation for ``ident``, loading metadata over the wire on
        first reference and caching it in the mirror."""
        rel = self._mirror.get(ident)
        if rel is not None:
            return rel
        if ident not in self._known:
            raise KeyError(ident)
        ns, name = ident.rsplit(".", 1)
        if self._known[ident] == "view":
            from datafusion_iceberg_spark.iceberg.view import IcebergView

            res = self.client.load_view(ns, name)
            rel = IcebergView(res["metadata"], res.get("metadata-location", ""))
        else:
            res = self.client.load_table(ns, name)
            meta = metadata_from_dict(
                res["metadata"], res.get("metadata-location", "")
            )
            rel = IcebergTable(meta)
        self._mirror[ident] = rel
        self._locations[ident] = res.get("metadata-location", "")
        return rel

    def _relation_keys(self) -> list:
        return sorted(set(self._known) | set(self._mirror))

    def _rel(self, key: str):
        return self._resolve(key)

    # -- read surface -------------------------------------------------------

    def namespaces(self) -> list[str]:
        return sorted(
            self._namespaces
            | {k.rsplit(".", 1)[0] for k in self._relation_keys()}
        )

    def create_namespace(self, ns: str) -> None:
        """CREATE NAMESPACE through the service (POST /v1/namespaces),
        remote first — the cached set updates only on success."""
        self.client.create_namespace(ns)
        self._namespaces.add(ns)

    def drop_namespace(self, ns: str) -> None:
        """DROP NAMESPACE through the service (DELETE
        /v1/namespaces/{ns}); the service enforces RESTRICT (409 while
        tables remain)."""
        self.client.drop_namespace(ns)
        self._namespaces.discard(ns)

    def namespace_properties(self, ns: str) -> dict:
        return self.client.load_namespace(ns).get("properties", {})

    def update_namespace_properties(
        self, ns: str, updates: dict, removals=None
    ) -> dict:
        return self.client.update_namespace_properties(ns, updates, removals)

    def table_names(self, ns: Optional[str] = None) -> list[str]:
        keys = self._relation_keys()
        return keys if ns is None else [k for k in keys if k.startswith(ns + ".")]

    def table_exists(self, ident: str) -> bool:
        return ident in self._known or ident in self._mirror

    def load(self, ident: str) -> IcebergTable:
        return self._resolve(ident)

    def metadata_location(self, ident: str) -> str:
        self._resolve(ident)
        return self._locations[ident]

    # -- synchronous write-back (A16 with reference bug #3 fixed) -----------

    def register_table(self, ident: str, metadata_location: str) -> IcebergTable:
        ns, name = ident.rsplit(".", 1)
        res = self.client.register_table(ns, name, metadata_location)
        meta = metadata_from_dict(
            res["metadata"], res.get("metadata-location", metadata_location)
        )
        table = IcebergTable(meta)
        self._mirror[ident] = table
        self._known[ident] = "table"
        self._locations[ident] = res.get("metadata-location", metadata_location)
        return table

    def drop(self, ident: str) -> None:
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        ns, name = ident.rsplit(".", 1)
        kind = (
            "view"
            if isinstance(self._mirror.get(ident), IcebergView)
            else self._known.get(ident, "table")
        )
        if kind == "view":
            self.client.drop_view(ns, name)  # remote FIRST, then mirror —
        else:
            self.client.drop_table(ns, name)  # never a split-brain
        self._mirror.pop(ident, None)
        self._known.pop(ident, None)
        self._locations.pop(ident, None)

    def replace_view(self, ident: str, sql: str):
        """REPLACE VIEW as a versioned commit THROUGH the service
        (CommitViewRequest add-view-version) — prior versions stay in
        the service-side version log."""
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        ns, name = ident.rsplit(".", 1)
        res = self.client.commit_view(ns, name, sql)
        view = IcebergView(res["metadata"], res.get("metadata-location", ""))
        self._mirror[ident] = view
        self._known[ident] = "view"
        return view

    def create_view(self, ident: str, sql: str):
        """CREATE VIEW committed THROUGH the service (CreateViewRequest);
        the mirror holds the returned metadata, and a fresh client sees
        the view (reference parity: Relation::View through the mirror,
        mirror.rs:34,67-78 via table.rs:102-112)."""
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        ns, name = ident.rsplit(".", 1)
        self.client.create_namespace(ns)
        self._namespaces.add(ns)
        res = self.client.create_view(ns, name, sql)
        view = IcebergView(res["metadata"], res.get("metadata-location", ""))
        self._mirror[ident] = view
        self._known[ident] = "view"
        return view

    # -- write-through commits (service-owned metadata) ---------------------

    def _refresh(self, ident: str) -> None:
        ns, name = ident.rsplit(".", 1)
        res = self.client.load_table(ns, name)
        meta = metadata_from_dict(
            res["metadata"], res.get("metadata-location", "")
        )
        self._mirror[ident] = IcebergTable(meta)
        self._known[ident] = "table"
        self._locations[ident] = res.get("metadata-location", "")

    def create_table(
        self,
        ident: str,
        schema,
        partition_by: Optional[list[str]] = None,
        sort_by: Optional[list[str]] = None,
        properties: Optional[dict] = None,
        iceberg_types: Optional[dict] = None,
    ):
        """CreateTableRequest: the SERVICE builds and stores v0 metadata
        (contrast :class:`Catalog.create_table`, which writes it
        locally).  Returns a :class:`RestCommitWriter` for the table.
        ``iceberg_types`` as in :meth:`Catalog.create_table`."""
        ns, name = ident.rsplit(".", 1)
        # a throwaway writer only to shape the Iceberg-JSON schema/spec/
        # order bodies from Spark types (no file is written)
        shaper = IcebergWriter(
            "/tmp/_rest_shape", schema, partition_by, sort_by=sort_by
        )
        if iceberg_types:
            shaper.iceberg_types.update(iceberg_types)
        self.client.create_namespace(ns)
        self.client.create_table(
            ns,
            name,
            shaper._schema_json(),
            shaper._spec_json(),
            shaper._sort_order_json() if sort_by else None,
            properties,
        )
        self._refresh(ident)
        return self.writer(ident)

    def writer(self, ident: str) -> RestCommitWriter:
        """A writer whose commits go through the REST commit endpoint —
        same construction as :class:`Catalog.writer`, REST lifecycle."""
        ns, name = ident.rsplit(".", 1)
        meta = self._resolve(ident).metadata
        return RestCommitWriter(
            self.client, ns, name, **_writer_kwargs(meta)
        )

    def _commit_op(self, ident: str, fn, attempts: int = 3):
        """Run a writer operation with the same re-plan-on-conflict loop
        as :meth:`Catalog._replan`, refreshing from the service."""
        from datafusion_iceberg_spark.iceberg.writer import RewriteConflict

        for attempt in range(attempts):
            try:
                out = fn()
                self._refresh(ident)
                return out
            except RewriteConflict:
                if attempt == attempts - 1:
                    raise
                self._refresh(ident)

    def append(
        self,
        ident: str,
        spark: SparkSession,
        df: DataFrame,
        merge_schema=None,
        wap_id=None,
    ) -> int:
        """Append; ``wap_id`` stages the snapshot WAP-style — the diff
        commit sends add-snapshot WITHOUT set-snapshot-ref, so the
        service's main ref stays put until publish_changes."""
        return self._commit_op(
            ident,
            lambda: self.writer(ident).append(
                spark, df, merge_schema=merge_schema, wap_id=wap_id
            ),
        )

    def overwrite(
        self, ident: str, spark: SparkSession, df: DataFrame
    ) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).overwrite(spark, df)
        )

    def delete_where(self, ident: str, spark: SparkSession, pred) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).delete(spark, pred)
        )

    def overwrite_partitions(
        self, ident: str, spark: SparkSession, df: DataFrame
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).overwrite_partitions(spark, df),
        )

    def delete_where_dv(self, ident: str, spark: SparkSession, pred) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).delete_where_dv(spark, pred)
        )

    def update_where(
        self, ident: str, spark: SparkSession, pred, set_exprs: dict
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).update(spark, pred, set_exprs),
        )

    def merge_into(
        self,
        ident: str,
        spark: SparkSession,
        source: DataFrame,
        on,
        when_matched_set=None,
        insert_not_matched: bool = True,
        when_matched_delete: bool = False,
        clauses=None,
        merge_schema=None,
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).merge(
                spark,
                source,
                on,
                when_matched_set,
                insert_not_matched,
                when_matched_delete,
                clauses=clauses,
                merge_schema=merge_schema,
            ),
        )

    def add_column(self, ident: str, name: str, dtype, default=None) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).add_column(name, dtype, default)
        )

    def set_properties(
        self, ident: str, updates: dict, removes: Optional[list] = None
    ) -> None:
        self._commit_op(
            ident, lambda: self.writer(ident).set_properties(updates, removes)
        )

    def expire_snapshots(
        self,
        ident: str,
        keep_last: int = 1,
        older_than_ms: Optional[int] = None,
    ) -> dict:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).expire_snapshots(
                keep_last, older_than_ms
            ),
        )

    def delete_where_mor(self, ident: str, spark: SparkSession, pred) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).delete_where_mor(spark, pred)
        )

    def delete_where_eq(
        self, ident: str, spark: SparkSession, keys_df: DataFrame
    ) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).delete_where_eq(spark, keys_df)
        )

    def set_identifier_fields(self, ident: str, columns: list) -> None:
        self._commit_op(
            ident, lambda: self.writer(ident).set_identifier_fields(columns)
        )

    def set_sort_order(self, ident: str, columns: list) -> None:
        self._commit_op(
            ident, lambda: self.writer(ident).set_sort_order(columns)
        )

    def compute_table_stats(
        self, ident: str, spark: SparkSession, columns=None
    ) -> dict:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).compute_table_stats(spark, columns),
        )

    def table_stats(self, ident: str) -> dict:
        return self.writer(ident).table_stats()

    def upsert(
        self,
        ident: str,
        spark: SparkSession,
        df: DataFrame,
        on=None,
        merge_schema=None,
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).upsert(
                spark, df, on, merge_schema=merge_schema
            ),
        )

    def update_where_mor(
        self, ident: str, spark: SparkSession, pred, set_exprs: dict
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).update_where_mor(
                spark, pred, set_exprs
            ),
        )

    def compact(
        self,
        ident: str,
        spark: SparkSession,
        target_file_bytes: int = 128 << 20,
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).compact(spark, target_file_bytes),
        )

    def rollback_to_snapshot(self, ident: str, snapshot_id: int) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).rollback_to_snapshot(snapshot_id)
        )

    def stage_append(
        self, ident: str, spark: SparkSession, df: DataFrame, branch: str
    ) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).append(spark, df, stage_branch=branch),
        )

    def fast_forward(self, ident: str, branch: str) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).fast_forward(branch)
        )

    def cherrypick_snapshot(self, ident: str, snapshot_id: int) -> int:
        return self._commit_op(
            ident,
            lambda: self.writer(ident).cherrypick_snapshot(int(snapshot_id)),
        )

    def publish_changes(self, ident: str, wap_id) -> int:
        """``CALL publish_changes``: cherry-pick the staged wap.id
        snapshot onto main, committed through the service."""
        return self._commit_op(
            ident, lambda: self.writer(ident).publish_changes(str(wap_id))
        )

    def drop_ref(self, ident: str, name: str) -> None:
        self._commit_op(ident, lambda: self.writer(ident).drop_ref(name))

    def rewrite_manifests(self, ident: str) -> dict:
        return self._commit_op(
            ident, lambda: self.writer(ident).rewrite_manifests()
        )

    def rewrite_deletion_vectors(self, ident: str) -> dict:
        return self._commit_op(
            ident, lambda: self.writer(ident).rewrite_deletion_vectors()
        )

    def create_branch(self, ident: str, name: str, snapshot_id=None) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).create_branch(name, snapshot_id)
        )

    def create_tag(self, ident: str, name: str, snapshot_id=None) -> int:
        return self._commit_op(
            ident, lambda: self.writer(ident).create_tag(name, snapshot_id)
        )

    def transaction(self) -> "RestTransaction":
        """Atomic MULTI-TABLE transaction (REST spec
        ``POST /v1/transactions/commit``): stage any number of writer
        operations across tables, then commit them all-or-nothing in one
        service call — e.g. moving rows between tables, or an ingest
        that must land with its audit row.  Data files are written as
        operations run; METADATA stays staged until :meth:`commit`."""
        return RestTransaction(self)

    # -- Spark integration --------------------------------------------------

    def attach(self, spark: SparkSession, keys=None) -> None:
        from datafusion_iceberg_spark.iceberg.catalog import _rel_token

        wanted = self._relation_keys() if keys is None else list(keys)
        # tables first, then views (a view's SQL references the tables)
        wanted.sort(key=lambda k: self._known.get(k) == "view")
        if not hasattr(self, "_attached_tokens"):
            self._attached_tokens = {}
        for key in wanted:
            rel = self._resolve(key)
            ns, bare = key.rsplit(".", 1)
            rel.to_df(spark).createOrReplaceTempView(f"{ns}_{bare}")
            self._attached_tokens[key] = _rel_token(rel)

    # sql() comes from SqlSurface (3-part rewrite, time travel, $meta)


# ---------------------------------------------------------------------------
# Test double: an in-process REST catalog server over a warehouse directory
# ---------------------------------------------------------------------------


class LocalRestServer:
    """Serves the Iceberg REST catalog API for a local warehouse directory
    (``<warehouse>/<ns>/<table>/metadata/...``) — the stand-in for the
    reference test's ``localhost:8080`` REST catalog + S3 bucket
    (catalog.rs:73-96), hermetic for CI.  register/drop mutate an
    in-memory overlay so the double also exercises the write-back path."""

    def __init__(
        self,
        warehouse: str,
        credential: Optional[str] = None,
        page_size: Optional[int] = None,
    ):
        from datafusion_iceberg_spark.iceberg.catalog import Catalog

        self._warehouse = warehouse
        self._catalog = Catalog(warehouse)
        self._registered: dict[str, str] = {}  # ident -> metadata-location
        self._dropped: set[str] = set()
        self._extra_namespaces: set[str] = set()  # created empty via POST
        self._dropped_namespaces: set[str] = set()  # tombstones (files stay)
        self._extra_views: set[str] = set()  # created after the mirror walk
        # auth: when credential ("id:secret") is set, the tokens endpoint
        # exchanges it for a bearer token and every other endpoint
        # requires one (401 otherwise)
        self._credential = credential
        self._tokens: set[str] = set()
        self._page_size = page_size
        self._commit_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: Optional[dict] = None):
                payload = json.dumps(body or {}).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _authorized(self) -> bool:
                if outer._credential is None:
                    return True
                auth = self.headers.get("Authorization", "")
                return (
                    auth.startswith("Bearer ")
                    and auth[7:] in outer._tokens
                )

            def _page(self, items: list, key: str) -> dict:
                """Slice ``items`` by the request's pageToken (an opaque
                offset) and the server page size."""
                qs = urllib.parse.urlparse(self.path).query
                tok = urllib.parse.parse_qs(qs).get("pageToken", ["0"])[0]
                start = int(tok) if tok.isdigit() else 0
                size = outer._page_size
                if size is None:
                    return {key: items[start:]}
                out = {key: items[start : start + size]}
                if start + size < len(items):
                    out["next-page-token"] = str(start + size)
                return out

            def do_GET(self):
                if not self._authorized():
                    return self._send(401, {"error": "unauthorized"})
                parts = [
                    p
                    for p in urllib.parse.urlparse(self.path).path.split("/")
                    if p
                ][1:]  # drop v1
                if parts == ["namespaces"]:
                    return self._send(
                        200,
                        self._page(
                            [[ns] for ns in outer._namespaces()],
                            "namespaces",
                        ),
                    )
                if len(parts) == 2 and parts[0] == "namespaces":
                    ns = urllib.parse.unquote(parts[1])
                    if ns not in outer._namespaces():
                        return self._send(
                            404, {"error": f"no such namespace: {ns}"}
                        )
                    return self._send(
                        200,
                        {
                            "namespace": ns.split("."),
                            "properties": outer._catalog.namespace_properties(ns)
                            if os.path.isdir(os.path.join(outer._warehouse, ns))
                            else {},
                        },
                    )
                if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "tables":
                    ns = urllib.parse.unquote(parts[1])
                    return self._send(
                        200,
                        self._page(
                            [
                                {"namespace": [ns], "name": t[len(ns) + 1 :]}
                                for t in outer._tables(ns)
                            ],
                            "identifiers",
                        ),
                    )
                if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "tables":
                    ns = urllib.parse.unquote(parts[1])
                    res = outer._load(f"{ns}.{parts[3]}")
                    return self._send(200, res) if res else self._send(404)
                if len(parts) == 3 and parts[0] == "namespaces" and parts[2] == "views":
                    ns = urllib.parse.unquote(parts[1])
                    return self._send(
                        200,
                        self._page(
                            [
                                {"namespace": [ns], "name": t[len(ns) + 1 :]}
                                for t in outer._views(ns)
                            ],
                            "identifiers",
                        ),
                    )
                if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "views":
                    ns = urllib.parse.unquote(parts[1])
                    res = outer._load_view(f"{ns}.{parts[3]}")
                    return self._send(200, res) if res else self._send(404)
                return self._send(404)

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) or b"{}"
                parts = [
                    p
                    for p in urllib.parse.urlparse(self.path).path.split("/")
                    if p
                ][1:]
                if parts == ["oauth", "tokens"]:
                    return self._oauth(raw)
                if not self._authorized():
                    return self._send(401, {"error": "unauthorized"})
                body = json.loads(raw)
                if parts == ["transactions", "commit"]:
                    from datafusion_iceberg_spark.iceberg.rest_commit import (
                        RequirementFailed,
                    )

                    try:
                        res = outer._commit_txn(body)
                    except RequirementFailed as e:
                        return self._send(409, {"error": str(e)})
                    return self._send(200, res)
                if parts == ["namespaces"]:
                    ns = ".".join(body.get("namespace") or [])
                    if not ns:
                        return self._send(400, {"error": "empty namespace"})
                    if ns in outer._namespaces():
                        return self._send(
                            409, {"error": f"namespace exists: {ns}"}
                        )
                    outer._extra_namespaces.add(ns)
                    outer._dropped_namespaces.discard(ns)
                    return self._send(200, {"namespace": body["namespace"]})
                if (
                    len(parts) == 3
                    and parts[0] == "namespaces"
                    and parts[2] == "register"
                ):
                    ns = urllib.parse.unquote(parts[1])
                    ident = f"{ns}.{body['name']}"
                    loc = body["metadata-location"]
                    outer._registered[ident] = loc
                    outer._dropped.discard(ident)
                    return self._send(200, outer._load(ident))
                if (
                    len(parts) == 3
                    and parts[0] == "namespaces"
                    and parts[2] == "properties"
                ):  # UpdateNamespacePropertiesRequest
                    ns = urllib.parse.unquote(parts[1])
                    if ns not in outer._namespaces():
                        return self._send(
                            404, {"error": f"no such namespace: {ns}"}
                        )
                    os.makedirs(
                        os.path.join(outer._warehouse, ns), exist_ok=True
                    )
                    res = outer._catalog.update_namespace_properties(
                        ns,
                        body.get("updates") or {},
                        body.get("removals") or [],
                    )
                    return self._send(200, res)
                if (
                    len(parts) == 3
                    and parts[0] == "namespaces"
                    and parts[2] == "views"
                ):  # CreateViewRequest
                    ns = urllib.parse.unquote(parts[1])
                    try:
                        res = outer._create_view(ns, body)
                    except FileExistsError as e:
                        return self._send(409, {"error": str(e)})
                    return self._send(200, res)
                if (
                    len(parts) == 3
                    and parts[0] == "namespaces"
                    and parts[2] == "tables"
                ):  # CreateTableRequest
                    ns = urllib.parse.unquote(parts[1])
                    try:
                        res = outer._create(ns, body)
                    except FileExistsError as e:
                        return self._send(409, {"error": str(e)})
                    return self._send(200, res)
                if (
                    len(parts) == 4
                    and parts[0] == "namespaces"
                    and parts[2] == "views"
                ):  # CommitViewRequest (add-view-version + set-current)
                    ns = urllib.parse.unquote(parts[1])
                    ident = f"{ns}.{parts[3]}"
                    if outer._load_view(ident) is None:
                        return self._send(
                            404, {"error": f"no such view: {ident}"}
                        )
                    from datafusion_iceberg_spark.iceberg.view import (
                        IcebergView,
                    )

                    root = os.path.join(outer._warehouse, ns, parts[3])
                    view = IcebergView.load(root)
                    adds = [
                        u
                        for u in body.get("updates", [])
                        if u.get("action") == "add-view-version"
                    ]
                    if not adds:
                        return self._send(
                            400, {"error": "no add-view-version update"}
                        )
                    rep = next(
                        r
                        for r in adds[-1]["view-version"]["representations"]
                        if r.get("type") == "sql"
                    )
                    view.replace(rep["sql"], rep.get("dialect", "spark"))
                    return self._send(
                        200,
                        {"metadata-location": view.root, "metadata": view.raw},
                    )
                if (
                    len(parts) == 4
                    and parts[0] == "namespaces"
                    and parts[2] == "tables"
                ):  # CommitTableRequest
                    from datafusion_iceberg_spark.iceberg.rest_commit import (
                        RequirementFailed,
                    )

                    ns = urllib.parse.unquote(parts[1])
                    try:
                        res = outer._commit(f"{ns}.{parts[3]}", body)
                    except RequirementFailed as e:
                        return self._send(409, {"error": str(e)})
                    return self._send(200, res)
                return self._send(404)

            def _oauth(self, raw: bytes):
                form = urllib.parse.parse_qs(raw.decode())
                cid = form.get("client_id", [""])[0]
                secret = form.get("client_secret", [""])[0]
                if outer._credential is None or f"{cid}:{secret}" != outer._credential:
                    return self._send(401, {"error": "invalid credential"})
                import uuid as uuidlib

                tok = uuidlib.uuid4().hex
                outer._tokens.add(tok)
                return self._send(
                    200, {"access_token": tok, "token_type": "bearer"}
                )

            def do_DELETE(self):
                if not self._authorized():
                    return self._send(401, {"error": "unauthorized"})
                parts = [
                    p
                    for p in urllib.parse.urlparse(self.path).path.split("/")
                    if p
                ][1:]
                if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "tables":
                    ns = urllib.parse.unquote(parts[1])
                    outer._dropped.add(f"{ns}.{parts[3]}")
                    return self._send(204)
                if len(parts) == 4 and parts[0] == "namespaces" and parts[2] == "views":
                    ns = urllib.parse.unquote(parts[1])
                    ident = f"{ns}.{parts[3]}"
                    if outer._load_view(ident) is None:
                        return self._send(404, {"error": f"no such view: {ident}"})
                    outer._dropped.add(ident)
                    return self._send(204)
                if len(parts) == 2 and parts[0] == "namespaces":
                    ns = urllib.parse.unquote(parts[1])
                    if ns not in outer._namespaces():
                        return self._send(
                            404, {"error": f"no such namespace: {ns}"}
                        )
                    if outer._tables(ns):
                        return self._send(
                            409, {"error": f"namespace not empty: {ns}"}
                        )
                    outer._extra_namespaces.discard(ns)
                    # tombstone, not rmtree: drop_table is soft on this
                    # double (files stay for audit), so the dir may
                    # legitimately still hold dropped tables' data
                    outer._dropped_namespaces.add(ns)
                    return self._send(204)
                return self._send(404)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    # -- warehouse + overlay view ------------------------------------------

    def _namespaces(self) -> list[str]:
        ns = set(self._catalog.namespaces())
        ns |= {k.rsplit(".", 1)[0] for k in self._registered}
        ns |= self._extra_namespaces
        return sorted(ns - self._dropped_namespaces)

    def _tables(self, ns: str) -> list[str]:
        names = {
            k
            for k in self._catalog.table_names(ns)
            if isinstance(self._catalog.load(k), IcebergTable)
        }
        names |= {k for k in self._registered if k.startswith(ns + ".")}
        return sorted(names - self._dropped)

    def _load(self, ident: str) -> Optional[dict]:
        if ident in self._dropped:
            return None
        from datafusion_iceberg_spark.iceberg.io import get_io
        from datafusion_iceberg_spark.iceberg.metadata import (
            load_table_metadata,
        )

        if ident in self._registered:
            loc = self._registered[ident]
            if loc.endswith(".json"):  # spec shape: the metadata file
                raw = json.loads(get_io(loc).read_bytes(loc).decode("utf-8"))
            else:  # convenience: a table root directory
                raw = load_table_metadata(loc).raw
            return {"metadata-location": loc, "metadata": raw}
        if not self._catalog.table_exists(ident):
            return None
        rel = self._catalog.load(ident)
        if not isinstance(rel, IcebergTable):
            return None
        meta = load_table_metadata(rel.metadata.root)
        return {"metadata-location": meta.root, "metadata": meta.raw}

    def _views(self, ns: str) -> list[str]:
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        names = {
            k
            for k in self._catalog.table_names(ns)
            if isinstance(self._catalog.load(k), IcebergView)
        }
        names |= {k for k in self._extra_views if k.startswith(ns + ".")}
        return sorted(names - self._dropped)

    def _load_view(self, ident: str) -> Optional[dict]:
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        if ident in self._dropped:
            return None
        # disk first: the catalog mirror caches the view metadata as of
        # server start, so a replaced view would otherwise serve its
        # stale version; the metadata files on disk are the truth
        ns, name = ident.rsplit(".", 1)
        root = os.path.join(self._warehouse, ns, name)
        if IcebergView.is_view(root):
            view = IcebergView.load(root)
            return {"metadata-location": view.root, "metadata": view.raw}
        if not self._catalog.table_exists(ident):
            return None
        rel = self._catalog.load(ident)
        if not isinstance(rel, IcebergView):
            return None
        return {"metadata-location": rel.root, "metadata": rel.raw}

    def _create_view(self, ns: str, body: dict) -> dict:
        from datafusion_iceberg_spark.iceberg.view import IcebergView

        name = body["name"]
        ident = f"{ns}.{name}"
        if self._load_view(ident) is not None or self._load(ident) is not None:
            raise FileExistsError(f"relation already exists: {ident}")
        reps = (body.get("view-version") or {}).get("representations") or []
        sql_rep = next((r for r in reps if r.get("type") == "sql"), None)
        if sql_rep is None:
            raise FileExistsError("CreateViewRequest needs a sql representation")
        root = os.path.join(self._warehouse, ns, name)
        os.makedirs(os.path.join(self._warehouse, ns), exist_ok=True)
        view = IcebergView.create(
            root, sql_rep["sql"], dialect=sql_rep.get("dialect", "spark")
        )
        self._dropped.discard(ident)
        self._extra_views.add(ident)
        return {"metadata-location": view.root, "metadata": view.raw}

    # -- service-owned metadata writes --------------------------------------

    @staticmethod
    def _max_field_id(t) -> int:
        """Max field id anywhere in an Iceberg JSON type (nested
        element/key/value/subfield ids included)."""
        if isinstance(t, dict):
            ids = [0]
            for k in ("id", "element-id", "key-id", "value-id"):
                if k in t:
                    ids.append(int(t[k]))
            for k in ("fields",):
                for f in t.get(k, []) or []:
                    ids.append(LocalRestServer._max_field_id(f))
            for k in ("element", "key", "value", "type"):
                v = t.get(k)
                if isinstance(v, dict):
                    ids.append(LocalRestServer._max_field_id(v))
            return max(ids)
        return 0

    def _table_root(self, ident: str, meta: Optional[dict] = None) -> str:
        if meta and meta.get("location"):
            return meta["location"]
        ns, name = ident.rsplit(".", 1)
        return os.path.join(self._warehouse, ns, name)

    def _write_version(self, root: str, meta: dict) -> str:
        """Exclusively create the next ``v{N}.metadata.json`` under the
        table root — the service-side equivalent of the local writer's
        link-exclusive commit; a server-internal race surfaces as
        RequirementFailed → 409."""
        from datafusion_iceberg_spark.iceberg.rest_commit import (
            RequirementFailed,
        )

        meta_dir = os.path.join(root, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        versions = [
            int(os.path.basename(p).split(".")[0][1:])
            for p in glob.glob(os.path.join(meta_dir, "v*.metadata.json"))
        ]
        v = max(versions, default=-1) + 1
        tmp = os.path.join(meta_dir, f".v{v}.metadata.json.{os.getpid()}.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh, indent=1)
        target = os.path.join(meta_dir, f"v{v}.metadata.json")
        try:
            os.link(tmp, target)
        except FileExistsError:
            os.remove(tmp)
            raise RequirementFailed(
                f"version v{v} committed concurrently"
            ) from None
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        hint_tmp = os.path.join(meta_dir, f".version-hint.{os.getpid()}.tmp")
        with open(hint_tmp, "w") as fh:
            fh.write(str(v))
        os.rename(hint_tmp, os.path.join(meta_dir, "version-hint.text"))
        return target

    def _create(self, ns: str, body: dict) -> dict:
        """CreateTableRequest → v0 metadata written by the SERVICE (same
        shape as the local writer's create, writer.py:786-825)."""
        import time
        import uuid as uuidlib

        name = body["name"]
        ident = f"{ns}.{name}"
        if self._load(ident) is not None:
            raise FileExistsError(f"table already exists: {ident}")
        schema = dict(body["schema"])
        schema.setdefault("schema-id", 0)
        spec = body.get("partition-spec") or {"spec-id": 0, "fields": []}
        order = body.get("write-order") or {"order-id": 0, "fields": []}
        props = body.get("properties") or {}
        root = body.get("location") or self._table_root(ident)
        last_col = self._max_field_id(schema)
        meta = {
            "format-version": 2,
            "last-sequence-number": 0,
            "table-uuid": str(uuidlib.uuid4()),
            "location": root,
            "last-updated-ms": int(time.time() * 1000),
            "last-column-id": last_col,
            "schema": schema,
            "current-schema-id": schema["schema-id"],
            "schemas": [schema],
            "partition-spec": spec["fields"],
            "default-spec-id": spec.get("spec-id", 0),
            "partition-specs": [spec],
            "last-partition-id": max(
                [999] + [int(f["field-id"]) for f in spec["fields"]]
            ),
            "default-sort-order-id": order.get("order-id", 0),
            "sort-orders": [order],
            "properties": props,
            "current-snapshot-id": -1,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        loc = self._write_version(root, meta)
        self._registered[ident] = root  # overlay: visible to _load
        self._dropped.discard(ident)
        return {"metadata-location": loc, "metadata": meta}

    def _commit(self, ident: str, body: dict) -> dict:
        """CommitTableRequest: requirements checked against CURRENT
        service-side metadata, updates folded in, new version written —
        all under one lock (a real service serializes per table)."""
        import time

        from datafusion_iceberg_spark.iceberg.rest_commit import (
            RequirementFailed,
            apply_updates,
            check_requirements,
        )

        with self._commit_lock:
            res = self._load(ident)
            base = res["metadata"] if res else None
            check_requirements(base, body.get("requirements", []))
            if base is None:
                raise RequirementFailed(f"no such table: {ident}")
            now = int(time.time() * 1000)
            new = apply_updates(base, body.get("updates", []), ts_ms=now)
            new["metadata-log"] = list(base.get("metadata-log", [])) + [
                {
                    "timestamp-ms": now,
                    "metadata-file": res.get("metadata-location", ""),
                }
            ]
            root = self._table_root(ident, base)
            loc = self._write_version(root, new)
            if ident in self._registered and self._registered[
                ident
            ].endswith(".json"):
                # a version-pinned registration advances to the commit
                self._registered[ident] = loc
            return {"metadata-location": loc, "metadata": new}

    def _commit_txn(self, body: dict) -> dict:
        """CommitTransactionRequest: validate EVERY table's requirements
        and fold EVERY table's updates before publishing the first
        version — a requirement failure anywhere publishes nothing."""
        import time

        from datafusion_iceberg_spark.iceberg.rest_commit import (
            RequirementFailed,
            apply_updates,
            check_requirements,
        )

        with self._commit_lock:
            now = int(time.time() * 1000)
            staged = []
            for ch in body.get("table-changes", []):
                ident = ".".join(
                    ch["identifier"]["namespace"]
                    + [ch["identifier"]["name"]]
                )
                res = self._load(ident)
                base = res["metadata"] if res else None
                check_requirements(base, ch.get("requirements", []))
                if base is None:
                    raise RequirementFailed(f"no such table: {ident}")
                new = apply_updates(base, ch.get("updates", []), ts_ms=now)
                new["metadata-log"] = list(
                    base.get("metadata-log", [])
                ) + [
                    {
                        "timestamp-ms": now,
                        "metadata-file": res.get("metadata-location", ""),
                    }
                ]
                staged.append((ident, base, new))
            for ident, base, new in staged:  # all validated — publish
                root = self._table_root(ident, base)
                loc = self._write_version(root, new)
                if ident in self._registered and self._registered[
                    ident
                ].endswith(".json"):
                    self._registered[ident] = loc
        return {}

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> str:
        self._thread.start()
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> str:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
