"""Iceberg REST catalog *commit protocol*: typed table updates +
requirements (the ``CommitTableRequest`` body of ``POST
/v1/{prefix}/namespaces/{ns}/tables/{table}``).

The reference's REST crate is read-mostly — it registers and drops
tables but never commits table UPDATES through the service
(catalog_rest/src/catalog.rs:98-135 only implements
create/register/drop; SURVEY.md §2A row A16).  Real REST catalogs
(Polaris, Gravitino, Tabular, Glue REST) require every metadata change
to go through the commit endpoint so the SERVICE owns the metadata
pointer: the client never writes ``vN.metadata.json`` itself.  This
module implements both halves of that contract:

- :func:`metadata_updates` (client side): diff the metadata dict a
  writer produced against the base it read, into the spec's typed
  update list (``add-snapshot``, ``set-snapshot-ref``, ``add-schema``,
  ``set-properties``, ...) plus the optimistic-concurrency
  requirements (``assert-table-uuid``, ``assert-ref-snapshot-id``, ...).
  The differ SELF-CHECKS: it re-applies its own updates to the base and
  refuses to return a lossy translation, so an unsupported metadata
  mutation fails loudly at commit time instead of silently dropping
  state on the server.
- :func:`check_requirements` + :func:`apply_updates` (server side):
  validate requirements against current metadata (409 → CommitConflict
  upstream) and fold updates into a new metadata dict, recomputing the
  derived fields (``last-sequence-number``, ``last-partition-id``, the
  v1 ``schema``/``partition-spec`` mirrors, ``snapshot-log``).

Two documented deviations from the published REST spec, both because
this build's writer assigns what a real service would assign:

- ``set-next-row-id``: Iceberg v3 row lineage lets the *service* assign
  ``first-row-id`` ranges; our writer assigns them client-side
  (writer.py::_assign_first_row_ids), so the advanced counter rides an
  explicit update.  A real service would reject it and re-assign.
- ``set-snapshot-log``: the service normally derives the snapshot log
  (one entry per ``set-snapshot-ref`` on main).  Multi-commit branch
  publishing (writer.py::fast_forward) appends the WHOLE published
  chain to the log in one commit, which no derived rule reproduces —
  the differ emits the log verbatim only when derivation diverges.
"""

from __future__ import annotations

import copy
from typing import Any, Optional


class RequirementFailed(Exception):
    """A commit requirement did not hold against current metadata —
    maps to HTTP 409 on the service side and CommitConflict client-side."""


# ---------------------------------------------------------------------------
# canonical form (shared by the differ's self-check and tests)
# ---------------------------------------------------------------------------

_VOLATILE = ("last-updated-ms", "metadata-log")


def canonical(meta: dict) -> dict:
    """Metadata modulo service-owned / clock-dependent fields:

    - ``last-updated-ms`` and ``metadata-log`` are stamped by whoever
      writes the file (the service, in REST mode);
    - ``snapshot-log`` compares by snapshot-id sequence (entry
      timestamps come from the committer's clock);
    - an explicit ``refs.main`` that exactly mirrors
      ``current-snapshot-id`` is implicit per spec and dropped.
    """
    m = copy.deepcopy(meta)
    for k in _VOLATILE:
        m.pop(k, None)
    # id-keyed collections compare as sets: expire_snapshots reorders the
    # survivor list (pinned refs move ahead of the keep_last tail) and
    # the applier preserves base order instead — both are the same table
    m["snapshots"] = sorted(
        m.get("snapshots", []), key=lambda s: s["snapshot-id"]
    )
    m["partition-statistics"] = sorted(
        m.get("partition-statistics", []),
        key=lambda e: e.get("snapshot-id", 0),
    )
    m["statistics"] = sorted(
        m.get("statistics", []), key=lambda e: e.get("snapshot-id", 0)
    )
    m["snapshot-log"] = [e["snapshot-id"] for e in meta.get("snapshot-log", [])]
    refs = dict(m.get("refs") or {})
    main = refs.get("main")
    if main is not None and main == {
        "snapshot-id": m.get("current-snapshot-id"),
        "type": "branch",
    }:
        refs.pop("main")
    if refs:
        m["refs"] = refs
    else:
        m.pop("refs", None)
    # absent list-valued optionals == empty
    for k in ("snapshots", "snapshot-log", "partition-statistics", "statistics"):
        if not m.get(k):
            m.pop(k, None)
    if m.get("current-snapshot-id", -1) in (None, -1):
        m.pop("current-snapshot-id", None)
    return m


# ---------------------------------------------------------------------------
# client side: diff base → new into (requirements, updates)
# ---------------------------------------------------------------------------


def _by_id(items: list, key: str) -> dict:
    return {it.get(key, 0): it for it in (items or [])}


def metadata_updates(base: dict, new: dict) -> tuple[list, list]:
    """Diff two metadata dicts into ``(requirements, updates)`` for a
    CommitTableRequest.  Raises ``ValueError`` if the delta cannot be
    expressed (the self-check below guarantees no silent loss)."""
    if new.get("table-uuid") != base.get("table-uuid"):
        raise ValueError("table-uuid is immutable; cannot diff across tables")
    reqs: list[dict] = [
        {"type": "assert-table-uuid", "uuid": base["table-uuid"]}
    ]
    ups: list[dict] = []

    if int(new.get("format-version", 2)) > int(base.get("format-version", 2)):
        ups.append(
            {
                "action": "upgrade-format-version",
                "format-version": int(new["format-version"]),
            }
        )
    if new.get("location") != base.get("location"):
        ups.append({"action": "set-location", "location": new["location"]})

    # schemas (append-only by schema-id; current pointer separately)
    bs, ns = _by_id(base.get("schemas"), "schema-id"), _by_id(
        new.get("schemas"), "schema-id"
    )
    added_schemas = [ns[i] for i in sorted(set(ns) - set(bs))]
    for s in added_schemas:
        ups.append(
            {
                "action": "add-schema",
                "schema": s,
                "last-column-id": int(new.get("last-column-id", 0)),
            }
        )
    if new.get("current-schema-id", 0) != base.get("current-schema-id", 0):
        ups.append(
            {
                "action": "set-current-schema",
                "schema-id": int(new["current-schema-id"]),
            }
        )
    if added_schemas or new.get("current-schema-id", 0) != base.get(
        "current-schema-id", 0
    ):
        reqs.append(
            {
                "type": "assert-current-schema-id",
                "current-schema-id": int(base.get("current-schema-id", 0)),
            }
        )
        reqs.append(
            {
                "type": "assert-last-assigned-field-id",
                "last-assigned-field-id": int(base.get("last-column-id", 0)),
            }
        )

    # partition specs
    bp, np_ = _by_id(base.get("partition-specs"), "spec-id"), _by_id(
        new.get("partition-specs"), "spec-id"
    )
    added_specs = [np_[i] for i in sorted(set(np_) - set(bp))]
    for s in added_specs:
        ups.append({"action": "add-spec", "spec": s})
    if new.get("default-spec-id", 0) != base.get("default-spec-id", 0):
        ups.append(
            {
                "action": "set-default-spec",
                "spec-id": int(new["default-spec-id"]),
            }
        )
    if added_specs:
        reqs.append(
            {
                "type": "assert-last-assigned-partition-id",
                "last-assigned-partition-id": int(
                    base.get("last-partition-id", 999)
                ),
            }
        )
    if added_specs or new.get("default-spec-id", 0) != base.get(
        "default-spec-id", 0
    ):
        reqs.append(
            {
                "type": "assert-default-spec-id",
                "default-spec-id": int(base.get("default-spec-id", 0)),
            }
        )

    # sort orders
    bo, no = _by_id(base.get("sort-orders"), "order-id"), _by_id(
        new.get("sort-orders"), "order-id"
    )
    for i in sorted(set(no) - set(bo)):
        ups.append({"action": "add-sort-order", "sort-order": no[i]})
    if new.get("default-sort-order-id", 0) != base.get(
        "default-sort-order-id", 0
    ):
        ups.append(
            {
                "action": "set-default-sort-order",
                "sort-order-id": int(new["default-sort-order-id"]),
            }
        )

    # snapshots (added in sequence order; removals batched)
    bsn, nsn = _by_id(base.get("snapshots"), "snapshot-id"), _by_id(
        new.get("snapshots"), "snapshot-id"
    )
    added_snaps = [
        nsn[i]
        for i in sorted(
            set(nsn) - set(bsn),
            key=lambda i: (nsn[i].get("sequence-number", 0), i),
        )
    ]
    removed_snaps = sorted(set(bsn) - set(nsn))
    for s in added_snaps:
        ups.append({"action": "add-snapshot", "snapshot": s})
    if removed_snaps:
        ups.append(
            {"action": "remove-snapshots", "snapshot-ids": removed_snaps}
        )

    # refs: current-snapshot-id IS the implicit main ref
    base_cur = base.get("current-snapshot-id", -1)
    new_cur = new.get("current-snapshot-id", -1)
    snapshot_state_touched = bool(added_snaps or removed_snaps)
    if new_cur != base_cur and new_cur not in (None, -1):
        ups.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": "main",
                "snapshot-id": int(new_cur),
                "type": "branch",
            }
        )
        snapshot_state_touched = True
    bref = {
        k: v for k, v in (base.get("refs") or {}).items() if k != "main"
    }
    nref = {k: v for k, v in (new.get("refs") or {}).items() if k != "main"}
    for name in sorted(set(bref) - set(nref)):
        ups.append({"action": "remove-snapshot-ref", "ref-name": name})
        snapshot_state_touched = True
    for name in sorted(nref):
        if nref[name] != bref.get(name):
            ups.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": name,
                    **nref[name],
                }
            )
            snapshot_state_touched = True
    if snapshot_state_touched:
        req: dict[str, Any] = {
            "type": "assert-ref-snapshot-id",
            "ref": "main",
        }
        if base_cur not in (None, -1):
            req["snapshot-id"] = int(base_cur)
        reqs.append(req)

    # properties
    bpr, npr = base.get("properties") or {}, new.get("properties") or {}
    sets = {k: v for k, v in npr.items() if bpr.get(k) != v}
    dels = sorted(k for k in bpr if k not in npr)
    if sets:
        ups.append({"action": "set-properties", "updates": sets})
    if dels:
        ups.append({"action": "remove-properties", "removals": dels})

    # partition statistics (keyed by snapshot-id)
    bps = _by_id(base.get("partition-statistics"), "snapshot-id")
    nps = _by_id(new.get("partition-statistics"), "snapshot-id")
    for sid in sorted(set(nps)):
        if nps[sid] != bps.get(sid):
            ups.append(
                {
                    "action": "set-partition-statistics",
                    "partition-statistics": nps[sid],
                }
            )
    for sid in sorted(set(bps) - set(nps)):
        ups.append(
            {"action": "remove-partition-statistics", "snapshot-id": sid}
        )

    # table statistics files (ndv sketches; keyed by snapshot-id)
    bts = _by_id(base.get("statistics"), "snapshot-id")
    nts = _by_id(new.get("statistics"), "snapshot-id")
    for sid in sorted(set(nts)):
        if nts[sid] != bts.get(sid):
            ups.append({"action": "set-statistics", "statistics": nts[sid]})
    for sid in sorted(set(bts) - set(nts)):
        ups.append({"action": "remove-statistics", "snapshot-id": sid})

    # v3 row lineage: client-assigned counter (documented deviation)
    if new.get("next-row-id") != base.get("next-row-id") and new.get(
        "next-row-id"
    ) is not None:
        ups.append(
            {
                "action": "set-next-row-id",
                "next-row-id": int(new["next-row-id"]),
            }
        )

    # snapshot-log: emit verbatim only when the derived rule (append one
    # entry per main move, drop removed ids) does not reproduce it
    derived = _derive_snapshot_log(base, removed_snaps, base_cur, new_cur)
    if [e["snapshot-id"] for e in new.get("snapshot-log", [])] != derived:
        ups.append(
            {
                "action": "set-snapshot-log",
                "snapshot-log": new.get("snapshot-log", []),
            }
        )

    # -- self-check: no silent metadata loss --------------------------------
    applied = apply_updates(
        base, ups, ts_ms=new.get("last-updated-ms", 0)
    )
    ca, cn = canonical(applied), canonical(new)
    if ca != cn:
        bad = sorted(
            k
            for k in set(ca) | set(cn)
            if ca.get(k) != cn.get(k)
        )
        raise ValueError(
            "metadata mutation not expressible as REST updates; "
            f"diverging keys after re-apply: {bad}"
        )
    return reqs, ups


def _derive_snapshot_log(
    base: dict, removed: list, base_cur, new_cur
) -> list:
    ids = [
        e["snapshot-id"]
        for e in base.get("snapshot-log", [])
        if e["snapshot-id"] not in set(removed)
    ]
    if new_cur != base_cur and new_cur not in (None, -1):
        ids.append(new_cur)
    return ids


# ---------------------------------------------------------------------------
# server side
# ---------------------------------------------------------------------------


def check_requirements(meta: Optional[dict], requirements: list) -> None:
    """Validate a CommitTableRequest's requirements against current
    metadata (``None`` = table does not exist).  Raises
    :class:`RequirementFailed` (→ HTTP 409)."""
    for r in requirements:
        t = r.get("type")
        if t == "assert-create":
            if meta is not None:
                raise RequirementFailed("table already exists")
            continue
        if meta is None:
            raise RequirementFailed("table does not exist")
        if t == "assert-table-uuid":
            if meta.get("table-uuid") != r.get("uuid"):
                raise RequirementFailed("table-uuid changed")
        elif t == "assert-ref-snapshot-id":
            name = r.get("ref", "main")
            if name == "main":
                cur = meta.get("current-snapshot-id", -1)
                cur = None if cur in (None, -1) else int(cur)
            else:
                ref = (meta.get("refs") or {}).get(name)
                cur = None if ref is None else int(ref["snapshot-id"])
            want = r.get("snapshot-id")
            if cur != (None if want is None else int(want)):
                raise RequirementFailed(
                    f"ref {name!r} is at {cur}, expected {want}"
                )
        elif t == "assert-current-schema-id":
            if int(meta.get("current-schema-id", 0)) != int(
                r["current-schema-id"]
            ):
                raise RequirementFailed("current schema moved")
        elif t == "assert-last-assigned-field-id":
            if int(meta.get("last-column-id", 0)) != int(
                r["last-assigned-field-id"]
            ):
                raise RequirementFailed("last column id moved")
        elif t == "assert-default-spec-id":
            if int(meta.get("default-spec-id", 0)) != int(
                r["default-spec-id"]
            ):
                raise RequirementFailed("default spec moved")
        elif t == "assert-last-assigned-partition-id":
            if int(meta.get("last-partition-id", 999)) != int(
                r["last-assigned-partition-id"]
            ):
                raise RequirementFailed("last partition id moved")
        else:
            raise RequirementFailed(f"unknown requirement type: {t!r}")


def apply_updates(base: dict, updates: list, ts_ms: int) -> dict:
    """Fold a typed update list into ``base``, recomputing the derived
    fields a metadata builder owns.  Pure — returns a new dict."""
    m = copy.deepcopy(base)
    log_overridden = False
    for u in updates:
        a = u.get("action")
        if a == "upgrade-format-version":
            if int(u["format-version"]) < int(m.get("format-version", 2)):
                raise RequirementFailed("format-version cannot downgrade")
            m["format-version"] = int(u["format-version"])
        elif a == "set-location":
            m["location"] = u["location"]
        elif a == "add-schema":
            m["schemas"] = list(m.get("schemas", [])) + [u["schema"]]
            m["last-column-id"] = max(
                int(m.get("last-column-id", 0)),
                int(u.get("last-column-id", 0)),
            )
        elif a == "set-current-schema":
            sid = int(u["schema-id"])
            if sid == -1:  # spec: -1 = last added schema
                sid = m["schemas"][-1].get("schema-id", 0)
            if not any(
                s.get("schema-id", 0) == sid for s in m.get("schemas", [])
            ):
                raise RequirementFailed(f"no schema with id {sid}")
            m["current-schema-id"] = sid
        elif a == "add-spec":
            m["partition-specs"] = list(m.get("partition-specs", [])) + [
                u["spec"]
            ]
        elif a == "set-default-spec":
            sid = int(u["spec-id"])
            if sid == -1:
                sid = m["partition-specs"][-1].get("spec-id", 0)
            m["default-spec-id"] = sid
        elif a == "add-sort-order":
            m["sort-orders"] = list(m.get("sort-orders", [])) + [
                u["sort-order"]
            ]
        elif a == "set-default-sort-order":
            oid = int(u["sort-order-id"])
            if oid == -1:
                oid = m["sort-orders"][-1].get("order-id", 0)
            m["default-sort-order-id"] = oid
        elif a == "add-snapshot":
            snap = u["snapshot"]
            if any(
                s["snapshot-id"] == snap["snapshot-id"]
                for s in m.get("snapshots", [])
            ):
                raise RequirementFailed(
                    f"snapshot {snap['snapshot-id']} already exists"
                )
            m["snapshots"] = list(m.get("snapshots", [])) + [snap]
        elif a == "remove-snapshots":
            gone = set(u["snapshot-ids"])
            m["snapshots"] = [
                s
                for s in m.get("snapshots", [])
                if s["snapshot-id"] not in gone
            ]
            m["snapshot-log"] = [
                e
                for e in m.get("snapshot-log", [])
                if e["snapshot-id"] not in gone
            ]
        elif a == "set-snapshot-ref":
            sid = int(u["snapshot-id"])
            if not any(
                s["snapshot-id"] == sid for s in m.get("snapshots", [])
            ):
                raise RequirementFailed(f"no snapshot with id {sid}")
            if u["ref-name"] == "main":
                if m.get("current-snapshot-id") != sid:
                    m["current-snapshot-id"] = sid
                    if not log_overridden:
                        m["snapshot-log"] = list(
                            m.get("snapshot-log", [])
                        ) + [{"timestamp-ms": ts_ms, "snapshot-id": sid}]
            else:
                ref = {
                    k: v
                    for k, v in u.items()
                    if k not in ("action", "ref-name")
                }
                m.setdefault("refs", {})[u["ref-name"]] = ref
        elif a == "remove-snapshot-ref":
            (m.get("refs") or {}).pop(u["ref-name"], None)
        elif a == "set-properties":
            m["properties"] = {
                **(m.get("properties") or {}),
                **u["updates"],
            }
        elif a == "remove-properties":
            props = dict(m.get("properties") or {})
            for k in u["removals"]:
                props.pop(k, None)
            m["properties"] = props
        elif a == "set-partition-statistics":
            entry = u["partition-statistics"]
            rest = [
                e
                for e in m.get("partition-statistics", [])
                if e.get("snapshot-id") != entry.get("snapshot-id")
            ]
            m["partition-statistics"] = rest + [entry]
        elif a == "remove-partition-statistics":
            m["partition-statistics"] = [
                e
                for e in m.get("partition-statistics", [])
                if e.get("snapshot-id") != u["snapshot-id"]
            ]
        elif a == "set-statistics":
            entry = u["statistics"]
            m["statistics"] = [
                e
                for e in m.get("statistics", [])
                if e.get("snapshot-id") != entry.get("snapshot-id")
            ] + [entry]
        elif a == "remove-statistics":
            m["statistics"] = [
                e
                for e in m.get("statistics", [])
                if e.get("snapshot-id") != u["snapshot-id"]
            ]
        elif a == "set-next-row-id":
            m["next-row-id"] = max(
                int(m.get("next-row-id", 0)), int(u["next-row-id"])
            )
        elif a == "set-snapshot-log":
            m["snapshot-log"] = list(u["snapshot-log"])
            log_overridden = True
        elif a == "assign-uuid":
            m["table-uuid"] = u["uuid"]
        else:
            raise RequirementFailed(f"unknown update action: {a!r}")
    # derived fields a metadata builder owns
    cur_sid = m.get("current-schema-id", 0)
    cur_schema = next(
        (
            s
            for s in m.get("schemas", [])
            if s.get("schema-id", 0) == cur_sid
        ),
        None,
    )
    if cur_schema is not None:
        m["schema"] = cur_schema
    def_spec = next(
        (
            s
            for s in m.get("partition-specs", [])
            if s.get("spec-id", 0) == m.get("default-spec-id", 0)
        ),
        None,
    )
    if def_spec is not None:
        m["partition-spec"] = def_spec["fields"]
        m["last-partition-id"] = max(
            [int(m.get("last-partition-id", 999))]
            + [
                int(f["field-id"])
                for sp in m.get("partition-specs", [])
                for f in sp.get("fields", [])
            ]
        )
    m["last-sequence-number"] = max(
        [int(base.get("last-sequence-number", 0))]
        + [
            int(s.get("sequence-number", 0))
            for s in m.get("snapshots", [])
        ]
    )
    m["last-updated-ms"] = ts_ms
    return m
