"""Iceberg views: stored SQL + declared schema, expanded at query time
(SURVEY.md §2A A11; reference: view branch of scan,
datafusion_iceberg/src/table.rs:102-112, creation at table.rs:392-403).

The reference re-parses the stored SQL against the current session at
every scan; ``View.to_df`` does exactly that with ``spark.sql`` —
Catalyst then optimizes outer query + view body as one tree, the same
inlining ``ViewTable`` performs.
"""

from __future__ import annotations

import json
import os
import time
import uuid as uuidlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class IcebergView:
    """View metadata (Iceberg view-spec shaped, format-version 1)."""

    def __init__(self, raw: dict, root: str):
        self.raw = raw
        self.root = root

    # -- creation -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        root: str,
        sql: str,
        schema_json: Optional[dict] = None,
        dialect: str = "spark",
    ) -> "IcebergView":
        """Persist view metadata (analogue of ViewBuilder::
        new_filesystem_view().commit(), table.rs:392-403)."""
        os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
        now = int(time.time() * 1000)
        raw = {
            "view-uuid": str(uuidlib.uuid4()),
            "format-version": 1,
            "location": root,
            "current-version-id": 1,
            "versions": [
                {
                    "version-id": 1,
                    "timestamp-ms": now,
                    "schema-id": 0,
                    "summary": {"operation": "create"},
                    "representations": [
                        {"type": "sql", "sql": sql, "dialect": dialect}
                    ],
                    "default-namespace": [],
                }
            ],
            "version-log": [{"timestamp-ms": now, "version-id": 1}],
            "schemas": [schema_json] if schema_json else [],
            "properties": {},
        }
        view = cls(raw, root)
        view._commit(1)
        return view

    def replace(self, sql: str, dialect: str = "spark") -> None:
        """New view version with updated SQL (versioned like snapshots)."""
        now = int(time.time() * 1000)
        vid = self.raw["current-version-id"] + 1
        self.raw["versions"].append(
            {
                "version-id": vid,
                "timestamp-ms": now,
                "schema-id": 0,
                "summary": {"operation": "replace"},
                "representations": [{"type": "sql", "sql": sql, "dialect": dialect}],
                "default-namespace": [],
            }
        )
        self.raw["current-version-id"] = vid
        self.raw["version-log"].append({"timestamp-ms": now, "version-id": vid})
        self._commit(self._current_metadata_version() + 1)

    def _current_metadata_version(self) -> int:
        import glob

        vs = glob.glob(os.path.join(self.root, "metadata", "v*.metadata.json"))
        return max(
            (int(os.path.basename(p).split(".")[0][1:]) for p in vs), default=0
        )

    def _commit(self, version: int) -> None:
        meta_dir = os.path.join(self.root, "metadata")
        os.makedirs(meta_dir, exist_ok=True)
        tmp = os.path.join(meta_dir, f".v{version}.metadata.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(self.raw, fh, indent=1)
        os.rename(tmp, os.path.join(meta_dir, f"v{version}.metadata.json"))
        with open(os.path.join(meta_dir, ".hint.tmp"), "w") as fh:
            fh.write(str(version))
        os.rename(
            os.path.join(meta_dir, ".hint.tmp"),
            os.path.join(meta_dir, "version-hint.text"),
        )

    # -- loading ------------------------------------------------------------

    @classmethod
    def load(cls, root: str) -> "IcebergView":
        import glob

        meta_dir = os.path.join(root, "metadata")
        hint = os.path.join(meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = int(fh.read().strip())
            path = os.path.join(meta_dir, f"v{v}.metadata.json")
        else:
            path = sorted(glob.glob(os.path.join(meta_dir, "v*.metadata.json")))[-1]
        with open(path) as fh:
            return cls(json.load(fh), root)

    @staticmethod
    def is_view(root: str) -> bool:
        import glob

        for p in glob.glob(os.path.join(root, "metadata", "v*.metadata.json")):
            try:
                with open(p) as fh:
                    return "view-uuid" in json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
        return False

    # -- expansion (A11) ----------------------------------------------------

    def sql(self, dialect: str = "spark") -> str:
        return self.sql_at(self.raw["current-version-id"], dialect)

    def sql_at(self, version_id: int, dialect: str = "spark") -> str:
        """The stored SQL of a SPECIFIC view version — view time travel
        (``FOR VERSION AS OF <version-id>`` on a view): versions are
        retained like table snapshots, so yesterday's report definition
        stays queryable after a REPLACE."""
        version = next(
            (
                v
                for v in self.raw["versions"]
                if v["version-id"] == version_id
            ),
            None,
        )
        if version is None:
            raise KeyError(
                f"view has no version {version_id} (have "
                f"{[v['version-id'] for v in self.raw['versions']]})"
            )
        reps = version["representations"]
        for r in reps:
            if r["type"] == "sql" and r.get("dialect", "spark") == dialect:
                return r["sql"]
        for r in reps:  # any SQL representation as fallback
            if r["type"] == "sql":
                return r["sql"]
        raise ValueError("view has no SQL representation")

    def version_at_timestamp(self, ts_ms: int) -> int:
        """The view version current AS OF the given epoch millis (the
        version-log walk tables do for TIMESTAMP AS OF)."""
        best = None
        for e in self.raw.get("version-log", []):
            if e["timestamp-ms"] <= ts_ms and (
                best is None or e["timestamp-ms"] >= best[0]
            ):
                best = (e["timestamp-ms"], e["version-id"])
        if best is None:
            raise ValueError(
                f"no view version at or before timestamp {ts_ms}"
            )
        return best[1]

    def declared_schema(self) -> Optional[dict]:
        """The view's declared Iceberg schema JSON, if one was persisted
        (reference views always carry one — SchemaV2 in table.rs:369-391)."""
        schemas = self.raw.get("schemas") or []
        if not schemas:
            return None
        vid = self.raw["current-version-id"]
        version = next(
            v for v in self.raw["versions"] if v["version-id"] == vid
        )
        sid = version.get("schema-id", 0)
        for s in schemas:
            if s.get("schema-id", 0) == sid:
                return s
        return schemas[0]

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Re-plan the stored SQL against the current session state —
        the reference's scan-time DFParser + statement_to_plan
        (table.rs:106-108) is Catalyst's job here.  When the view carries
        a declared schema (the reference's views always do,
        table.rs:369-391), the expanded plan is validated against it:
        a drifted base table surfaces as an immediate, named error
        instead of silently changing the view's shape downstream."""
        df = spark.sql(self.sql())
        declared = self.declared_schema()
        if declared is not None:
            from datafusion_iceberg_spark.iceberg.metadata import (
                schema_to_struct_type,
            )

            want = schema_to_struct_type(declared)
            got = df.schema
            if [f.name for f in got.fields] != [f.name for f in want.fields]:
                raise ValueError(
                    f"view {self.root}: expanded columns "
                    f"{[f.name for f in got.fields]} != declared "
                    f"{[f.name for f in want.fields]}"
                )
            for g, w in zip(got.fields, want.fields):
                if g.dataType != w.dataType:
                    raise ValueError(
                        f"view {self.root}: column {g.name!r} expands to "
                        f"{g.dataType.simpleString()}, declared "
                        f"{w.dataType.simpleString()}"
                    )
        return df
