"""Schema evolution through the write path (mergeSchema /
``write.spark.accept-any-schema``, VERDICT r8 next-round #1).

A source DataFrame carrying columns the table lacks auto-ADDs them
(optional, field-id allocated) on append / upsert / MERGE when the
table property opts in or the caller passes ``merge_schema=True``;
Iceberg-legal type promotions (int→long, float→double) auto-widen.
Files written before each add read as NULL through the field-id
mapping.  Reference parity anchor: the reference pins a single scan
schema (table.rs:81-87) and has no write path at all (SURVEY §2C).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.iceberg.catalog import Catalog


@pytest.fixture()
def scratch(tmp_path):
    return str(tmp_path)


def _base(spark):
    return spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long"
    )


def _with_new_col(spark):
    return spark.createDataFrame(
        [(4, 40, "a"), (5, 50, "b")], "k long, v long, tag string"
    )


def test_append_auto_adds_column_under_property(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.append("ns.t", spark, _base(spark))
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    cat.append("ns.t", spark, _with_new_col(spark))
    rows = {
        r["k"]: (r["v"], r["tag"])
        for r in cat.sql(
            spark, "SELECT k, v, tag FROM iceberg.ns.t"
        ).collect()
    }
    # old files read the new column as NULL; new files carry values
    assert rows == {
        1: (10, None), 2: (20, None), 3: (30, None),
        4: (40, "a"), 5: (50, "b"),
    }
    # the add is a real schema evolution: new field id past the originals
    meta = cat.load("ns.t").metadata
    ids = meta.field_ids_by_name()
    assert ids["tag"] == 3


def test_append_without_property_leaves_schema_unchanged(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.append("ns.t", spark, _base(spark))
    # documented contract without opt-in: extra source columns are
    # dropped (the select projects schema columns), schema untouched
    cat.append("ns.t", spark, _with_new_col(spark))
    assert "tag" not in cat.load("ns.t").metadata.field_ids_by_name()
    got = {r["k"] for r in cat.sql(spark, "SELECT k FROM iceberg.ns.t").collect()}
    assert got == {1, 2, 3, 4, 5}


def test_per_call_override_beats_property(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.append("ns.t", spark, _base(spark), merge_schema=True)  # no-op delta
    cat.append("ns.t", spark, _with_new_col(spark), merge_schema=True)
    assert "tag" in cat.load("ns.t").metadata.field_ids_by_name()
    # and merge_schema=False suppresses even with the property on
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    more = spark.createDataFrame(
        [(6, 60, "c", 1.5)], "k long, v long, tag string, score double"
    )
    cat.append("ns.t", spark, more, merge_schema=False)
    assert "score" not in cat.load("ns.t").metadata.field_ids_by_name()


def test_append_widens_int_to_long(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    narrow = spark.createDataFrame([(1, 10)], "k long, v int")
    cat.create_table("ns.t", narrow.schema)
    cat.append("ns.t", spark, narrow)
    wide = spark.createDataFrame([(2, 3_000_000_000)], "k long, v long")
    cat.append("ns.t", spark, wide, merge_schema=True)
    meta = cat.load("ns.t").metadata
    types = {f["name"]: f["type"] for f in meta.current_schema["fields"]}
    assert types["v"] == "long"
    got = {r["k"]: r["v"] for r in cat.sql(spark, "SELECT k, v FROM iceberg.ns.t").collect()}
    assert got == {1: 10, 2: 3_000_000_000}


def test_merge_auto_adds_and_insert_star_fills_null(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.append("ns.t", spark, _base(spark))
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    src = spark.createDataFrame(
        [(2, 222, "hot"), (9, 90, "new")], "k long, v long, tag string"
    )
    cat.merge_into(
        "ns.t", spark, src, on="k",
        when_matched_set={"v": "src.v", "tag": "src.tag"},
    )
    rows = {
        r["k"]: (r["v"], r["tag"])
        for r in cat.sql(spark, "SELECT k, v, tag FROM iceberg.ns.t").collect()
    }
    assert rows == {
        1: (10, None), 2: (222, "hot"), 3: (30, None), 9: (90, "new"),
    }
    # second merge whose source LACKS the evolved column: INSERT * must
    # fill NULL for it instead of failing resolution
    src2 = spark.createDataFrame([(11, 110)], "k long, v long")
    cat.merge_into("ns.t", spark, src2, on="k")
    rows = {
        r["k"]: r["tag"]
        for r in cat.sql(spark, "SELECT k, tag FROM iceberg.ns.t").collect()
    }
    assert rows[11] is None and rows[2] == "hot"


def test_merge_mor_auto_adds(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.set_properties("ns.t", {"write.merge.mode": "merge-on-read"})
    cat.append("ns.t", spark, _base(spark))
    src = spark.createDataFrame(
        [(3, 333, 7), (8, 80, 8)], "k long, v long, w long"
    )
    cat.merge_into(
        "ns.t", spark, src, on="k",
        when_matched_set={"v": "src.v", "w": "src.w"},
        merge_schema=True,
    )
    rows = {
        r["k"]: (r["v"], r["w"])
        for r in cat.sql(spark, "SELECT k, v, w FROM iceberg.ns.t").collect()
    }
    assert rows == {1: (10, None), 2: (20, None), 3: (333, 7), 8: (80, 8)}


def test_upsert_auto_adds(spark, scratch):
    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table("ns.t", _base(spark).schema)
    cat.append("ns.t", spark, _base(spark))
    cat.set_identifier_fields("ns.t", ["k"])
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    cat.upsert(
        "ns.t",
        spark,
        spark.createDataFrame([(2, 200, "x")], "k long, v long, tag string"),
    )
    rows = {
        r["k"]: (r["v"], r["tag"])
        for r in cat.sql(spark, "SELECT k, v, tag FROM iceberg.ns.t").collect()
    }
    assert rows == {1: (10, None), 2: (200, "x"), 3: (30, None)}


def test_rest_write_through_add_schema(spark, scratch):
    """The auto-add rides the REST commit protocol: the new schema lands
    on the SERVICE (a fresh client sees it), not just the local mirror."""
    from datafusion_iceberg_spark.iceberg.rest_catalog import (
        LocalRestServer,
        RestCatalog,
        RestCatalogClient,
    )

    root = os.path.join(scratch, "whrest")
    os.makedirs(root, exist_ok=True)
    server = LocalRestServer(root)
    try:
        base_url = server.start()
        rest = RestCatalog(RestCatalogClient(base_url), name="r")
        rest.create_table("ns.t", _base(spark).schema)
        rest.append("ns.t", spark, _base(spark))
        rest.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
        rest.append("ns.t", spark, _with_new_col(spark))
        fresh = RestCatalog(RestCatalogClient(base_url), name="r2")
        meta = fresh.load("ns.t").metadata
        assert "tag" in meta.field_ids_by_name()
        got = {
            r["k"]: r["tag"]
            for r in fresh.sql(spark, "SELECT k, tag FROM r2.ns.t").collect()
        }
        assert got == {1: None, 2: None, 3: None, 4: "a", 5: "b"}
    finally:
        server.stop()


def test_schema_evolution_preserves_identifier_fields(spark, scratch):
    """r9 regression find: identifier-field-ids live ON the schema
    object, so ADD/RENAME/WIDEN COLUMN used to silently wipe the
    table's upsert keys by building the new schema version without
    carrying them.  DROP of an identifier column retires its id."""
    cat = Catalog(os.path.join(scratch, "wh"))
    narrow = spark.createDataFrame([(1, 10, 5)], "k long, v int, d long")
    cat.create_table("ns.t", narrow.schema)
    cat.set_identifier_fields("ns.t", ["k"])
    cat.add_column("ns.t", "tag", T.StringType())
    cat.rename_column("ns.t", "tag", "label")
    cat.widen_column("ns.t", "v", T.LongType())
    w = cat.writer("ns.t")
    assert w.identifier_columns() == ["k"]
    cat.drop_column("ns.t", "d")
    assert cat.writer("ns.t").identifier_columns() == ["k"]
    # dropping the identifier column itself retires the id
    cat.set_identifier_fields("ns.t", ["k", "v"])
    cat.drop_column("ns.t", "v")
    assert cat.writer("ns.t").identifier_columns() == ["k"]


def test_merge_schema_fuzzer(spark, scratch):
    """Random DML interleaved with source-side column adds (VERDICT r8
    #1's fuzzer arm): every state transition is replayed on a plain dict
    model; the table must match after every commit."""
    rng = random.Random(90210)
    cat = Catalog(os.path.join(scratch, "wh"))
    schema_cols = ["k", "v"]  # model's view of the evolving schema
    cat.create_table(
        "ns.t",
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("v", T.LongType()),
        ]),
    )
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    cat.set_identifier_fields("ns.t", ["k"])
    model: dict[int, dict] = {}
    next_col = 0
    next_key = 0

    def _mkrows(n, cols):
        nonlocal next_key
        out = []
        for _ in range(n):
            next_key += 1
            row = {"k": next_key, "v": rng.randrange(1000)}
            for c in cols[2:]:
                row[c] = rng.randrange(100)
            out.append(row)
        return out

    def _df(rows, cols):
        schema = T.StructType(
            [T.StructField(c, T.LongType()) for c in cols]
        )
        return spark.createDataFrame(
            [tuple(r[c] for c in cols) for r in rows], schema
        )

    for step in range(12):
        op = rng.choice(["append", "append_new_col", "upsert", "delete"])
        if op == "append_new_col":
            next_col += 1
            schema_cols.append(f"c{next_col}")
            op = "append"
        if op == "append":
            rows = _mkrows(rng.randrange(1, 4), schema_cols)
            cat.append("ns.t", spark, _df(rows, schema_cols))
            for r in rows:
                model[r["k"]] = r
        elif op == "upsert" and model:
            victim = rng.choice(sorted(model))
            row = {"k": victim, "v": rng.randrange(1000)}
            for c in schema_cols[2:]:
                row[c] = rng.randrange(100)
            cat.upsert("ns.t", spark, _df([row], schema_cols))
            model[victim] = row
        elif op == "delete" and model:
            victim = rng.choice(sorted(model))
            cat.delete_where("ns.t", spark, f"k = {victim}")
            del model[victim]
        # verify: full table vs model, NULL for pre-evolution rows
        got = {
            r["k"]: {c: r[c] for c in schema_cols}
            for r in cat.sql(
                spark,
                f"SELECT {', '.join(schema_cols)} FROM iceberg.ns.t",
            ).collect()
        }
        want = {
            k: {c: r.get(c) for c in schema_cols} for k, r in model.items()
        }
        assert got == want, f"step {step} ({op}) diverged"


def test_merge_schema_adds_nested_struct_field(spark, scratch):
    """A source struct with an extra subfield auto-ADDs the nested
    field (add_nested_field: fresh id, optional, metadata-only); files
    written before the add read the member as NULL; a genuinely
    conflicting subfield type still refuses."""
    cat = Catalog(os.path.join(scratch, "wh"))
    base = spark.createDataFrame(
        [(1, (10, "a"))], "k long, s struct<x: long, y: string>"
    )
    cat.create_table("ns.t", base.schema)
    cat.append("ns.t", spark, base)
    drifted = spark.createDataFrame(
        [(2, (20, "b", 5))],
        "k long, s struct<x: long, y: string, z: long>",
    )
    cat.append("ns.t", spark, drifted, merge_schema=True)
    got = sorted(
        (r.k, r.s.x, r.s.y, r.s.z)
        for r in cat.sql(spark, "SELECT k, s FROM iceberg.ns.t").collect()
    )
    assert got == [(1, 10, "a", None), (2, 20, "b", 5)]
    # the nested add allocated a real field id in metadata
    sfield = next(
        f
        for f in cat.load("ns.t").metadata.current_schema["fields"]
        if f["name"] == "s"
    )
    z = next(f for f in sfield["type"]["fields"] if f["name"] == "z")
    assert z["id"] > 3 and z["required"] is False
    # identical nested type (ids aside) is NOT a delta
    same = spark.createDataFrame(
        [(3, (30, "c", None))],
        "k long, s struct<x: long, y: string, z: long>",
    )
    cat.append("ns.t", spark, same, merge_schema=True)
    # a subfield TYPE CHANGE is a real conflict and refuses
    bad = spark.createDataFrame(
        [(4, (40, 9, 9))], "k long, s struct<x: long, y: long, z: long>"
    )
    with pytest.raises(ValueError, match="cannot evolve column 's.y'"):
        cat.append("ns.t", spark, bad, merge_schema=True)


def test_sql_add_nested_column(spark, scratch):
    """ALTER TABLE ... ADD COLUMN s.z BIGINT routes to
    add_nested_field through the parser's dotted path."""
    cat = Catalog(os.path.join(scratch, "wh"))
    base = spark.createDataFrame(
        [(1, (10, "a"))], "k long, s struct<x: long, y: string>"
    )
    cat.create_table("ns.t", base.schema)
    cat.append("ns.t", spark, base)
    cat.sql(spark, "ALTER TABLE iceberg.ns.t ADD COLUMN s.z BIGINT")
    row = cat.sql(spark, "SELECT s.z AS z FROM iceberg.ns.t").collect()[0]
    assert row.z is None
    cat.append(
        "ns.t",
        spark,
        spark.createDataFrame(
            [(2, (20, "b", 7))],
            "k long, s struct<x: long, y: string, z: long>",
        ),
    )
    got = {r.k: r.z for r in cat.sql(
        spark, "SELECT k, s.z AS z FROM iceberg.ns.t"
    ).collect()}
    assert got == {1: None, 2: 7}
    with pytest.raises(ValueError, match="already exists"):
        cat.sql(spark, "ALTER TABLE iceberg.ns.t ADD COLUMN s.z BIGINT")
    with pytest.raises(ValueError, match="not a struct"):
        cat.sql(spark, "ALTER TABLE iceberg.ns.t ADD COLUMN k.sub BIGINT")


def test_streaming_upsert_sink_evolves_on_restart(spark, scratch):
    """The reusable streaming upsert sink (iceberg_upsert_sink) with
    merge_schema=True: a RESTARTED stream whose source grew a column
    auto-evolves the table on its first batch — the CDC-pipeline shape
    (one running query's schema is fixed, evolution happens across
    restarts)."""
    import os

    from datafusion_iceberg_spark.streaming.windows import (
        iceberg_upsert_sink,
    )

    src_a = os.path.join(scratch, "src_a")
    src_b = os.path.join(scratch, "src_b")
    spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (1, 200, 11)], "k long, ts long, v long"
    ).write.parquet(src_a)
    spark.createDataFrame(
        [(2, 300, 21, "eu"), (3, 100, 30, "us")],
        "k long, ts long, v long, region string",
    ).write.parquet(src_b)

    cat = Catalog(os.path.join(scratch, "wh"))
    cat.create_table(
        "ns.t",
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("v", T.LongType()),
        ]),
    )
    cat.set_identifier_fields("ns.t", ["k"])

    def _run(path, schema_ddl):
        q = (
            spark.readStream.schema(schema_ddl)
            .parquet(path)
            .writeStream.foreachBatch(
                iceberg_upsert_sink(cat, "ns.t", ["ts"], merge_schema=True)
            )
            .option(
                "checkpointLocation", os.path.join(scratch, "ckpt", path[-1])
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    _run(src_a, "k long, ts long, v long")
    got = {
        r.k: (r.ts, r.v)
        for r in cat.sql(spark, "SELECT k, ts, v FROM iceberg.ns.t").collect()
    }
    assert got == {1: (200, 11), 2: (100, 20)}
    # restart with the WIDER source: region auto-adds; old rows NULL
    _run(src_b, "k long, ts long, v long, region string")
    got = {
        r.k: (r.ts, r.v, r.region)
        for r in cat.sql(
            spark, "SELECT k, ts, v, region FROM iceberg.ns.t"
        ).collect()
    }
    assert got == {
        1: (200, 11, None),
        2: (300, 21, "eu"),
        3: (100, 30, "us"),
    }


def test_nested_add_fuzzer(spark, scratch):
    """Random program over a struct column: appends (sometimes carrying
    a NEW struct subfield via merge_schema, sometimes narrower than the
    table), SQL nested ADD COLUMN, and COW deletes — verified against a
    dict model after every step.  Old rows must read new subfields as
    NULL; narrower sources must read their missing subfields as NULL."""
    rng = random.Random(424242)
    cat = Catalog(os.path.join(scratch, "wh"))
    subs = ["x"]  # evolving subfield list of struct s
    cat.create_table(
        "ns.t",
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField(
                "s", T.StructType([T.StructField("x", T.LongType())])
            ),
        ]),
    )
    cat.set_properties("ns.t", {"write.spark.accept-any-schema": "true"})
    model: dict[int, dict] = {}
    next_key = 0
    next_sub = 0

    def _append(cols):
        nonlocal next_key
        rows = []
        for _ in range(rng.randrange(1, 4)):
            next_key += 1
            vals = {c: rng.randrange(100) for c in cols}
            rows.append((next_key, tuple(vals[c] for c in cols)))
            model[next_key] = vals
        st = T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField(
                "s",
                T.StructType([T.StructField(c, T.LongType()) for c in cols]),
            ),
        ])
        cat.append("ns.t", spark, spark.createDataFrame(rows, st))

    for step in range(10):
        op = rng.choice(
            ["append", "append_new_sub", "append_narrow", "alter_add", "delete"]
        )
        if op == "append_new_sub":
            next_sub += 1
            subs.append(f"c{next_sub}")
            _append(subs)  # merge_schema via table property auto-adds
        elif op == "append_narrow" and len(subs) > 1:
            _append(subs[: rng.randrange(1, len(subs))])
        elif op == "alter_add":
            next_sub += 1
            subs.append(f"c{next_sub}")
            cat.sql(
                spark,
                f"ALTER TABLE iceberg.ns.t ADD COLUMN s.c{next_sub} BIGINT",
            )
        elif op == "delete" and model:
            victim = rng.choice(sorted(model))
            cat.delete_where("ns.t", spark, f"k = {victim}")
            del model[victim]
        else:
            _append(subs)
        sel = ", ".join(f"s.{c} AS {c}" for c in subs)
        got = {
            r.k: {c: r[c] for c in subs}
            for r in cat.sql(
                spark, f"SELECT k, {sel} FROM iceberg.ns.t"
            ).collect()
        }
        want = {
            k: {c: v.get(c) for c in subs} for k, v in model.items()
        }
        assert got == want, f"step {step} ({op}) diverged"
