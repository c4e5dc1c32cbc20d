"""Property test for the vectorized CDC overwrite-diff kernel (r10):
the Arrow canonical-key/netting path must agree with a plain
Counter-based multiset model on random frames — mixed types, nulls,
NaN, duplicate rows, empty sides — across every bucket split."""

from __future__ import annotations

import math
import os
import random
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_iceberg_spark.sources.iceberg_datasource import (
    IcebergCdcOverwriteDiffPartition,
    IcebergPyCdcStreamReader,
)


def _rand_rows(rng, n):
    rows = []
    for _ in range(n):
        rows.append(
            (
                rng.randrange(0, 6),
                rng.choice(
                    [None, 0.5, 1.5, float("nan"), 2.0, -0.0]
                ),
                rng.choice([None, "a", "b", "", "x\x1fy", "None"]),
            )
        )
    return rows


def _write(path, rows):
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "f": pa.array([r[1] for r in rows], pa.float64()),
            "s": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)
    return path


def _canon(row):
    k, f, s = row
    if isinstance(f, float) and math.isnan(f):
        f = "__nan__"
    return (k, f, s)


def _model(removed_rows, added_rows):
    net = Counter(map(_canon, removed_rows))
    net.subtract(map(_canon, added_rows))
    deletes = Counter({r: c for r, c in net.items() if c > 0})
    inserts = Counter({r: -c for r, c in net.items() if c < 0})
    return deletes, inserts


def _kernel(tmp, removed_rows, added_rows, n_buckets):
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    removed = [
        _write(os.path.join(tmp, f"rm{i}.parquet"), chunk)
        for i, chunk in enumerate(
            [removed_rows[: len(removed_rows) // 2], removed_rows[len(removed_rows) // 2:]]
        )
        if chunk
    ]
    added = [
        _write(os.path.join(tmp, f"ad{i}.parquet"), chunk)
        for i, chunk in enumerate(
            [added_rows[: len(added_rows) // 3], added_rows[len(added_rows) // 3:]]
        )
        if chunk
    ]
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("_change_type", T.StringType()),
            T.StructField("_change_ordinal", T.IntegerType()),
        ]
    )
    arrow_schema = to_arrow_schema(schema)

    class _Reader:  # the kernel only touches self._fids()
        def _fids(self):
            return {}

    rd = _Reader()
    dels, ins = Counter(), Counter()
    for b in range(n_buckets):
        part = IcebergCdcOverwriteDiffPartition(
            [(p, p, -1) for p in removed],
            added,
            {"_change_type": "delete", "_change_ordinal": 1},
            {"_change_type": "insert", "_change_ordinal": 1},
            [],
            {},
            [],
            b,
            n_buckets,
        )
        for batch in IcebergPyCdcStreamReader._read_overwrite_diff(
            rd, part, arrow_schema
        ):
            ct = batch.column(3).to_pylist()
            ks = batch.column(0).to_pylist()
            fs = batch.column(1).to_pylist()
            ss = batch.column(2).to_pylist()
            for c, row in zip(ct, zip(ks, fs, ss)):
                (dels if c == "delete" else ins)[_canon(row)] += 1
    return dels, ins


@pytest.mark.parametrize("seed", [7, 21, 99, 1234])
def test_vectorized_diff_matches_multiset_model(tmp_path, seed):
    rng = random.Random(seed)
    removed = _rand_rows(rng, rng.randrange(0, 120))
    # added = carried subset (must cancel) + fresh rows
    carried = [r for r in removed if rng.random() < 0.6]
    added = carried + _rand_rows(rng, rng.randrange(0, 80))
    rng.shuffle(added)
    want_d, want_i = _model(removed, added)
    got_d, got_i = _kernel(str(tmp_path), removed, added, rng.choice([1, 3, 8]))
    assert got_d == want_d
    assert got_i == want_i


def test_vectorized_diff_empty_sides(tmp_path):
    rows = [(1, 0.5, "a"), (1, 0.5, "a"), (2, None, None)]
    d, i = _kernel(str(tmp_path), rows, [], 4)
    assert d == _model(rows, [])[0] and not i
    other = os.path.join(str(tmp_path), "x2")
    os.makedirs(other, exist_ok=True)
    d, i = _kernel(other, [], rows, 4)
    assert i == _model([], rows)[1] and not d
