"""SCD Type 2 apply (operators/scd.py): one-MERGE history-preserving
dimension updates."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.operators.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_current,
)

D = datetime.date


def _mkdim(spark, root):
    cat = Catalog(root)
    dim = spark.createDataFrame(
        [
            (1, "alice", 100.0, D(1992, 1, 1), None, True),
            (2, "bob", 200.0, D(1992, 1, 1), None, True),
            (3, "carol", 300.0, D(1992, 1, 1), None, True),
        ],
        "k long, name string, bal double, valid_from date, valid_to date,"
        " is_current boolean",
    )
    cat.create_table("d.cust", dim.schema)
    cat.append("d.cust", spark, dim)
    return cat


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "k long, name string, bal double, eff date"
    )


def test_changed_noop_new(spark, tmp_path):
    cat = _mkdim(spark, str(tmp_path))
    eff = D(1995, 6, 1)
    scd2_apply(
        cat,
        "d.cust",
        spark,
        _upd(
            spark,
            [
                (1, "alice", 150.0, eff),   # changed bal
                (2, "bob", 200.0, eff),     # no-op
                (9, "zoe", 1.0, eff),       # brand new
            ],
        ),
        key="k",
        tracked=["name", "bal"],
        effective="eff",
    )
    t = cat.load("d.cust")
    rows = {
        (r["k"], r["bal"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in t.to_df(spark).collect()
    }
    assert rows == {
        (1, 100.0, D(1992, 1, 1), eff, False),   # closed out
        (1, 150.0, eff, None, True),              # new version
        (2, 200.0, D(1992, 1, 1), None, True),    # untouched no-op
        (3, 300.0, D(1992, 1, 1), None, True),    # untouched absent
        (9, 1.0, eff, None, True),                # brand new
    }
    # atomicity: initial append + ONE merge snapshot
    assert len(t.metadata.snapshots) == 2


def test_second_apply_layers_history(spark, tmp_path):
    cat = _mkdim(spark, str(tmp_path))
    e1, e2 = D(1995, 6, 1), D(1997, 2, 1)
    kw = dict(key="k", tracked=["name", "bal"], effective="eff")
    scd2_apply(cat, "d.cust", spark, _upd(spark, [(1, "alice", 150.0, e1)]), **kw)
    scd2_apply(cat, "d.cust", spark, _upd(spark, [(1, "alice", 175.0, e2)]), **kw)
    t = cat.load("d.cust")
    hist = sorted(
        (r["valid_from"], r["valid_to"], r["bal"])
        for r in t.to_df(spark).where("k = 1").collect()
    )
    assert hist == [
        (D(1992, 1, 1), e1, 100.0),
        (e1, e2, 150.0),
        (e2, None, 175.0),
    ]
    # point-in-time views
    assert scd2_as_of(t, spark, D(1996, 1, 1)).where("k = 1").first()["bal"] == 150.0
    assert scd2_current(t, spark).where("k = 1").first()["bal"] == 175.0


def test_noop_batch_commits_nothing_new(spark, tmp_path):
    cat = _mkdim(spark, str(tmp_path))
    n0 = len(cat.load("d.cust").metadata.snapshots)
    scd2_apply(
        cat,
        "d.cust",
        spark,
        _upd(spark, [(1, "alice", 100.0, D(1995, 6, 1))]),
        key="k",
        tracked=["name", "bal"],
        effective="eff",
    )
    t = cat.load("d.cust")
    assert t.to_df(spark).count() == 3
    assert t.to_df(spark).where("NOT is_current").count() == 0
    assert len(t.metadata.snapshots) <= n0 + 1  # empty merge may no-op


def test_latest_per_key_wins(spark, tmp_path):
    cat = _mkdim(spark, str(tmp_path))
    scd2_apply(
        cat,
        "d.cust",
        spark,
        _upd(
            spark,
            [
                (1, "alice", 111.0, D(1995, 1, 1)),
                (1, "alice", 222.0, D(1995, 9, 9)),  # newer wins
            ],
        ),
        key="k",
        tracked=["name", "bal"],
        effective="eff",
    )
    cur = scd2_current(cat.load("d.cust"), spark).where("k = 1").first()
    assert cur["bal"] == 222.0
    assert cur["valid_from"] == D(1995, 9, 9)


def test_reactivation_of_closed_key(spark, tmp_path):
    """A key whose every version is closed (here: manufactured directly)
    gets a fresh open version; history rows stay byte-identical."""
    root = str(tmp_path)
    cat = Catalog(root)
    dim = spark.createDataFrame(
        [(1, "alice", 100.0, D(1992, 1, 1), D(1993, 1, 1), False)],
        "k long, name string, bal double, valid_from date, valid_to date,"
        " is_current boolean",
    )
    cat.create_table("d.cust", dim.schema)
    cat.append("d.cust", spark, dim)
    scd2_apply(
        cat,
        "d.cust",
        spark,
        _upd(spark, [(1, "alice", 500.0, D(1999, 1, 1))]),
        key="k",
        tracked=["name", "bal"],
        effective="eff",
    )
    rows = sorted(
        (r["valid_from"], r["valid_to"], r["bal"], r["is_current"])
        for r in cat.load("d.cust").to_df(spark).collect()
    )
    assert rows == [
        (D(1992, 1, 1), D(1993, 1, 1), 100.0, False),
        (D(1999, 1, 1), None, 500.0, True),
    ]


def test_null_safe_change_detection(spark, tmp_path):
    """NULL→value and value→NULL are changes; NULL→NULL is not."""
    root = str(tmp_path)
    cat = Catalog(root)
    dim = spark.createDataFrame(
        [
            (1, None, 100.0, D(1992, 1, 1), None, True),
            (2, None, 200.0, D(1992, 1, 1), None, True),
        ],
        "k long, name string, bal double, valid_from date, valid_to date,"
        " is_current boolean",
    )
    cat.create_table("d.cust", dim.schema)
    cat.append("d.cust", spark, dim)
    scd2_apply(
        cat,
        "d.cust",
        spark,
        _upd(spark, [(1, "named", 100.0, D(1995, 1, 1)),
                     (2, None, 200.0, D(1995, 1, 1))]),
        key="k",
        tracked=["name", "bal"],
        effective="eff",
    )
    df = cat.load("d.cust").to_df(spark)
    assert df.where("k = 1").count() == 2  # NULL→'named' versioned
    assert df.where("k = 2").count() == 1  # NULL→NULL no-op


def test_missing_column_raises(spark, tmp_path):
    cat = _mkdim(spark, str(tmp_path))
    with pytest.raises(ValueError, match="missing"):
        scd2_apply(
            cat,
            "d.cust",
            spark,
            _upd(spark, [(1, "x", 1.0, D(1995, 1, 1))]),
            key="k",
            tracked=["name", "nope"],
            effective="eff",
        )


# ---------------------------------------------------------------------------
# Fuzzer: random SCD2 programs vs an independent reference model.
# ---------------------------------------------------------------------------


class _Scd2Model:
    """Tiny independent SCD2 implementation: dict of open versions +
    closed-history list.  Mirrors the operator's contract (latest per
    key per batch, null-safe change detection, re-activation)."""

    def __init__(self):
        self.open: dict = {}     # k -> (name, bal, valid_from)
        self.closed: list = []   # (k, name, bal, valid_from, valid_to)

    def apply(self, updates, eff):
        latest = {}
        for k, name, bal in updates:
            latest[k] = (name, bal)
        for k, (name, bal) in sorted(latest.items()):
            cur = self.open.get(k)
            if cur is not None and (cur[0], cur[1]) == (name, bal):
                continue  # no-op
            if cur is not None:
                self.closed.append((k, cur[0], cur[1], cur[2], eff))
            self.open[k] = (name, bal, eff)

    def rows(self):
        out = set(self.closed) | {
            (k, n, b, vf, None) for k, (n, b, vf) in self.open.items()
        }
        return sorted(out, key=lambda r: (r[0], str(r[3])))


@pytest.mark.parametrize("seed", [3, 77])
def test_random_scd2_program_matches_model(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    cat = Catalog(str(tmp_path / "wh"))
    dim = spark.createDataFrame(
        [],
        "k long, name string, bal double, valid_from date, valid_to date,"
        " is_current boolean",
    )
    cat.create_table("d.cust", dim.schema)
    cat.append("d.cust", spark, dim)
    model = _Scd2Model()
    names = ("ann", "bob", "cat", None)
    for step in range(6):
        eff = D(1995, 1 + step, 1)
        n_upd = rng.randint(1, 6)
        updates = []
        for _ in range(n_upd):
            k = rng.randint(0, 7)
            cur = model.open.get(k)
            kind = rng.choice(("change", "noop", "any"))
            if kind == "noop" and cur is not None:
                updates.append((k, cur[0], cur[1]))
            else:
                updates.append(
                    (k, rng.choice(names), float(rng.randint(0, 5)) * 10)
                )
        # the operator takes max_by(eff) per key; with one eff per batch
        # the LAST occurrence is unspecified — dedup to a single row per
        # key (keep the last generated) to keep both sides deterministic
        dedup = {}
        for row in updates:
            dedup[row[0]] = row
        updates = list(dedup.values())
        scd2_apply(
            cat,
            "d.cust",
            spark,
            spark.createDataFrame(
                [(k, n, b, eff) for k, n, b in updates],
                "k long, name string, bal double, eff date",
            ),
            key="k",
            tracked=["name", "bal"],
            effective="eff",
        )
        model.apply(updates, eff)
        got = sorted(
            (
                (r["k"], r["name"], r["bal"], r["valid_from"], r["valid_to"])
                for r in cat.load("d.cust").to_df(spark).collect()
            ),
            key=lambda r: (r[0], str(r[3])),
        )
        assert got == model.rows(), (
            f"seed {seed} diverged after batch {step} (eff {eff})\n"
            f"got={got}\nwant={model.rows()}"
        )
