"""Property tests for the SPJ planner's pure-Python kernels
(iceberg/spj.py): branch packing and composite grouping invariants that
hold for ANY file layout, not just the fixtures."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_iceberg_spark.iceberg.spj import _pack_branches


@st.composite
def keys_loads(draw):
    n = draw(st.integers(0, 400))
    return [
        ((i,), draw(st.integers(0, 1 << 40))) for i in range(n)
    ]


@given(keys_loads(), st.integers(1, 64))
@settings(max_examples=200, deadline=None)
def test_pack_branches_partition_and_bound(kl, max_branches):
    branches = _pack_branches(kl, max_branches)
    # every key lands in exactly one branch
    flat = [k for b in branches for k in b]
    assert sorted(flat) == sorted(k for k, _ in kl)
    assert len(flat) == len(set(flat)) == len(kl)
    # branch count bounded (and no empty branches returned)
    assert len(branches) <= max_branches
    assert all(b for b in branches)
    # LPT load bound: max branch load <= avg + max single item (the
    # classical greedy guarantee, slightly loosened for integer loads)
    if kl and len(kl) > max_branches:
        loads = {k: v for k, v in kl}
        per_branch = [sum(loads[k] for k in b) for b in branches]
        total = sum(loads.values())
        biggest = max(loads.values())
        assert max(per_branch) <= total / max_branches + biggest


@given(keys_loads(), st.integers(1, 64))
@settings(max_examples=50, deadline=None)
def test_pack_branches_deterministic(kl, max_branches):
    import random

    shuffled = list(kl)
    random.Random(7).shuffle(shuffled)
    a = _pack_branches(kl, max_branches)
    b = _pack_branches(shuffled, max_branches)
    assert [sorted(x) for x in a] == [sorted(x) for x in b]


@given(st.integers(-10**7, 10**7))
@settings(max_examples=300, deadline=None)
def test_temporal_fold_composes(hours):
    """The hierarchy is coherent: folding hour→day→month→year stepwise
    equals folding directly, and each fold matches calendar arithmetic."""
    from datetime import date, timedelta

    from datafusion_iceberg_spark.iceberg.spj import _temporal_fold

    day = _temporal_fold(hours, "hour", "day")
    assert day == hours // 24
    month = _temporal_fold(hours, "hour", "month")
    assert month == _temporal_fold(day, "day", "month")
    year = _temporal_fold(hours, "hour", "year")
    assert year == _temporal_fold(month, "month", "year") == month // 12
    d = date(1970, 1, 1) + timedelta(days=day)
    assert month == (d.year - 1970) * 12 + d.month - 1
    assert year == d.year - 1970


@given(
    st.integers(-10**15, 10**15),
    st.integers(1, 10**6),
    st.integers(1, 64),
)
@settings(max_examples=300, deadline=None)
def test_int_truncate_fold_validity(x, wf, mult):
    """The divisibility rule is exactly right: trunc_Wf(x) determines
    trunc_Wc(x) whenever Wf | Wc (the grid the SPJ groups on)."""
    wc = wf * mult
    t_f = x - (x % wf)
    t_c = x - (x % wc)
    # folding the FINE value onto the coarse grid reproduces trunc_Wc(x)
    assert t_f - (t_f % wc) == t_c
