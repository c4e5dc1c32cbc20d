"""Driver-window ordering must be self-rotating (VERDICT r6 item #1).

The correctness driver verifies ~50 queries per round in ``ordered_names()``
order.  Rounds 1-6 used a hand-maintained priority list that silently went
stale; the ordering is now computed from the repo's ``CORRECTNESS_r*.json``
history so never-verified gates always lead and previously-verified gates
rotate by staleness.
"""

import json
import os

from datafusion_iceberg_spark import registry

registry.load_all_modules()


def test_never_green_gates_lead_the_window():
    history = registry.driver_history()
    names = registry.ordered_names()
    never = {n for n in registry.QUERIES if n not in history}
    if not never:
        return  # everything verified: nothing to front-load
    head = set(names[: len(never)])
    assert head == never, (
        "queries with no green driver row must occupy the window front; "
        f"missing from front: {sorted(never - head)}"
    )


def test_verified_gates_rotate_by_staleness():
    history = registry.driver_history()
    names = registry.ordered_names()
    rounds = [history[n] for n in names if n in history]
    assert rounds == sorted(rounds), "verified gates must be least-recently-verified first"


def test_driver_history_reads_repo_correctness_files(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "green_q": {"rows_match": True, "hash_match": True, "err": None},
                "hash_miss_q": {"rows_match": True, "hash_match": False, "err": None},
                "err_q": {"rows_match": False, "hash_match": None, "err": "boom"},
                "rows_only_q": {"rows_match": True, "hash_match": None, "err": None},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"green_q": {"rows_match": True, "hash_match": True, "err": None}})
    )
    hist = registry.driver_history(root=str(tmp_path))
    assert hist == {"green_q": 3, "rows_only_q": 1}


def test_driver_history_survives_garbage_files(tmp_path):
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json {")
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps(["a", "list"]))
    assert registry.driver_history(root=str(tmp_path)) == {}


def test_default_root_is_repo_root():
    # the real repo files exist and parse: at least one green row recorded
    hist = registry.driver_history()
    assert len(hist) >= 150
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(registry.__file__)))
    assert os.path.exists(os.path.join(repo_root, "CORRECTNESS_r01.json"))
