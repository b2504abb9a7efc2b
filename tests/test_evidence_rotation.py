"""Evidence-age ceiling gate (VERDICT r11 item 8).

The driver verifies the FIRST ~50 ``queries()`` entries each round, so a
contract query only stays trustworthy if the rotation in
``workload._VERIFY_PRIORITY`` cycles it back into the window before its
newest green CORRECTNESS row ages out.  r11 made the age visible
(``evidence_age`` in BENCH_FULL.json); this turns it into a gate:

* **hard ceiling** — no contract query's newest green round may be older
  than ``latest_round - 2`` (with per-round rotation the steady-state max
  age is exactly 2: verified -> rides one round past the cap -> leads the
  next window).
* **new-query rule** — a query with NO green row yet must sit inside the
  first-50 window, otherwise it ships unverified.

Both re-read the committed ``CORRECTNESS_r*.json`` artifacts with the same
green predicate bench.py uses (rows+schema match, no err; hash may be the
weaker rows-only check for non-SQL-expressible ops).
"""

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def newest_green_rounds(artifact_dir):
    """(per-query newest green round, latest round seen) from the
    CORRECTNESS_r*.json artifacts under artifact_dir."""
    newest, rounds = {}, []
    for p in glob.glob(os.path.join(artifact_dir, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            with open(p) as f:
                rows = json.load(f)
        except Exception:
            continue
        if not isinstance(rows, dict):
            continue
        for q, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("err") is None
            ):
                newest[q] = max(newest.get(q, 0), rnd)
    return newest, (max(rounds) if rounds else 0)


def rotation_violations(queries_in_order, artifact_dir, window=WINDOW):
    """Queries that break the ceiling: evidence older than latest-2, or
    never verified while parked outside the verify window."""
    newest, latest = newest_green_rounds(artifact_dir)
    head = set(queries_in_order[:window])
    out = []
    for q in queries_in_order:
        if q not in newest:
            if q not in head:
                out.append((q, "unverified outside window"))
        elif newest[q] < latest - 2:
            out.append((q, f"newest green r{newest[q]} < r{latest - 2} ceiling"))
    return out


def test_real_tree_within_evidence_ceiling():
    from hyperspace_spark.workload import QUERIES

    bad = rotation_violations(list(QUERIES), REPO)
    assert bad == [], (
        f"verify-window rotation debt: {bad} — rotate _VERIFY_PRIORITY in "
        "hyperspace_spark/workload.py so stale/unverified queries lead the "
        "first-50 window"
    )


def test_guard_trips_on_synthetic_stale_entry(tmp_path):
    green = {"rows_match": True, "schema_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"old_q": green}))
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({"fresh_q": green}))
    names = ["fresh_q", "old_q", "never_q"]
    bad = dict(rotation_violations(names, str(tmp_path), window=1))
    # old_q: newest green r1 < r2 ceiling; never_q: unverified outside the
    # width-1 window; fresh_q: clean.
    assert set(bad) == {"old_q", "never_q"}
    assert "fresh_q" not in bad
    # widening the window forgives the unverified query but NOT the stale
    # one — window membership can't substitute for a fresh green row.
    bad2 = dict(rotation_violations(names, str(tmp_path), window=3))
    assert set(bad2) == {"old_q"}


def test_green_predicate_requires_no_err(tmp_path):
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "errored": {
                    "rows_match": True,
                    "schema_match": True,
                    "err": "boom",
                },
                "red": {"rows_match": False, "schema_match": True, "err": None},
            }
        )
    )
    newest, latest = newest_green_rounds(str(tmp_path))
    assert newest == {} and latest == 2
