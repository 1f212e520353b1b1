"""Regression tests for __spark_entry__._sweep_order — the driver checks
~50 catalog queries per round, so ordering IS verification coverage.
Round 3 lost an entire round to a bug here (green set read from only the
latest CORRECTNESS file, so truncated sweeps ping-ponged between two query
sets and never reached the tail); round 4's verdict added two more pinned
semantics: a clean rows-only run counts as VISITED (err=="no_oracle" rows
were re-occupying the first sweep slots forever), and visited queries are
re-verified OLDEST verdict first (regression canaries). These tests pin
all of it against the real repo correctness files plus synthetic ones.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry
from aidc_2018_timeseries_spark.plans.catalog import CATALOG

OK = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
BAD = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
ROWS_ONLY = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 25,
    "oracle_rows": None,
    "err": "no_oracle",
}
ROWS_ONLY_CRASH = {
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": None,
    "oracle_rows": None,
    "err": "TypeError: unhashable type: 'numpy.ndarray'",
}


def _visited_union() -> set[str]:
    return {n for n, (ok, _) in entry._visit_status().items() if ok}


def test_order_is_a_permutation_of_the_catalog():
    order = entry._sweep_order()
    assert sorted(order) == sorted(CATALOG)
    assert len(order) == len(set(order))


def test_visited_union_across_all_rounds_and_sort_last():
    """The core round-3 fix: a query with a usable verdict in ANY prior
    round must sit after every never-checked query, so a truncated sweep
    spends its slots on new coverage."""
    order = entry._sweep_order()
    visited = _visited_union() & set(CATALOG)
    if not visited or visited == set(CATALOG):
        return  # degenerate repo state; nothing to order
    last_unchecked = max(i for i, n in enumerate(order) if n not in visited)
    first_visited = min(i for i, n in enumerate(order) if n in visited)
    assert last_unchecked < first_visited, (
        "a cumulative-visited query was ordered before a never-checked one"
    )


def test_unchecked_rows_only_queries_are_not_banished_to_the_end():
    """Rows-only queries interleave into the unverified block (they starved
    for three rounds when always ordered last)."""
    order = entry._sweep_order()
    visited = _visited_union() & set(CATALOG)
    unchecked = [n for n in order if n not in visited]
    rows_only = [n for n in unchecked if CATALOG[n].oracle is None]
    oracle = [n for n in unchecked if CATALOG[n].oracle is not None]
    if len(rows_only) < 2 or len(oracle) < 4:
        return  # not enough of each kind to interleave
    # at least one rows-only query must appear before the last oracle one
    first_rows_only = unchecked.index(rows_only[0])
    last_oracle = unchecked.index(oracle[-1])
    assert first_rows_only < last_oracle


def test_latest_verdict_wins_over_earlier_green(tmp_path, monkeypatch):
    """A query that was green in an old round but regressed in a newer one
    must re-enter the unverified front, not stay hidden at the tail (a
    plain union over rounds would hide the regression forever)."""
    regressed, still_green = sorted(CATALOG)[:2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({regressed: OK, still_green: OK})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({regressed: BAD}))
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order.index(regressed) < order.index(still_green)
    assert order.index(still_green) == len(order) - 1  # sole visited → tail


def test_clean_rows_only_run_counts_as_visited(tmp_path, monkeypatch):
    """Round-4 verdict item 3: a rows-only query whose sweep produced rows
    (err=='no_oracle', spark_rows recorded) is VISITED and moves to the
    tail; one that crashed (a real exception in err) stays in the front.
    Without this, the 11 permanently-no-oracle faces re-occupy the first
    sweep slots every round forever."""
    names = sorted(CATALOG)
    clean, crashed = names[0], names[1]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({clean: ROWS_ONLY, crashed: ROWS_ONLY_CRASH})
    )
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order.index(clean) == len(order) - 1  # sole visited → tail
    assert order.index(crashed) < len(order) - 1  # crash → still unverified


def test_priority_list_is_empty_and_mechanism_still_prunes(tmp_path, monkeypatch):
    """Round-6 verdict item 5: the round-3 starvation list is retired (all
    entries held standing verdicts — dead weight pinning slot order). The
    mechanism stays for future judge-named queries: verify it still fronts
    unvisited priorities and prunes covered ones."""
    assert entry._PRIORITY == []
    covered, starved = sorted(CATALOG)[:2]
    monkeypatch.setattr(entry, "_PRIORITY", [covered, starved])
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({covered: ROWS_ONLY}))
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order[0] == starved  # still-unvisited priority leads
    assert order.index(covered) > order.index(starved)


def test_visited_tail_re_verifies_oldest_verdicts_first(tmp_path, monkeypatch):
    """Regression canary: within the visited tail, the query whose standing
    verdict is OLDEST comes first, so rotating sweep slots re-check stale
    greens before recently-confirmed ones."""
    old_green, new_green, newer_rows_only = sorted(CATALOG)[:3]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({old_green: OK}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({new_green: OK}))
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({newer_rows_only: ROWS_ONLY})
    )
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order[-3:] == [old_green, new_green, newer_rows_only]


def test_round_files_merge_in_numeric_not_lexicographic_order(
    tmp_path, monkeypatch
):
    """ADVICE r4: 'latest verdict wins' must survive r100 (sorts before r99
    lexicographically) and an unpadded r4 (sorts after r04..r39)."""
    q = sorted(CATALOG)[0]
    # numerically r4 < r99 < r100; lexicographically r100 < r4 < r99
    (tmp_path / "CORRECTNESS_r4.json").write_text(json.dumps({q: OK}))
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps({q: OK}))
    (tmp_path / "CORRECTNESS_r100.json").write_text(json.dumps({q: BAD}))
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    status = entry._visit_status()
    assert status[q] == (False, 100)  # r100's regression is the latest word
    order = entry._sweep_order()
    assert order.index(q) < len(order) - 1  # regressed → unverified front


def test_simulated_r5_order_rechecks_oldest_greens():
    """Against the REAL repo correctness files: after the unvisited front,
    the first visited entries must be round-1 greens, not round-4 ones
    (the whole point of the canary rotation)."""
    status = entry._visit_status()
    order = entry._sweep_order()
    visited_tail = [n for n in order if n in status and status[n][0]]
    if len(visited_tail) < 2:
        return
    rounds = [status[n][1] for n in visited_tail]
    assert rounds == sorted(rounds), "visited tail not oldest-verdict-first"
    # and the repo really does have multi-round history to rotate through
    assert rounds[0] < rounds[-1]


def test_queries_and_oracle_sql_follow_the_same_order():
    q = entry.queries()
    o = entry.oracle_sql()
    assert list(q) == entry._sweep_order()
    assert set(o) == {n for n in q if CATALOG[n].oracle is not None}


def test_no_catalog_entry_shares_a_function():
    """Stacked @register decorators silently bind two catalog names to ONE
    function (this exact bug shipped `sink_compact_small_files` pointing at
    the JSONL face mid-round-5 until the parity suite caught it). Every
    catalog entry must own a distinct callable."""
    from collections import Counter

    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all

    load_all()
    owners = Counter(id(q.spark_fn) for q in CATALOG.values())
    dupes = [
        [n for n, q in CATALOG.items() if id(q.spark_fn) == fid]
        for fid, c in owners.items()
        if c > 1
    ]
    assert not dupes, f"catalog names sharing one function: {dupes}"


def test_changed_face_reenters_unverified_front(tmp_path, monkeypatch):
    """Round-6 fix: a face whose (oracle + source) hash changed AFTER its
    last green verdict must be treated as unverified — the standing green
    verified DIFFERENT code. FACEHASH.json records the round each face's
    current hash first appeared; a verdict older than that is stale."""
    changed, untouched = sorted(CATALOG)[:2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({changed: OK, untouched: OK})
    )
    (tmp_path / "FACEHASH.json").write_text(
        json.dumps(
            {
                changed: {"hash": "x", "since_round": 2},
                untouched: {"hash": "y", "since_round": 0},
            }
        )
    )
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order.index(changed) < order.index(untouched)
    assert order.index(untouched) == len(order) - 1  # sole fresh green → tail
    # a later re-verification at/after the hash round makes it fresh again
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({changed: OK}))
    order = entry._sweep_order()
    assert order.index(changed) >= len(order) - 2  # back in the tail


def test_missing_manifest_preserves_old_behavior(tmp_path, monkeypatch):
    """No FACEHASH.json → every verdict counts (the pre-round-6 rule)."""
    green = sorted(CATALOG)[0]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({green: OK}))
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order.index(green) == len(order) - 1


def test_real_manifest_stale_greens_front_the_sweep():
    """Against the REAL repo files: every face whose current hash
    postdates its latest verdict must precede every fresh-green face."""
    since = entry._face_since_round()
    if not since:
        return  # no manifest in this checkout
    status = entry._visit_status()
    order = entry._sweep_order()
    fresh = {n for n, (ok, _) in status.items() if ok}
    if not fresh or fresh == set(CATALOG):
        return
    first_fresh = min(i for i, n in enumerate(order) if n in fresh)
    for name in CATALOG:
        rnd = status.get(name, (False, -1))[1] if name in status else -1
        if name in status and since.get(name, 0) > rnd:
            assert order.index(name) < first_fresh, (
                f"{name} changed in round {since[name]} after its round-"
                f"{rnd} verdict but is not in the unverified front"
            )


def test_facehash_manifest_is_in_sync_with_face_sources():
    """Forgetting `python tools/gen_facehash.py` after editing a face
    would silently revert that face to the pre-round-6 stale-green
    behavior — this makes the drift a test failure instead. (--bump
    entries are fine: bumping rewrites the hash too.)"""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(entry.__file__).parent / "tools"))
    from gen_facehash import MANIFEST, face_hash

    assert MANIFEST.exists(), "FACEHASH.json missing — run tools/gen_facehash.py"
    manifest = json.loads(MANIFEST.read_text())
    assert set(manifest) == set(CATALOG), (
        "FACEHASH.json face set drifted from the catalog — run tools/gen_facehash.py"
    )
    stale = [
        name
        for name, ent in CATALOG.items()
        if manifest[name].get("hash") != face_hash(ent)
    ]
    assert not stale, (
        f"faces edited without regenerating FACEHASH.json: {stale} — "
        "run tools/gen_facehash.py (add --bump for operator-level changes)"
    )
