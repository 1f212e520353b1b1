"""Regenerate FACEHASH.json — the per-face change manifest the sweep
order uses to re-verify CHANGED faces.

Problem this closes (round 6): a face edited AFTER its last green driver
verdict keeps that stale green and sorts into the sweep's regression-
canary tail — a changed implementation could go many rounds without the
driver ever re-hashing it (concrete instance: text_repetition_signals,
green in r4, schema extended in r6, sweep position ~112 of 196 with a
50-slot sweep). The manifest records, per face, an md5 of (oracle SQL +
the face function's source) and the round that hash FIRST appeared;
``__spark_entry__._visit_status`` then treats a verdict as usable only
if its round is >= the hash's round — a changed face re-enters the
unverified front automatically.

Scope note: the hash covers the FACE (registration SQL + plan function
source), not the operator modules it calls — operator-level edits are
instead covered by the pytest suite and the strict local sweep
(tools/driver_sweep.py), which this manifest complements rather than
replaces.

Run at the end of any session that edits faces:
    python tools/gen_facehash.py
Unchanged faces keep their recorded since_round; changed/new faces get
the CURRENT round (max CORRECTNESS_r* + 1 — i.e. the round whose
verdict file does not exist yet).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import re
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all  # noqa: E402

MANIFEST = HERE / "FACEHASH.json"


def face_hash(entry) -> str:
    src = inspect.getsource(entry.spark_fn)
    return hashlib.md5(((entry.oracle or "") + "\n" + src).encode()).hexdigest()


def current_round() -> int:
    rounds = [0]
    for f in HERE.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)\.json$", f.name)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def main() -> None:
    load_all()
    old: dict[str, dict] = {}
    if MANIFEST.exists():
        old = json.loads(MANIFEST.read_text())
    rnd = current_round()
    out: dict[str, dict] = {}
    changed = new = kept = 0
    for name, entry in CATALOG.items():
        h = face_hash(entry)
        prev = old.get(name)
        if prev and prev["hash"] == h:
            out[name] = prev
            kept += 1
        elif prev:
            out[name] = {"hash": h, "since_round": rnd}
            changed += 1
        else:
            out[name] = {"hash": h, "since_round": rnd}
            new += 1
    MANIFEST.write_text(json.dumps(out, indent=0, sort_keys=True) + "\n")
    print(
        f"FACEHASH.json: {len(out)} faces — {kept} unchanged, "
        f"{changed} changed, {new} new (since_round={rnd} for changed/new)"
    )


if __name__ == "__main__":
    main()
