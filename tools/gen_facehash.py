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
    python tools/gen_facehash.py [--bump name ...]
Unchanged faces keep their recorded since_round; changed/new faces get
the CURRENT round (max CORRECTNESS_r* + 1 — i.e. the round whose
verdict file does not exist yet). ``--bump`` force-stamps the named
faces with the current round even when their own hash is unchanged —
use it when an OPERATOR a face calls changed (the hash does not cover
operator modules, so e.g. the round-6 positional-filter edit to
ngram_jaccard_candidates needed `--bump dedup_ngram_jaccard
dedup_minhash_eval` to drive re-verification of the faces riding it).

Safety: if the manifest is missing or empty, faces are recorded with
since_round 0 (treat as never-changed) rather than the current round —
invalidating all ~196 standing verdicts at once would burn ~4 full
50-slot sweeps re-verifying the whole catalog. The accurate bootstrap
is a git-worktree diff against the last round boundary (how round 6
seeded it); after a lost manifest, prefer re-seeding that way or
--bump'ing the faces known to have changed.
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
    bump: set[str] = set()
    if "--bump" in sys.argv:
        bump = set(sys.argv[sys.argv.index("--bump") + 1 :])
        unknown = bump - set(CATALOG)
        if unknown:
            raise SystemExit(f"--bump: unknown faces {sorted(unknown)}")
    old: dict[str, dict] = {}
    if MANIFEST.exists():
        try:
            loaded = json.loads(MANIFEST.read_text())
            if isinstance(loaded, dict):
                old = {
                    k: v for k, v in loaded.items() if isinstance(v, dict)
                }
        except ValueError:
            pass
    bootstrap = not old  # lost/empty manifest → conservative since_round 0
    rnd = current_round()
    out: dict[str, dict] = {}
    changed = new = kept = bumped = 0
    for name, entry in CATALOG.items():
        h = face_hash(entry)
        prev = old.get(name)
        if name in bump:
            out[name] = {"hash": h, "since_round": rnd}
            bumped += 1
        elif prev and prev.get("hash") == h:
            out[name] = prev
            kept += 1
        elif prev:
            out[name] = {"hash": h, "since_round": rnd}
            changed += 1
        else:
            out[name] = {"hash": h, "since_round": 0 if bootstrap else rnd}
            new += 1
    MANIFEST.write_text(json.dumps(out, indent=0, sort_keys=True) + "\n")
    note = " (BOOTSTRAP: new faces at since_round 0 — see docstring)" if bootstrap else ""
    print(
        f"FACEHASH.json: {len(out)} faces — {kept} unchanged, "
        f"{changed} changed, {new} new, {bumped} bumped "
        f"(since_round={rnd} for changed/bumped){note}"
    )


if __name__ == "__main__":
    main()
