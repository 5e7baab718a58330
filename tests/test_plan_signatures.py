"""Plan-shape ratchet (SURVEY.md §5.3-5, added r4): regenerate the
plan-feature signature of every registered query and diff against the
committed PLAN_SIGNATURES.json snapshot.

What this catches that test_plan_audit.py cannot: cost regressions
with no audit smell — an extra shuffle, a broadcast join degrading to
sort-merge, a second cache layer (the round-3 ``dq_ks_drift``
regression: +30% wall from a redundant ``.cache()``, zero audit-cap
violations). A DELIBERATE plan change must regenerate the snapshot in
the same commit (``python tools/plan_signatures.py``) so the JSON diff
documents the plan delta for review.

Runs the generator in a SUBPROCESS: signatures are only deterministic
on a fresh session in sorted order (operators that execute jobs at
frame-build time materialize shared caches, and a materialized
InMemoryRelation prints AQE sections a lazy one doesn't) — the pytest
session's cache state depends on which tests ran first.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(REPO, "PLAN_SIGNATURES.json")


def test_plan_signatures_match_snapshot():
    with open(SNAPSHOT) as fh:
        committed = json.load(fh)
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "sigs.json")
        # repo root on PYTHONPATH for the Python UDF workers the
        # frame-building operators spawn (sys.path edits don't reach them)
        env = dict(
            os.environ,
            PLAN_SIGNATURES_OUT=out,
            PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "plan_signatures.py"),
             committed["sf_dir"]],
            check=True,
            env=env,
            cwd=tmp,  # keep any stray artifacts out of the repo
            capture_output=True,
            timeout=900,
        )
        with open(out) as fh:
            fresh = json.load(fh)
    want, got = committed["signatures"], fresh["signatures"]
    assert set(want) == set(got), (
        f"registry drift: +{sorted(set(got) - set(want))} "
        f"-{sorted(set(want) - set(got))} — regenerate the snapshot"
    )
    drift = {
        name: {"committed": want[name], "fresh": got[name]}
        for name in sorted(want)
        if want[name] != got[name]
    }
    assert not drift, (
        "plan shape changed for "
        + ", ".join(drift)
        + " — if deliberate, regenerate PLAN_SIGNATURES.json in this "
        "commit so the diff documents the plan delta:\n"
        + json.dumps(drift, indent=1)
    )
