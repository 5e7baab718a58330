"""Process-scoped temp-dir hygiene for generated fixture assets.

Operators that round-trip through a non-parquet format (CSV / JSON /
ORC / text sinks) or generate a deterministic media corpus (BMP / WAV /
blob files) write a driver-local temp directory and read it back via a
file source — a single-node convenience each operator documents
(executors read the driver-local path, correct only on local[N]).
Two hygiene rules live here so the ~360-query sweep and repeated bench
runs don't leak directories (ADVICE r5):

* every mkdtemp is registered for atexit removal;
* input-independent deterministic asset corpora (the multimodal
  writers) are additionally memoized per process — written once,
  reused by every subsequent build in the same interpreter.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from typing import Callable

_CREATED: list[str] = []
_MEMO: dict[tuple, str] = {}

# Exact output directory of the most recent write per operator id, so
# tests can inspect the files an operator ACTUALLY produced instead of
# globbing the global tempdir by prefix+mtime (which races against
# concurrent/stale runs — ADVICE r6).
LAST_PATHS: dict[str, str] = {}


def tracked_mkdtemp(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _CREATED.append(d)
    return d


def memoized_asset_dir(key: tuple, build: Callable[[], str]) -> str:
    """Return the cached directory for ``key``, building once per
    process. Only safe for builders whose output is a pure function of
    ``key`` (the deterministic multimodal corpora)."""
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]


@atexit.register
def _cleanup() -> None:
    for d in _CREATED:
        shutil.rmtree(d, ignore_errors=True)
    _CREATED.clear()
    _MEMO.clear()
