"""Process-lifetime scratch directories with atexit cleanup.

Fixture builders (collection warehouses, packed indexes, streaming
stages, JSONL shards, BM25 text indexes) need directories that live
for the whole process — they are cached in module globals and served
from repeatedly — but must not accumulate across bench / driver-sim /
pytest runs. ``scratch_dir`` is ``tempfile.mkdtemp`` plus a single
atexit hook that removes every directory handed out, so /tmp returns
to its prior state when the process exits (ADVICE r3: _text_index
leaked one index dir per run; same pattern existed in every fixture).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp whose directory is removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:
    # best-effort: the JVM is gone or going at this point; a race
    # with a straggling executor write is harmless (ignore_errors)
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _DIRS.clear()
