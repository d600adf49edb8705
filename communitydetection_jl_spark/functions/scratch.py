"""Session-scoped scratch directories with atexit cleanup.

Several operators materialize intermediate state to parquet for
durability (dense id dictionaries, rank permutations, iterative state
snapshots kept alive past their loop). Those files must outlive the
DataFrames that read them, so they can't be deleted eagerly — this
registry removes them when the Python process exits instead of leaking
them for the life of the machine (or of /dev/shm)."""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under SPARK_GRAFT_STATE_DIR (or the
    system tempdir), purged at interpreter exit."""
    base = os.environ.get("SPARK_GRAFT_STATE_DIR") or tempfile.gettempdir()
    d = tempfile.mkdtemp(prefix=prefix, dir=base)
    _DIRS.append(d)
    return d


def register(path: str) -> None:
    """Adopt an existing path into the exit-time purge list."""
    _DIRS.append(path)


@atexit.register
def _purge() -> None:
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
