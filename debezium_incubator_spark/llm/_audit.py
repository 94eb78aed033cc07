"""Fixed-path audit artifacts for differential oracles.

Several ANN queries are oracled by having DuckDB ``read_parquet`` the
PERSISTED index the Spark query used — which requires a path that is
static at oracle-registration time. This helper owns the lifecycle that
makes a fixed /tmp path safe to share across processes and rebuilds:

- the fixed path is a SYMLINK to a stamp-named build directory
  (stamp = source file path + mtime + size), swapped by atomic
  ``os.replace`` so concurrent readers mid-query on the old target stay
  consistent;
- a ``_source`` marker written AFTER the build makes a crash mid-build
  leave a missing marker, never a lying one;
- an exclusive ``fcntl`` lock serializes builders of the same stamp —
  two processes racing a missing marker would otherwise interleave
  overwrite writes into ONE build dir and leave a corrupt index under
  a valid marker;
- ``atexit`` cleanup removes only the build dirs THIS PROCESS created
  (plus the symlink when it points at one of them). Not
  reference-counted: a BUILDER exiting while another process still
  reads its artifact deletes it out from under the reader (the
  reader's next ensure call rebuilds) — but since round 12 an exiting
  process that merely REUSED a valid artifact no longer deletes it
  (an exiting probe JVM's blanket cleanup destroyed a build the test
  suite was mid-write on). Still do NOT reuse this helper for
  artifacts with long-lived cross-process readers.

The IVF index in ``similarity.py`` predates this module and carries its
own (behavior-identical, test-pinned) copy; new audit artifacts should
use this one.
"""

from __future__ import annotations

import atexit
import glob
import hashlib
import os
import shutil
from typing import Callable

_REGISTERED: set[str] = set()
#: build dirs THIS process created — cleanup reaps only these, so a
#: process that merely REUSED a valid artifact can't delete it out
#: from under the builder (round 12: a probe JVM's exit nuked a build
#: the test suite was mid-write on; the per-tenant contract stands,
#: but exiting readers no longer take builders down with them).
_BUILT: set[str] = set()


def _cleanup(fixed_path: str) -> None:
    mine = [d for d in glob.glob(fixed_path + "-*") if d in _BUILT]
    try:
        if os.path.islink(fixed_path):
            if os.path.realpath(fixed_path) in (
                os.path.realpath(d) for d in mine
            ):
                os.remove(fixed_path)
        else:
            shutil.rmtree(fixed_path, ignore_errors=True)  # legacy dir
    except OSError:
        pass
    for d in mine:
        shutil.rmtree(d, ignore_errors=True)


def ensure_artifact(
    src_file: str,
    fixed_path: str,
    build: Callable[[str], None],
) -> str:
    """Build (or reuse) an artifact derived from ``src_file`` under a
    stamp-named directory and atomically point ``fixed_path`` at it.
    ``build(dir)`` is invoked only when no valid build for the current
    source stamp exists. Returns ``fixed_path``."""
    if fixed_path not in _REGISTERED:
        _REGISTERED.add(fixed_path)
        atexit.register(_cleanup, fixed_path)
    import fcntl

    st = os.stat(src_file)
    stamp = f"{src_file}\n{st.st_mtime_ns}:{st.st_size}"
    build_dir = (
        fixed_path + "-" + hashlib.md5(stamp.encode()).hexdigest()[:10]
    )
    marker = os.path.join(build_dir, "_source")

    def _valid() -> bool:
        try:
            with open(marker) as fh:
                return fh.read() == stamp
        except OSError:
            return False

    if not _valid():
        lock_path = build_dir + ".lock"
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                if not _valid():  # the race loser finds the winner's build
                    build(build_dir)
                    with open(marker, "w") as fh:
                        fh.write(stamp)
                    _BUILT.add(build_dir)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
    if os.path.realpath(fixed_path) != os.path.realpath(build_dir):
        if os.path.isdir(fixed_path) and not os.path.islink(fixed_path):
            shutil.rmtree(fixed_path, ignore_errors=True)
        tmp_link = f"{build_dir}.lnk"
        try:
            os.remove(tmp_link)
        except OSError:
            pass
        os.symlink(build_dir, tmp_link)
        os.replace(tmp_link, fixed_path)
    return fixed_path
