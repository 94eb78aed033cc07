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
- ``atexit`` cleanup removes the symlink and every stamped build dir
  THIS lifecycle owns. The cleanup is per-tenant, not reference-counted:
  a process exiting while another still reads the shared /tmp artifact
  deletes it out from under the reader (the reader's next ensure call
  rebuilds). That is acceptable for the audit-artifact use — the driver
  and the test suite are single-tenant — and is the same contract the
  IVF audit index has carried since round 5; do NOT reuse this helper
  for artifacts with long-lived cross-process readers.

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


def _cleanup(fixed_path: str) -> None:
    try:
        os.remove(fixed_path)  # the symlink
    except OSError:
        shutil.rmtree(fixed_path, ignore_errors=True)
    for d in glob.glob(fixed_path + "-*"):
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
