"""Round-13 (r12 verdict #9): the shared-/tmp audit-artifact reader
refcount — a BUILDER exiting while a foreign process still reads its
build must leave the build in place; once the reader releases, the
builder's cleanup (re-run) reaps it."""

from __future__ import annotations

import os
import subprocess
import sys
import time

from debezium_incubator_spark.llm import _audit


def _build_artifact(tmp_path):
    src = str(tmp_path / "src.txt")
    with open(src, "w") as f:
        f.write("payload")
    fixed = str(tmp_path / "artifact")

    def build(d):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "data"), "w") as f:
            f.write("built")

    got = _audit.ensure_artifact(src, fixed, build)
    assert os.path.isdir(os.path.realpath(got))
    return fixed, os.path.realpath(got)


def test_builder_cleanup_spares_build_under_foreign_reader(tmp_path):
    fixed, build_dir = _build_artifact(tmp_path)
    assert build_dir in _audit._BUILT
    # a FOREIGN process holds the shared reader lock on the build
    reader = subprocess.Popen(
        [
            sys.executable, "-c",
            "import fcntl, sys, time\n"
            "f = open(sys.argv[1])\n"
            "fcntl.flock(f, fcntl.LOCK_SH)\n"
            "print('locked', flush=True)\n"
            "time.sleep(60)\n",
            build_dir + ".lock",
        ],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert reader.stdout.readline().strip() == "locked"
        _audit._cleanup(fixed)  # the builder "exits"
        assert os.path.isdir(build_dir), (
            "builder cleanup reaped a build a live foreign reader holds"
        )
    finally:
        reader.terminate()
        reader.wait()
    # reader gone → the (re-run) cleanup reaps the build and the link
    deadline = time.time() + 10
    while time.time() < deadline and os.path.isdir(build_dir):
        _audit._cleanup(fixed)
        if os.path.isdir(build_dir):
            time.sleep(0.2)
    assert not os.path.isdir(build_dir)
    assert not os.path.islink(fixed)


def test_reused_artifact_never_reaped_and_own_lock_released(tmp_path):
    """A process that merely REUSES a valid build (didn't create it)
    must not delete it at exit (the round-12 rule), and this process's
    own reader lock must not block ITS OWN later cleanup of builds it
    DID create."""
    fixed, build_dir = _build_artifact(tmp_path)
    # simulate "another process built it": forget our builder status
    _audit._BUILT.discard(build_dir)
    _audit._cleanup(fixed)
    assert os.path.isdir(build_dir), "reused build was reaped"
    # restore builder status: cleanup with no readers reaps fine even
    # though this process held the shared reader lock itself
    _audit._BUILT.add(build_dir)
    _audit._cleanup(fixed)
    assert not os.path.isdir(build_dir)
