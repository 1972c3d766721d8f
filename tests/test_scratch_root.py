"""Capacity guard for the RAM-backed scratch root (r15 VERDICT
what's-wrong #1): /dev/shm is only auto-selected while it has a
comfortable free-space floor; a nearly-full tmpfs falls back to the
tempfile default instead of failing a shuffle-heavy run or pushing the
OS into reclaim. An explicit SPARK_GRAFT_SCRATCH always wins."""

import os

from yelp_etl_spark import session
from yelp_etl_spark.session import SCRATCH_MIN_FREE_BYTES, scratch_root


class _FakeStat:
    def __init__(self, free_bytes):
        self.f_bavail = free_bytes // 4096
        self.f_frsize = 4096


def _clear_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    monkeypatch.delenv("TMPDIR", raising=False)


def test_ram_root_selected_with_free_space(monkeypatch):
    _clear_env(monkeypatch)
    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        import pytest

        pytest.skip("no writable /dev/shm on this host")
    monkeypatch.setattr(
        session.os, "statvfs", lambda p: _FakeStat(SCRATCH_MIN_FREE_BYTES * 2)
    )
    assert scratch_root() == "/dev/shm"


def test_full_tmpfs_falls_back_to_tempfile_default(monkeypatch):
    _clear_env(monkeypatch)
    monkeypatch.setattr(
        session.os, "statvfs", lambda p: _FakeStat(SCRATCH_MIN_FREE_BYTES // 2)
    )
    assert scratch_root() is None


def test_statvfs_failure_falls_back(monkeypatch):
    _clear_env(monkeypatch)

    def _boom(p):
        raise OSError("statvfs failed")

    monkeypatch.setattr(session.os, "statvfs", _boom)
    assert scratch_root() is None


def test_explicit_scratch_env_bypasses_guard(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", "/tmp/myscratch")
    monkeypatch.setattr(
        session.os, "statvfs", lambda p: _FakeStat(0)
    )
    assert scratch_root() == "/tmp/myscratch"


def test_tmpdir_defers_to_operator(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    monkeypatch.setenv("TMPDIR", "/tmp")
    assert scratch_root() is None
