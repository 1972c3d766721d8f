"""scratch_root() resolution order (session.py): explicit
SPARK_GRAFT_SCRATCH wins; an operator-set TMPDIR defers to tempfile
(returns None); otherwise /dev/shm when usable; else None. Pure-python
— no Spark session needed."""

import os

from yelp_etl_spark.session import scratch_root


def _clear(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    monkeypatch.delenv("TMPDIR", raising=False)


def test_explicit_override_wins(monkeypatch, tmp_path):
    _clear(monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(tmp_path))
    # beats even TMPDIR
    monkeypatch.setenv("TMPDIR", "/somewhere/else")
    assert scratch_root() == str(tmp_path)


def test_tmpdir_defers_to_tempfile(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("TMPDIR", "/operator/choice")
    assert scratch_root() is None


def test_dev_shm_when_present(monkeypatch):
    _clear(monkeypatch)
    usable = os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
    assert scratch_root() == ("/dev/shm" if usable else None)
