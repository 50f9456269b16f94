"""Single-writer guard on jobs/dedup_job.py's state dir (VERDICT r04 item
2b): the O_CREAT|O_EXCL lockfile must reject a second concurrent ingest
fast (naming the holder), release on every exit path, and be reclaimable
with the operator's explicit --steal-lock."""

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "dedup_job", os.path.join(os.path.dirname(__file__), "..", "jobs", "dedup_job.py")
)
dedup_job = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and dedup_job)


def test_lock_excludes_second_writer_and_names_holder(tmp_path):
    state = str(tmp_path / "state")
    with dedup_job._IngestLock(state, "shard-a"):
        assert os.path.exists(os.path.join(state, ".ingest.lock"))
        with pytest.raises(SystemExit) as exc:
            dedup_job._IngestLock(state, "shard-b").__enter__()
        assert "shard_id=shard-a" in str(exc.value)
    # released on clean exit → a new ingest proceeds
    with dedup_job._IngestLock(state, "shard-b"):
        pass


def test_lock_released_on_exception(tmp_path):
    state = str(tmp_path / "state")
    with pytest.raises(RuntimeError):
        with dedup_job._IngestLock(state, "shard-a"):
            raise RuntimeError("ingest crashed mid-flight")
    assert not os.path.exists(os.path.join(state, ".ingest.lock"))


def test_steal_lock_reclaims_stale_holder(tmp_path):
    state = str(tmp_path / "state")
    os.makedirs(state)
    with open(os.path.join(state, ".ingest.lock"), "w") as fh:
        fh.write("shard_id=dead pid=0")
    with pytest.raises(SystemExit):
        dedup_job._IngestLock(state, "shard-b").__enter__()
    with dedup_job._IngestLock(state, "shard-b", steal=True):
        assert "shard_id=shard-b" in open(os.path.join(state, ".ingest.lock")).read()
