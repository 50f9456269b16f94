"""applyInPandasWithState sessionization: state must carry across
microbatches, sessions close on gap, and the event-time timeout closes the
tail session once the watermark passes."""

import shutil
import uuid

import pytest

TMP = "/root/repo/.tmp"

_SCHEMA = "user_id long, ts timestamp"


def _write(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stateful_sessionize_across_microbatches(spark):
    from datetime import datetime

    from document_parser_spark.streaming.stateful import sessionize_stream

    workdir = f"{TMP}/state-{uuid.uuid4().hex[:8]}"
    name = f"sess_{uuid.uuid4().hex[:6]}"
    t = lambda s: datetime.fromtimestamp(1_700_000_000 + s)
    try:
        # batch 1: two events 100 s apart (one open session for user 1)
        _write(spark, f"{workdir}/in", [(1, t(0)), (1, t(100))])

        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{workdir}/in")
        )
        q = (
            sessionize_stream(stream, gap_sec=600, watermark="0 seconds")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        q.processAllAvailable()
        assert spark.table(name).count() == 0  # session still open

        # batch 2: event 10,000 s later → closes session 1 (2 events) and,
        # by advancing the watermark past last+gap, times out nothing yet
        # for the new session
        _write(spark, f"{workdir}/in", [(1, t(10_000))])
        q.processAllAvailable()
        closed = spark.table(name).collect()
        assert len(closed) == 1
        s = closed[0]
        assert s["user_id"] == 1 and s["n_events"] == 2
        assert (s["session_end"] - s["session_start"]).total_seconds() == 100

        # batch 3: a far-future event for ANOTHER user advances the
        # watermark, so user 1's tail session closes via event-time timeout
        _write(spark, f"{workdir}/in", [(2, t(100_000))])
        q.processAllAvailable()
        rows = {(r["user_id"], r["n_events"]) for r in spark.table(name).collect()}
        assert (1, 1) in rows  # the t(10_000) singleton, closed by timeout
        q.stop()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
