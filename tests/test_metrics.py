"""Structured metric stream (SURVEY §5 metrics/logging).

The reference's observability is stderr prints + a shutdown timing dump
(`src/Tracking.cc:194-251`); production deployment needs a machine-readable
stream — JSONL records of stage deltas, saturation counters, and map gauges.
"""

import json

from orb_slam3_noted_tpu.utils.timing import (
    SATURATION,
    MetricsStream,
    StageTimer,
)


def test_metrics_stream_deltas(tmp_path):
    timer = StageTimer()
    old = StageTimer.enabled
    StageTimer.enabled = True
    try:
        path = str(tmp_path / "metrics.jsonl")
        ms = MetricsStream(path, timer=timer)

        with timer.stage("track_batch"):
            pass
        with timer.stage("track_batch"):
            pass
        ms.emit("dispatch", frame=0, n_kf=2)

        with timer.stage("loop_drain"):
            pass
        SATURATION["test_cap"] += 7
        ms.emit("dispatch", frame=16, n_kf=3)
        ms.close()

        recs = [json.loads(x) for x in open(path)]
        assert [r["seq"] for r in recs] == [0, 1]
        # first record: both track_batch spans, no loop_drain
        assert recs[0]["stages"]["track_batch"]["n"] == 2
        assert "loop_drain" not in recs[0]["stages"]
        # second record: only the DELTA since the first emit
        assert "track_batch" not in recs[1]["stages"]
        assert recs[1]["stages"]["loop_drain"]["n"] == 1
        assert recs[1]["saturation"]["test_cap"] == 7
        assert recs[1]["n_kf"] == 3
    finally:
        StageTimer.enabled = old
        SATURATION.pop("test_cap", None)


def test_metrics_gauges_for():
    class FakeSlam:
        n_kf, n_mp, state, frames_total, imu_stage = 5, 100, "OK", 42, 2

    ms = MetricsStream("/dev/null")
    g = ms.gauges_for(FakeSlam())
    ms.close()
    assert g == {"n_kf": 5, "n_mp": 100, "state": "OK",
                 "frames_total": 42, "imu_stage": 2}
