"""C5 schedule/retry semantics, EXERCISED: the minirunner implements
the exact policy orchestration/daily_dag.py declares (same imported
constants) and these tests run that policy — including against the
real daily-load job — closing the gap between "DAG file exists" and
"schedule/retry behavior verified" in a sandbox without Airflow."""

from __future__ import annotations

from datetime import datetime
from zoneinfo import ZoneInfo

from airflow_scraping_etl_tutorial_spark.jobs import daily_load
from airflow_scraping_etl_tutorial_spark.orchestration import minirunner as mr
from airflow_scraping_etl_tutorial_spark.orchestration.daily_dag import (
    RETRIES,
    RETRY_DELAY_SECONDS,
    SKIP_ON_EXIT_CODE,
)

TPE = ZoneInfo("Asia/Taipei")


def test_daily_intervals_fire_after_completion():
    """@daily anchored at start 2022-08-01 18:00 Taipei: the first run
    fires at 08-02 18:00 for interval [08-01 18:00, 08-02 18:00), and
    an interval still in progress is NOT due."""
    now = datetime(2022, 8, 4, 12, 0, tzinfo=TPE)
    dates = [mr.render_date(e) for e in mr.due_intervals(now)]
    assert dates == ["20220802", "20220803"]
    # exactly at the boundary the interval is complete -> due
    now_b = datetime(2022, 8, 4, 18, 0, tzinfo=TPE)
    assert [mr.render_date(e) for e in mr.due_intervals(now_b)][-1] == "20220804"


def test_render_date_is_taipei_local():
    """The reference's timezone lesson (dags/time_zone.py): the date
    template renders in Asia/Taipei even when the interval end is
    expressed in UTC (18:00 Taipei == 10:00 UTC same day)."""
    from datetime import timezone

    e_utc = datetime(2022, 8, 2, 10, 0, tzinfo=timezone.utc)
    assert mr.render_date(e_utc) == "20220802"


def test_retry_then_success_sleeps_per_policy():
    calls, naps = [], []

    def flaky(date):
        calls.append(date)
        return 1 if len(calls) < 3 else 0

    res = mr.run_once(
        flaky,
        datetime(2022, 8, 2, 18, 0, tzinfo=TPE),
        sleep=naps.append,
    )
    assert res.state == mr.SUCCESS
    assert res.attempts == 3
    assert res.exit_codes == [1, 1, 0]
    assert naps == [RETRY_DELAY_SECONDS] * 2
    assert calls == ["20220802"] * 3


def test_alert_exit_skips_without_retry():
    """Exit 3 (validation alert) must NOT retry: a retried alert would
    re-fire the notification per attempt (daily_dag.py's
    skip_on_exit_code rationale)."""
    naps = []
    res = mr.run_once(
        lambda d: SKIP_ON_EXIT_CODE,
        datetime(2022, 8, 2, 18, 0, tzinfo=TPE),
        sleep=naps.append,
    )
    assert res.state == mr.SKIPPED
    assert res.attempts == 1
    assert naps == []


def test_hard_failure_exhausts_retries():
    naps = []
    res = mr.run_once(
        lambda d: 17,
        datetime(2022, 8, 2, 18, 0, tzinfo=TPE),
        sleep=naps.append,
    )
    assert res.state == mr.FAILED
    assert res.attempts == RETRIES + 1
    assert len(naps) == RETRIES


def test_catchup_runs_each_missed_day_independently():
    seen = []

    def job(date):
        seen.append(date)
        return 1 if date == "20220803" else 0  # one day hard-fails

    now = datetime(2022, 8, 5, 12, 0, tzinfo=TPE)
    out = mr.catchup(job, now, sleep=lambda s: None)
    assert list(out) == ["20220802", "20220803", "20220804"]
    assert out["20220802"].state == mr.SUCCESS
    assert out["20220803"].state == mr.FAILED  # retried, then failed
    assert out["20220804"].state == mr.SUCCESS  # later days unblocked
    assert seen.count("20220803") == RETRIES + 1


def test_scheduled_run_executes_real_job(tmp_path):
    """End-to-end under the scheduler policy: the REAL daily-load job
    (golden payload source) succeeds on a trading day and routes the
    closed-calendar alert day to SKIPPED with exactly one attempt."""

    def job(date):
        return daily_load.main(
            ["--date", date, "--sink", str(tmp_path / "sink"), "--source", "golden"]
        )

    ok = mr.run_once(
        job, datetime(2022, 8, 19, 18, 0, tzinfo=TPE), sleep=lambda s: None
    )
    assert ok.state == mr.SUCCESS and ok.attempts == 1

    alert = mr.run_once(
        job, datetime(2010, 1, 6, 18, 0, tzinfo=TPE), sleep=lambda s: None
    )
    assert alert.state == mr.SKIPPED and alert.attempts == 1
