"""The TWSE feed as a FIRST-CLASS Spark data source (Python Data
Source API, Spark 4.0 / SPARK-44076).

The reference scrapes inside an Airflow PythonOperator (Final_app.py's
crawl task); sources/twse.py already re-homes that as driver fetch +
mapInPandas fan-out. This module is the third and most Spark-native
form: ``spark.read.format("twse").option("dates", ...)`` — the feed
becomes a planned SCAN, one input partition per trading day, so
Catalyst sees it like any other source (the date list is the
partitioning, 5k backfill days = 5k partitions scheduled like scan
tasks; column pruning/limits compose above it).

Two transports, selected by ``option("source", ...)``:
- ``golden`` (default): replays the committed golden payloads by date
  — the fully-offline test seam, same doctrine as jobs/daily_load.
- ``http``: the real endpoint (reference URL shape), executor-side,
  one request per partition; unreachable/malformed days yield a
  stat=NULL row so the P7 schema gate routes them to the alert path
  instead of failing the scan (same contract as
  twse.fetch_payloads_distributed).

Output schema == sources/twse.py::PAYLOAD_SCHEMA, so the existing
pipeline composes directly: ``clean_long(spark.read.format("twse")...
.load())`` is the reference's crawl->clean hop with zero glue.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# DDL mirror of twse.PAYLOAD_SCHEMA (the DataSource API takes a schema
# string; keep in lockstep — test_twse_datasource asserts equality).
PAYLOAD_DDL = (
    "stat string, title string, fields array<string>, date string, "
    "data array<array<string>>, params map<string,string>, "
    "notes array<string>"
)


class _DatePartition(InputPartition):
    def __init__(self, date: str):
        self.date = date


def _payload_row(p: dict) -> tuple:
    """The ONE payload-dict -> PAYLOAD_DDL-row mapping, shared by the
    batch and streaming readers so the tuple cannot drift from the
    schema in one of them."""
    return (
        p.get("stat"),
        p.get("title"),
        p.get("fields"),
        p.get("date"),
        p.get("data"),
        p.get("params"),
        p.get("notes"),
    )


class TwseDataSource(DataSource):
    """format name: ``twse``. Options: ``dates`` (comma-separated
    yyyyMMdd, required), ``source`` (``golden``|``http``),
    ``batch_days`` (streaming only: max dates consumed per
    micro-batch; default ALL available — the file-source convention,
    so trigger(availableNow) drains in one batch; set 1 for the
    strict daily cadence)."""

    @classmethod
    def name(cls) -> str:
        return "twse"

    def schema(self) -> str:
        return PAYLOAD_DDL

    def reader(self, schema) -> "TwseReader":
        return TwseReader(self.options)

    def simpleStreamReader(self, schema) -> "TwseStreamReader":
        return TwseStreamReader(self.options)


class TwseReader(DataSourceReader):
    def __init__(self, options):
        dates = options.get("dates", "")
        if not dates:
            raise ValueError("twse source requires option('dates', 'd1,d2,...')")
        self._dates = [d.strip() for d in dates.split(",") if d.strip()]
        self._source = options.get("source", "golden")

    def partitions(self):
        # one partition per trading day: a 20-year backfill becomes
        # ~5k independent scan tasks, scheduled/retried like any scan
        return [_DatePartition(d) for d in self._dates]

    def read(self, partition: _DatePartition):
        yield _payload_row(_payload_for(partition.date, self._source))


class TwseStreamReader(SimpleDataSourceStreamReader):
    """STREAMING form of the feed (SimpleDataSourceStreamReader): the
    reference's once-a-day cadence as a Structured Streaming source.
    The offset is CONTENT-based AND POSITION-VALIDATED —
    ``{"last_date": d, "n_consumed": k}``, the last consumed trading
    day plus how many days were consumed to reach it (``None``/0
    before the first batch) — so progress is exactly-once and
    replayable ACROSS restarts exactly when the consumed PREFIX of the
    ``dates`` option is unchanged (appending future days is the normal
    calendar evolution and always compatible). Every other mutation
    fails LOUDLY instead of silently skipping or re-reading days: a
    list missing the committed date (removal/rename), a date
    backfilled/inserted/reordered BEFORE the committed one (the
    committed date's position no longer equals ``n_consumed`` — the
    round-11 review finding: a bare ``last_date`` cursor silently
    skipped a backfilled day and replayed a DIFFERENT row set for a
    committed range), and the pre-round-11 positional ``next_idx``
    form (unvalidatable against a reordered list). ``read`` advances
    by ``batch_days`` dates (default: all available, so availableNow
    drains in one batch; set 1 for the strict
    one-day-per-micro-batch cadence) and ``readBetweenOffsets``
    re-yields any committed range deterministically after a restart —
    both ends position-validated first, so an insertion inside the
    range refuses rather than replaying rows that were never in the
    committed batch.
    In production the date list is the trading calendar up to today;
    offline it is the test's golden dates — same doctrine as the batch
    reader.

    The simple (driver-side) reader variant is the honest choice for a
    1-document-per-day feed: per-batch volume is tiny, so the
    partition-planning machinery of the full DataSourceStreamReader
    would buy nothing.
    """

    def __init__(self, options):
        dates = options.get("dates", "")
        if not dates:
            raise ValueError("twse source requires option('dates', 'd1,d2,...')")
        self._dates = [d.strip() for d in dates.split(",") if d.strip()]
        # The position check below resolves a committed date with
        # list.index (FIRST occurrence) — that is only a sound cursor
        # when dates are unique, so make uniqueness an explicit
        # contract here rather than let a duplicated day surface later
        # as a misdiagnosed 'mutated before the cursor' refusal
        # (round-11 ADVICE).
        dupes = sorted({d for d in self._dates if self._dates.count(d) > 1})
        if dupes:
            raise ValueError(
                f"twse stream: 'dates' option contains duplicate trading "
                f"days {dupes} — each day is one micro-batch and must "
                "appear exactly once"
            )
        self._source = options.get("source", "golden")
        raw = options.get("batch_days")
        self._batch_days = max(1, int(raw)) if raw else None  # None = all

    def initialOffset(self) -> dict:
        return {"last_date": None, "n_consumed": 0}

    def _idx_after(self, offset: dict) -> int:
        """Index of the first UNCONSUMED date under `offset`. Fails
        loudly when the offset shape is not the content+position form
        this reader writes (e.g. a positional next_idx checkpoint from
        an older build, or a bare last_date from the first round-11
        form — neither can be validated against a mutated list), when
        a committed date no longer exists in the current list
        (removal/rename), or when it exists at a DIFFERENT position
        than when it was committed (a date backfilled / inserted /
        reordered before the cursor — resuming 'after' the date would
        silently skip the inserted days)."""
        if "last_date" not in offset or "n_consumed" not in offset:
            raise ValueError(
                f"twse stream: unrecognized checkpoint offset {offset!r} — "
                "this reader commits {'last_date': <yyyyMMdd>, "
                "'n_consumed': <int>}; start a fresh checkpoint"
            )
        last = offset["last_date"]
        n_consumed = offset["n_consumed"]
        if last is None:
            if n_consumed != 0:
                raise ValueError(
                    f"twse stream: inconsistent checkpoint offset "
                    f"{offset!r} (no last_date but n_consumed != 0)"
                )
            return 0
        try:
            idx = self._dates.index(last)
        except ValueError:
            raise ValueError(
                f"twse stream restart: committed offset date {last!r} is "
                "not in the current 'dates' option — the list changed "
                "incompatibly (day removed/renamed); restore the committed "
                "date or start a fresh checkpoint"
            ) from None
        if idx + 1 != n_consumed:
            raise ValueError(
                f"twse stream restart: committed offset date {last!r} was "
                f"consumed at position {n_consumed} but now sits at "
                f"position {idx + 1} — the 'dates' option mutated before "
                "the cursor (day backfilled/inserted/reordered); only "
                "APPENDING future days is checkpoint-compatible. Restore "
                "the committed prefix or start a fresh checkpoint"
            )
        return idx + 1

    def read(self, start: dict):
        lo = self._idx_after(start)
        step = self._batch_days or len(self._dates)
        hi = min(lo + step, len(self._dates))
        end = (
            {"last_date": self._dates[hi - 1], "n_consumed": hi}
            if hi > 0
            else {"last_date": None, "n_consumed": 0}
        )
        return self._rows(lo, hi), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(self._idx_after(start), self._idx_after(end))

    def commit(self, end: dict) -> None:
        pass  # nothing upstream to acknowledge; the cursor IS the state

    def _rows(self, lo: int, hi: int):
        # a LIST ITERATOR, not a generator and not a bare list: the
        # engine's prefetch cache (datasource_internal) both
        # copy.copy()s the returned value AND calls next() on it —
        # generators aren't copyable, lists aren't iterators; a
        # list_iterator is both. At one document per day
        # materializing is free anyway.
        return iter(
            [
                _payload_row(_payload_for(date, self._source))
                for date in self._dates[lo:hi]
            ]
        )


def _payload_for(date: str, source: str) -> dict:
    if source == "golden":
        from .golden import GOLDEN_CLOSED, GOLDEN_OK, GOLDEN_WRONG_ARITY

        by_date = {
            p["date"]: p for p in (GOLDEN_OK, GOLDEN_CLOSED, GOLDEN_WRONG_ARITY)
        }
        if date in by_date:
            return by_date[date]
        # unknown date in golden mode -> the closed-day shape for that
        # date (deterministic; routes to the no-op path like P8)
        return {
            **GOLDEN_CLOSED,
            "date": date,
            "params": {"response": "json", "dayDate": date},
        }
    if source == "http":
        from .twse import TWSE_URL, _http_get_json

        try:
            p = _http_get_json(TWSE_URL.format(date=date))
        except Exception:  # noqa: BLE001 — any transport failure
            return {"stat": None, "date": date}
        # keep the row attributable to its trading day even when the
        # payload omits/nulls 'date' (schema drift) — the same
        # contract as twse.fetch_payloads_distributed's coalesce
        if not p.get("date"):
            p = {**p, "date": date}
        return p
    raise ValueError(f"unknown twse source {source!r} (golden|http)")


def register(spark) -> None:
    """Register the format with a session: spark.read.format('twse')."""
    spark.dataSource.register(TwseDataSource)
