"""The notification sink as a FIRST-CLASS Spark write format (Python
Data Source API): ``df.write.format("telegram")`` / ``df.writeStream
.format("telegram")``.

The reference delivers notifications through a dedicated Airflow
operator (dags/telegram.py TelegramOperator); sources/notify.py
re-homes that as a Callable used by foreachBatch / job callbacks. This
module is the Spark-native completion of S7/S8: notification becomes a
SINK the planner owns — executors deliver rows in parallel (each row =
one sendMessage, the reference's exact POST shape via
notify.TelegramNotifier), and Structured Streaming gives the
at-least-once epoch semantics every side-effecting sink needs.

Options: ``token``, ``chat_id`` (required), ``api_base`` (injectable —
tests run the REAL client against a local server, same doctrine as
test_notify.py), ``text_col`` (default ``text``), plus the client's
``retries``/``retry_delay_s``. A delivery that exhausts retries raises
(NotificationError) and FAILS the task — Spark's retry/abort machinery
then applies, mirroring the reference DAG's retries=2 semantics one
level up.

Scale note: this sink is for ALERT-grain output (one to a few rows per
batch — the reference sends exactly one message per day). Pointing a
100 TB DataFrame at a chat API is an operator error, not a sink
deficiency; cap upstream with limit()/aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from .notify import TELEGRAM_API_BASE, TelegramNotifier


@dataclass
class _Delivered(WriterCommitMessage):
    n_sent: int = 0


class _DeliverPartition:
    """Shared executor-side delivery: one sendMessage per row."""

    def __init__(self, options):
        token = options.get("token")
        chat_id = options.get("chat_id")
        if not token or not chat_id:
            raise ValueError(
                "telegram sink requires option('token', ...) and "
                "option('chat_id', ...)"
            )
        self._notifier = TelegramNotifier(
            token,
            chat_id,
            api_base=options.get("api_base", TELEGRAM_API_BASE),
            retries=int(options.get("retries", "2")),
            retry_delay_s=float(options.get("retry_delay_s", "1.0")),
        )
        self._text_col = options.get("text_col", "text")

    def deliver(self, iterator) -> _Delivered:
        # Validate the WHOLE partition before the first POST (round-10
        # ADVICE): a NULL text is a deterministic upstream bug, so
        # raising mid-iteration would let Spark's task retries
        # re-deliver the rows already sent before failing again on the
        # same NULL — duplicate chat messages for a permanent defect.
        # The sink is documented alert-grain (a few rows per batch), so
        # materializing the partition is free; fail-loud beats POSTing
        # the literal string 'None'.
        texts = [row[self._text_col] for row in iterator]
        if any(t is None for t in texts):
            raise ValueError(
                f"telegram sink: NULL in text column "
                f"{self._text_col!r} — filter or coalesce upstream"
            )
        for text in texts:
            self._notifier(str(text))
        return _Delivered(n_sent=len(texts))


class TelegramBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self._options = dict(options)

    def write(self, iterator) -> _Delivered:
        return _DeliverPartition(self._options).deliver(iterator)

    def commit(self, messages) -> None:
        pass  # messages already delivered; nothing to finalize

    def abort(self, messages) -> None:
        pass  # HTTP sends are not transactional; partial sends stand


class TelegramStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self._options = dict(options)

    def write(self, iterator) -> _Delivered:
        return _DeliverPartition(self._options).deliver(iterator)

    def commit(self, messages, batchId) -> None:
        pass

    def abort(self, messages, batchId) -> None:
        pass


class TelegramDataSource(DataSource):
    """format name: ``telegram`` — write-only (reading a chat is not a
    reference capability)."""

    @classmethod
    def name(cls) -> str:
        return "telegram"

    def schema(self) -> str:
        return "text string"

    def writer(self, schema, overwrite: bool) -> TelegramBatchWriter:
        return TelegramBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> TelegramStreamWriter:
        return TelegramStreamWriter(self.options)


def register(spark) -> None:
    """Register the format: df.write.format('telegram')."""
    spark.dataSource.register(TelegramDataSource)
