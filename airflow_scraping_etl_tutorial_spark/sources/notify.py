"""Notification delivery (SURVEY.md §2.1 S7/S8) — the HTTP client
behind the pipeline's notify callbacks.

The reference delivers via Telegram (dags/telegram.py:29-34:
TelegramOperator -> api.telegram.org sendMessage with chat_id + text;
Final_app.py wires the success and alert branches to the same bot).
Here that is a small stdlib HTTP client with the same POST shape:

    notifier = TelegramNotifier(token, chat_id)
    run_daily_load(..., notify=notifier)

Design points:
- the pipeline depends only on Callable[[str], None]; this module is
  one implementation of that contract (tests use plain recorders);
- api_base is injectable, so tests exercise the REAL http client
  against a local server — no network, no Telegram account, and the
  production path is the tested path;
- bounded retries with linear backoff mirror the reference DAG's
  retries=2/retry_delay semantics at the delivery layer; a delivery
  that still fails raises NotificationError so the caller's exit-code
  contract (jobs/daily_load.py) can route it.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

TELEGRAM_API_BASE = "https://api.telegram.org"


class NotificationError(RuntimeError):
    """Delivery failed after all retries."""


class TelegramNotifier:
    """Callable notification sink posting sendMessage to the bot API.

    Matches the reference's TelegramOperator payload: JSON body with
    chat_id and text against /bot<token>/sendMessage.
    """

    def __init__(
        self,
        token: str,
        chat_id: str,
        api_base: str = TELEGRAM_API_BASE,
        retries: int = 2,
        retry_delay_s: float = 1.0,
        timeout_s: float = 10.0,
    ) -> None:
        self._url = f"{api_base}/bot{token}/sendMessage"
        self._chat_id = chat_id
        self._retries = retries
        self._retry_delay_s = retry_delay_s
        self._timeout_s = timeout_s

    def __call__(self, text: str) -> None:
        body = json.dumps({"chat_id": self._chat_id, "text": text}).encode("utf-8")
        last_err: Exception | None = None
        for attempt in range(self._retries + 1):
            if attempt:
                time.sleep(self._retry_delay_s * attempt)
            req = urllib.request.Request(
                self._url, data=body, headers={"Content-Type": "application/json"}
            )
            try:
                with urllib.request.urlopen(req, timeout=self._timeout_s) as resp:
                    if 200 <= resp.status < 300:
                        return
                    last_err = NotificationError(f"HTTP {resp.status}")
            except (urllib.error.URLError, OSError) as e:  # includes HTTPError
                last_err = e
        raise NotificationError(
            f"notification delivery failed after {self._retries + 1} attempts: {last_err}"
        ) from last_err
