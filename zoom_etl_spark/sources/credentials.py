"""Driver-side credential provider — the engine form of the reference's
thread-safe OAuth token cache (reference src/zoom/oauth.py:24-51: locked
refresh, 55-minute expiry with 5-minute safety buffer) and memoized
secret fetch (lambda/zoom_webhook/utils.py:18,117-120).

In Spark this is a driver-side concern: the provider refreshes under a
lock and the current token ships to executors per job (closure capture /
broadcast) — executors never refresh, so there is no distributed lock.
The fetcher is injected (no network here); expiry math is real.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

DEFAULT_TTL_S = 55 * 60  # reference: 60-min token, 5-min safety buffer


class CredentialProvider:
    """Thread-safe TTL cache around a token fetcher."""

    def __init__(self, fetch: Callable[[], str], ttl_s: float = DEFAULT_TTL_S,
                 clock: Callable[[], float] = time.monotonic):
        self._fetch = fetch
        self._ttl = ttl_s
        self._clock = clock
        self._lock = threading.Lock()
        self._token: str | None = None
        self._expires_at = float("-inf")
        self.fetch_count = 0

    def token(self) -> str:
        """Current token, refreshing under the lock iff expired (double-
        checked so concurrent callers trigger exactly one fetch)."""
        now = self._clock()
        if self._token is not None and now < self._expires_at:
            return self._token
        with self._lock:
            if self._token is None or self._clock() >= self._expires_at:
                self._token = self._fetch()
                self.fetch_count += 1
                self._expires_at = self._clock() + self._ttl
            return self._token
