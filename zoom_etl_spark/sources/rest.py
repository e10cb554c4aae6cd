"""Paginated REST-shaped batch source (Spark 4 Python Data Source API).

The reference's extraction loop (reference src/zoom/extract.py:27-47)
walks `next_page_token` pages sequentially on one machine. The Spark-
native design partitions the *key space* (user ids / date windows)
across executors; each partition walks its own page loop, so extraction
parallelism is cluster-width instead of 1 (SURVEY.md §2.1 S1).

Rate limiting / retry (S2, extract.py:33-37) live inside the partition
reader: a 429-style signal sleeps-and-retries locally without failing
the task; Spark task retries (`spark.task.maxFailures`) cover hard
failures.

No EXTERNAL network in this environment, so the default transport is
injected: `_fake_fetch_page` deterministically synthesizes pages. The
seam also carries a real HTTP transport (`base_url` option → stdlib
urllib GET per page, JSON body, HTTP 429/5xx mapped to the same
retry path) — integration-tested against an in-process localhost
`http.server`, so wiring a real API in is exercised glue, not hope.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType)

PAGE_SIZE = 300  # reference DEFAULT_PAGE_SIZE (extract.py:25)

SCHEMA = StructType([
    StructField("key", LongType(), False),       # partition key (e.g. user id)
    StructField("page", IntegerType(), False),   # page number within key
    StructField("offset", IntegerType(), False),  # row offset within page
    StructField("payload", StringType(), True),  # record body
])


class TransientHttpError(Exception):
    """Stand-in for HTTP 429/5xx — retryable at the source level."""


def _fake_fetch_page(key: int, page_token: int | None,
                     flaky: bool = False,
                     _attempts: dict | None = None) -> tuple[list[tuple], int | None]:
    """Deterministic stand-in for one GET: returns (rows, next_page_token).
    Each key has (key % 3 + 1) pages; the last page is short. With
    ``flaky``, the first attempt at every even key's page 0 raises a
    transient error (the 429 path)."""
    page = page_token or 0
    if flaky and page == 0 and key % 2 == 0 and _attempts is not None:
        if _attempts.setdefault((key, page), 0) == 0:
            _attempts[(key, page)] += 1
            raise TransientHttpError(f"429 on key={key} page={page}")
    n_pages = key % 3 + 1
    if page >= n_pages:
        return [], None
    n_rows = PAGE_SIZE if page < n_pages - 1 else (key % 7 + 1) * 10
    rows = [(key, page, i, f"rec-{key}-{page}-{i}") for i in range(n_rows)]
    next_token = page + 1 if page + 1 < n_pages else None
    return rows, next_token


def _http_fetch_page(base_url: str, key: int,
                     page_token: int | None) -> tuple[list[tuple], int | None]:
    """One real GET over the wire (stdlib urllib — executor-safe, no
    deps): ``{base_url}?key=K&page_token=T`` returning a JSON body
    ``{"rows": [[key, page, offset, payload], ...],
    "next_page_token": int|null}``. Rate-limit and transient server
    statuses (429/5xx) surface as :class:`TransientHttpError` so the
    SAME source-level backoff loop covers both transports."""
    import json as _json
    import urllib.error
    import urllib.request
    token = "" if page_token is None else str(page_token)
    url = f"{base_url}?key={key}&page_token={token}"
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            body = _json.loads(resp.read().decode("utf-8"))
    except urllib.error.HTTPError as e:
        if e.code == 429 or e.code >= 500:
            raise TransientHttpError(f"HTTP {e.code} on key={key} "
                                     f"page_token={page_token}") from e
        raise
    except urllib.error.URLError as e:
        raise TransientHttpError(f"connection error on key={key}: "
                                 f"{e.reason}") from e
    rows = [tuple(r) for r in body["rows"]]
    return rows, body.get("next_page_token")


def _fetch_with_retry(key: int, token: int | None, flaky: bool,
                      attempts: dict, max_tries: int = 3,
                      base_delay: float = 0.01,
                      base_url: str | None = None):
    """Source-level retry with exponential backoff (reference
    error_handler.py:8-53: 3 tries, delay·2^(n−1)). Retrying INSIDE the
    partition reader keeps a transient 429 from failing the whole Spark
    task; ``spark.task.maxFailures`` remains the backstop for hard
    failures. ``base_url`` switches the transport from the injected
    fake to real HTTP."""
    import time as _time
    last = None
    for n in range(max_tries):
        try:
            if base_url:
                return _http_fetch_page(base_url, key, token)
            return _fake_fetch_page(key, token, flaky, attempts)
        except TransientHttpError as e:
            last = e
            _time.sleep(base_delay * (2 ** n))
    raise last


class RestPartition(InputPartition):
    def __init__(self, keys: list[int]):
        self.keys = keys


class PaginatedRestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_keys = int(options.get("nkeys", 40))
        self.n_partitions = int(options.get("numpartitions", 8))
        self.flaky = options.get("flaky", "false").lower() == "true"
        # real-HTTP transport: option("base_url", "http://host:port/path")
        self.base_url = options.get("base_url") or None

    def partitions(self) -> list[RestPartition]:
        # key-range partitioning: each executor-side task owns a key slice
        keys = list(range(self.n_keys))
        step = max(1, len(keys) // self.n_partitions)
        return [RestPartition(keys[i:i + step]) for i in range(0, len(keys), step)]

    def read(self, partition: RestPartition) -> Iterator[tuple]:
        attempts: dict = {}  # per-task attempt memory for the retry path
        for key in partition.keys:
            token: int | None = 0
            while token is not None:
                rows, token = _fetch_with_retry(key, token, self.flaky,
                                                attempts,
                                                base_url=self.base_url)
                yield from rows


class PaginatedRestDataSource(DataSource):
    """spark.read.format("paginated_rest").option("nkeys", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "paginated_rest"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> PaginatedRestReader:
        return PaginatedRestReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the data source on a session."""
    try:
        spark.dataSource.register(PaginatedRestDataSource)
    except Exception:
        pass  # already registered on this session
