"""Quarantine routing (E2) and credential provider (E3/E5) semantics."""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from zoom_etl_spark.operators.quarantine import (required_fields_rules,
                                                 validate_split)
from zoom_etl_spark.sources.credentials import CredentialProvider


def test_validate_split_first_rule_wins(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, None, 20), (3, "c", None), (4, None, None)],
        "id int, name string, qty int")
    rules = (required_fields_rules("name", "qty")
             + [("QTY_RANGE", F.col("qty") < 100)])
    valid, quarantined = validate_split(df, rules)
    assert {r.id for r in valid.collect()} == {1}
    got = {r.id: r._quarantine_reason for r in quarantined.collect()}
    # first violated rule names the reason (row 4 fails both → first wins)
    assert got == {2: "MISSING_NAME", 3: "MISSING_QTY", 4: "MISSING_NAME"}


def test_validate_split_partitions_df(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id int, v int")
    valid, quar = validate_split(df, [("V_NONZERO", F.col("v") != 0)])
    assert valid.count() + quar.count() == 30


def test_credential_provider_ttl_and_single_fetch():
    clock = {"t": 0.0}
    fetches = []

    def fetch():
        fetches.append(1)
        return f"tok-{len(fetches)}"

    p = CredentialProvider(fetch, ttl_s=100, clock=lambda: clock["t"])
    assert p.token() == "tok-1"
    clock["t"] = 99
    assert p.token() == "tok-1"          # cached inside TTL
    clock["t"] = 101
    assert p.token() == "tok-2"          # refreshed after expiry
    assert p.fetch_count == 2


def test_credential_provider_concurrent_single_refresh():
    clock = {"t": 0.0}
    barrier = threading.Barrier(8)
    p = CredentialProvider(lambda: "tok", ttl_s=100, clock=lambda: clock["t"])

    def hit():
        barrier.wait()
        p.token()

    threads = [threading.Thread(target=hit) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert p.fetch_count == 1            # one fetch despite 8 racers
