from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from fluvio_jolt_spark.plans.session import build_session

    spark = build_session(
        app_name="fjs-tests",
        master="local[4]",
        shuffle_partitions=8,
        # static conf: managed-table tests (bucketing) need a writable
        # warehouse outside the repo
        extra_conf={"spark.sql.warehouse.dir": "/tmp/fjs-test-warehouse"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def stock_spark(spark):
    """Driver-replica session: the CORRECTNESS gate runs queries() under
    a STOCK SparkSession, where naive parquet timestamps infer as
    TIMESTAMP_NTZ (the round-1 failure mode). newSession() shares the
    JVM but takes its own SQL conf, reset here to the stock defaults
    that matter; shuffle partitions stay small purely for test speed."""
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    return s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def transcripts_small(spark):
    """Small deterministic transcript table (+snapshots) for tests."""
    from fluvio_jolt_spark.sources.transcripts import read_transcripts

    return read_transcripts(spark, n_turns=3000)
