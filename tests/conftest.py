"""Shared fixtures: one SparkSession per test run, small synthetic inputs."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_extractor_for_bioeconomic_products_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def transcripts_df(spark):
    from text_extractor_for_bioeconomic_products_spark.sources.transcripts import (
        synthesize_transcripts,
    )
    df = synthesize_transcripts(spark, n_convs=20, seed=42)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def sf001_dir():
    return os.environ.get("SPARK_GRAFT_SF001", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf01_dir():
    return os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.01")
