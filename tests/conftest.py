"""Shared fixtures: one tuned SparkSession per test run, tmp dataset dirs."""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from aws_data_wrangler_spark import get_spark

    session = get_spark(app_name="tests")
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture()
def tmp_prefix():
    path = tempfile.mkdtemp(prefix="sgtest_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    from aws_data_wrangler_spark.plans.queries import load

    return load(spark, SF_DIR, "documents")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="session")
def events(spark):
    from aws_data_wrangler_spark.plans.queries import load

    return load(spark, SF_DIR, "events")
