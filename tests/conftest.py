"""Shared fixtures: reference test vectors + a session-scoped Spark.

The vector fixtures reproduce the reference's
tests/conftest.py:8-45 verbatim so our kernels face the same cases.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture
def sample_date_strings():
    return [
        ("01/02/2024", "2024-02-01"),
        ("15 Jan 2024", "2024-01-15"),
        ("5 February 2024", "2024-02-05"),
        ("2024-03-15", "2024-03-15"),
        ("01/02/24", "2024-02-01"),
        ("1st Jan 2024", "2024-01-01"),
    ]


@pytest.fixture
def sample_amounts():
    return [
        ("1,234.56", "1234.56", False),
        ("(500.00)", "-500.00", True),
        ("100.00 DR", "-100.00", True),
        ("250.00 CR", "250.00", False),
        ("-75.50", "-75.50", True),
        ("75.50-", "-75.50", True),
        ("0.01", "0.01", False),
        ("10000", "10000", False),
    ]


@pytest.fixture
def sample_balance_chain():
    return {
        "opening_balance": "1000.00",
        "rows": [
            {"amount": "50.00", "running_balance": "950.00", "expected_direction": "DEBIT"},
            {"amount": "200.00", "running_balance": "1150.00", "expected_direction": "CREDIT"},
            {"amount": "75.25", "running_balance": "1074.75", "expected_direction": "DEBIT"},
        ],
    }


@pytest.fixture(scope="session")
def spark():
    """Local Spark session shared by all Spark-touching tests."""
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("universal_pdf_extractor_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
