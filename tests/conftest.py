from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(session, config, items):
    """Seeded whole-suite shuffle (SPARK_GRAFT_TEST_SHUFFLE_SEED=n):
    the order-sensitivity proof for suite-global state (cached RDD
    residue, shared-session conf) without a plugin dependency.  Unset =
    normal file order."""
    seed = os.environ.get("SPARK_GRAFT_TEST_SHUFFLE_SEED")
    if seed:
        import random

        random.Random(int(seed)).shuffle(items)


@pytest.fixture(scope="session")
def spark():
    from tg_reporting_etl_spark.session import get_spark

    spark = get_spark("tests", cpus=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
