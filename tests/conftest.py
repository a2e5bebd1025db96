from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from web_graph_spark.session import get_spark

    s = get_spark(app="wgs-tests", cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    """Deterministic synthetic-web fixtures (FIXTURES.md), seed=42."""
    from web_graph_spark.fixtures import generate_fixtures

    d = tmp_path_factory.mktemp("webfix")
    generate_fixtures(str(d), seed=42)
    return str(d)
