import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_FIXTURES = "/root/reference/tests/fixtures/generic_test_cases"
TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from rust_geo_booleanop_spark.plans import get_spark

    spark = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
