import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from datawave_spark.session import get_spark
    s = get_spark("datawave_spark_tests")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from datawave_spark.session import load_tables
    return load_tables(spark, SF_DIR)
