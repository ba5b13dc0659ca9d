import sys

import pytest

sys.path.insert(0, "/root/repo")

from columnar_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("columnar-spark-tests", cpus=4)
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
