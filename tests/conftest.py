from __future__ import annotations

import tempfile

import pytest

SF_DIR_SMOKE = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from open_energy_data_server_spark import get_spark

    s = get_spark(
        app_name="spark-oeds-tests",
        shuffle_partitions=8,
        extra_conf={
            # static conf — needed by the bucketed-table tests
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-oeds-wh-")
        },
    )
    yield s
