from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from data_lakes_tp2_student_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark(
        app_name="tests",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"),
        shuffle_partitions=8,
        driver_memory="4g",
        extra_conf={
            # static conf: must be set at session creation (bucketing tests)
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("spark_wh")),
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_ORACLE
