from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacooker_dist_spark.session import build_session  # noqa: E402

SF_SMALL = __import__("os").environ.get("DDS_TEST_SF", "/root/testdata/sf0.001")
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dds-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
