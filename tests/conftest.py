from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from image_matadata_batchprocessing_aws_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", cpus=8, driver_memory="4g")
    yield s
