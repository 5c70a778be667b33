from __future__ import annotations

import pytest

from sfcrimedatapipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sfcdp-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def staging(spark):
    from sfcrimedatapipeline_spark.testing import synthetic_staging

    df = synthetic_staging(spark, 5000).cache()
    df.count()
    yield df
    df.unpersist()
