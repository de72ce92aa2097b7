from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
