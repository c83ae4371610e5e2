import os
import tempfile

import pytest

# secrets written during tests encrypt under a throwaway key, never the
# developer's real ~/.beacon_spark/secret.key
_KEYDIR = tempfile.mkdtemp(prefix="beacon_keys_")
os.environ.setdefault(
    "BEACON_SPARK_KEYFILE", os.path.join(_KEYDIR, "secret.key")
)


@pytest.fixture(scope="session")
def spark():
    from beacon_spark.session import get_spark

    s = get_spark(
        app_name="beacon_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.001"
