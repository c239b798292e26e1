import pytest

from deduce_spark.kernel.engine import Engine


@pytest.fixture(scope="session")
def engine() -> Engine:
    """Full engine over the reference's lookup data (content-hash cached
    under data/cache after the first ~90s build)."""
    return Engine()
