import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from southpaw_spark.session import get_spark  # noqa: E402

_FAST_TIER_FILE = os.path.join(os.path.dirname(__file__), "fast_tier.txt")


def _load_fast_tier():
    files, nodeids = set(), set()
    try:
        with open(_FAST_TIER_FILE) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                (nodeids if "::" in line else files).add(line)
    except OSError:
        pass
    return files, nodeids


def pytest_collection_modifyitems(config, items):
    """Apply the `fast` marker (pytest.ini) from tests/fast_tier.txt —
    the curated per-family correctness core that `-m fast` selects so
    the driver's bounded verify window gets a completable run. The
    list only ADDS a marker; the full suite is untouched."""
    files, nodeids = _load_fast_tier()
    for item in items:
        path = item.nodeid.split("::", 1)[0]
        base = item.nodeid.split("[", 1)[0]
        if (
            path in files
            or item.nodeid in nodeids
            or base in nodeids
        ):
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("southpaw-spark-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
