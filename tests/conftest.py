import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURE_WEIGHTS = REPO / "fixtures" / "ner_weights.npz"
REF_DATA = Path("/root/reference/data")
TESTDATA = Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


@pytest.fixture(scope="session")
def spark():
    from golden_horse_spark.config import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark(
        "golden-horse-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


@pytest.fixture(scope="session")
def weights_path():
    assert FIXTURE_WEIGHTS.exists(), "run tools/train_fixture.py first"
    return str(FIXTURE_WEIGHTS)
