import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_indexing_and_retrival_with_qdrant_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # The gate must fit the driver's pytest window (VERDICT r11 #3).
    # Cores default to the box (capped 32): compute-heavy suites run
    # 1.47x faster at local[32] than the old literal local[8]
    # (test_auto_index 103.8 -> 70.5 s A/B), latency-bound ones are
    # unchanged. Shuffle partitions stay at 8 regardless: the sf0.001/
    # sf0.01 fixtures are tiny, so 32 post-shuffle tasks per stage is
    # pure scheduling latency across ~600 small tests (test_fusion
    # 190.6 -> 128.5 s, test_auto_index 70.5 -> 46.3 s at local[32]
    # with 8 shuffle partitions). SPARK_GRAFT_CPUS still overrides the
    # core count, so the driver's own core sweep is unaffected.
    default = str(max(8, min(32, os.cpu_count() or 8)))
    s = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", default),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
