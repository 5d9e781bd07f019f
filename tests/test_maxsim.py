"""MaxSim (Q2) vs DuckDB oracle; UDF and relational paths must agree."""

import pytest

from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY

from .oracle import compare


@pytest.mark.parametrize("name", ["maxsim_top5", "maxsim_exact_top5",
                                  "maxsim_filtered_top5",
                                  "maxsim_indexed_top5"])
def test_maxsim_oracle(spark, sf_smoke, name):
    compare(spark, REGISTRY[name], sf_smoke, name)


def test_maxsim_paths_agree(spark, sf_oracle):
    a = REGISTRY["maxsim_top5"].builder(spark, sf_oracle).collect()
    b = REGISTRY["maxsim_exact_top5"].builder(spark, sf_oracle).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
