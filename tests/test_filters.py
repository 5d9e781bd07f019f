"""Qdrant Filter-DSL compiler: Column/SQL twins agree, clause
semantics match Qdrant's documented behavior, collection surface
accepts DSL objects."""

import pytest
from pyspark.sql import functions as F

from image_indexing_and_retrival_with_qdrant_spark.catalog import create_collection
from image_indexing_and_retrival_with_qdrant_spark.filters import (
    FieldCondition,
    Filter,
    as_predicate,
)
from image_indexing_and_retrival_with_qdrant_spark.registry import REGISTRY
from tests.oracle import compare


@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_dsl_oracle_parity(spark, sf, request):
    compare(spark, REGISTRY["knn_dsl_filtered_top5"],
            request.getfixturevalue(sf), "knn_dsl_filtered_top5")


def _df(spark):
    return spark.createDataFrame(
        [(1, "en", 10, "alpha beta"), (2, "de", 20, "gamma"),
         (3, "en", 30, "beta delta"), (4, None, 40, "epsilon")],
        "id int, lang string, n int, text string",
    )


def test_must_is_and(spark):
    f = Filter(must=[FieldCondition("lang", match="en"),
                     FieldCondition("n", range={"gte": 20})])
    assert [r.id for r in _df(spark).filter(f.to_column()).collect()] == [3]


def test_should_is_at_least_one(spark):
    f = Filter(should=[FieldCondition("n", match=10),
                       FieldCondition("lang", match="de")])
    ids = {r.id for r in _df(spark).filter(f.to_column()).collect()}
    assert ids == {1, 2}


def test_must_not_and_nesting(spark):
    f = Filter(
        must=[Filter(should=[FieldCondition("lang", match="en"),
                             FieldCondition("lang", match="de")])],
        must_not=[FieldCondition("n", range={"gt": 25})],
    )
    ids = {r.id for r in _df(spark).filter(f.to_column()).collect()}
    assert ids == {1, 2}


def test_match_text_and_is_null(spark):
    f = Filter(must=[FieldCondition("text", match_text="beta")])
    assert {r.id for r in _df(spark).filter(f.to_column()).collect()} == {1, 3}
    f2 = Filter(must=[FieldCondition("lang", is_null=True)])
    assert {r.id for r in _df(spark).filter(f2.to_column()).collect()} == {4}


def test_sql_twin_matches_column(spark):
    """Same rows whether the tree compiles to Catalyst or to SQL."""
    f = Filter(
        must=[FieldCondition("n", range={"gte": 10, "lte": 30})],
        should=[FieldCondition("lang", match_any=["en", "de"]),
                FieldCondition("n", match=30)],
        must_not=[FieldCondition("text", match_text="gamma")],
    )
    df = _df(spark)
    df.createOrReplaceTempView("t_dsl")
    col_ids = {r.id for r in df.filter(f.to_column()).collect()}
    sql = f.to_sql().replace(
        "list_contains(regexp_extract_all(text, '\\w+'), 'gamma')",
        "array_contains(regexp_extract_all(text, '\\\\w+', 0), 'gamma')",
    )  # duckdb spelling -> spark spelling for the tokenizer builtin
    sql_ids = {r.id for r in
               spark.sql(f"SELECT id FROM t_dsl WHERE {sql}").collect()}
    assert col_ids == sql_ids == {1, 3}


def test_collection_surface_accepts_dsl(spark, tmp_path):
    coll = create_collection(str(tmp_path), "f", dim=2, metric="dot",
                             normalize=False)
    pts = spark.createDataFrame(
        [(1, "a", [1.0, 0.0]), (2, "b", [0.9, 0.0]), (3, "a", [0.8, 0.0])],
        "id int, tag string, embedding array<double>",
    )
    coll.upsert(spark, pts)
    flt = Filter(must=[FieldCondition("tag", match="a")])
    hits = coll.search(spark, [1.0, 0.0], k=5, query_filter=flt).collect()
    assert [r.id for r in hits] == [1, 3]
    removed = coll.delete(spark, FieldCondition("tag", match="b"))
    assert removed == 1


def test_as_predicate_validation():
    assert as_predicate(None) is None
    c = F.col("x") > 1
    assert as_predicate(c) is c
    with pytest.raises(TypeError):
        as_predicate("x > 1")
    with pytest.raises(ValueError):
        Filter().to_column()
    with pytest.raises(ValueError):
        FieldCondition("x").to_sql()


def test_geo_radius_and_bbox(spark):
    # Berlin (52.52, 13.405), Potsdam ~27 km away, Munich ~504 km
    df = spark.createDataFrame(
        [(1, (52.52, 13.405)), (2, (52.40, 13.06)), (3, (48.137, 11.575))],
        "id int, loc struct<lat:double, lon:double>",
    )
    near = Filter(must=[FieldCondition(
        "loc", geo_radius={"lat": 52.52, "lon": 13.405, "radius_m": 50000})])
    assert {r.id for r in df.filter(near.to_column()).collect()} == {1, 2}
    tight = FieldCondition(
        "loc", geo_radius={"lat": 52.52, "lon": 13.405, "radius_m": 1000})
    assert {r.id for r in df.filter(tight.to_column()).collect()} == {1}
    box = FieldCondition("loc", geo_bounding_box={
        "top_left": {"lat": 53.0, "lon": 12.5},
        "bottom_right": {"lat": 52.0, "lon": 14.0}})
    assert {r.id for r in df.filter(box.to_column()).collect()} == {1, 2}


def test_geo_sql_twin_matches_column(spark):
    df = spark.createDataFrame(
        [(1, (52.52, 13.405)), (2, (52.40, 13.06)), (3, (48.137, 11.575))],
        "id int, loc struct<lat:double, lon:double>",
    )
    df.createOrReplaceTempView("t_geo")
    f = FieldCondition(
        "loc", geo_radius={"lat": 52.0, "lon": 13.0, "radius_m": 100000})
    col_ids = {r.id for r in df.filter(f.to_column()).collect()}
    sql_ids = {r.id for r in
               spark.sql(f"SELECT id FROM t_geo WHERE {f.to_sql()}").collect()}
    assert col_ids == sql_ids == {1, 2}


def test_geo_polygon_with_hole(spark):
    """Even-odd ray casting: unit square exterior, centered square
    hole; closed (GeoJSON-style) rings accepted; degenerate rejected."""
    from image_indexing_and_retrival_with_qdrant_spark.filters import FieldCondition, Filter

    df = spark.createDataFrame(
        [(1, (5.0, 5.0)),     # center -> in hole
         (2, (2.0, 5.0)),     # inside exterior, outside hole
         (3, (15.0, 5.0)),    # outside exterior
         (4, (5.0, -1.0))],   # west of everything
        "id int, loc struct<lat:double, lon:double>",
    )
    sq = lambda lo, hi: [
        {"lat": lo, "lon": lo}, {"lat": lo, "lon": hi},
        {"lat": hi, "lon": hi}, {"lat": hi, "lon": lo},
    ]
    poly = Filter(must=[FieldCondition("loc", geo_polygon={
        "exterior": sq(0.0, 10.0), "interiors": [sq(4.0, 6.0)]})])
    assert {r.id for r in df.filter(poly.to_column()).collect()} == {2}

    # no hole: center included; explicitly closed ring is equivalent
    ring = sq(0.0, 10.0)
    closed = Filter(must=[FieldCondition(
        "loc", geo_polygon={"exterior": ring + [ring[0]]})])
    assert {r.id for r in df.filter(closed.to_column()).collect()} == {1, 2}

    # SQL twin agrees
    df.createOrReplaceTempView("t_poly")
    sql_ids = {r.id for r in spark.sql(
        f"SELECT id FROM t_poly WHERE {poly.to_sql()}").collect()}
    assert sql_ids == {2}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="at least 3"):
        FieldCondition("loc", geo_polygon={
            "exterior": [{"lat": 0.0, "lon": 0.0},
                         {"lat": 1.0, "lon": 1.0}]}).to_column()


# ---- round-7 extensions: MatchExcept / IsEmpty / ValuesCount /
# ---- Nested / HasId / MinShould ------------------------------------

def _ext_df(spark):
    return spark.createDataFrame(
        [
            (1, "en", ["a", "b"],
             [{"tok": "alpha", "len": 5}, {"tok": "be", "len": 2}]),
            (2, "de", [],
             [{"tok": "gamma", "len": 5}]),
            (3, None, None, None),
            (4, "fr", ["a", "b", "c"],
             [{"tok": "dd", "len": 2}, {"tok": "epsilon", "len": 7}]),
        ],
        "id int, lang string, tags array<string>, "
        "sections array<struct<tok:string, len:bigint>>",
    )


def _duck_ext(sql_pred):
    import duckdb
    q = """
    WITH t AS (
      SELECT * FROM (VALUES
        (1, 'en', ['a','b'],
         [{'tok':'alpha','len':5}, {'tok':'be','len':2}]),
        (2, 'de', [],
         [{'tok':'gamma','len':5}]),
        (3, NULL, NULL, NULL),
        (4, 'fr', ['a','b','c'],
         [{'tok':'dd','len':2}, {'tok':'epsilon','len':7}])
      ) AS v(id, lang, tags, sections))
    SELECT id FROM t WHERE %s
    """ % sql_pred
    return {r[0] for r in duckdb.sql(q).fetchall()}


def _both(spark, flt):
    """Row-ids surviving the Catalyst compiler and the DuckDB twin —
    asserts they agree, returns them."""
    col_ids = {r.id for r in _ext_df(spark).filter(flt.to_column()).collect()}
    sql_ids = _duck_ext(flt.to_sql())
    assert col_ids == sql_ids, (col_ids, sql_ids, flt.to_sql())
    return col_ids


def test_match_except_missing_field_matches(spark):
    # MatchExcept == must_not MatchAny: null lang (id 3) matches
    f = Filter(must=[FieldCondition("lang", match_except=["en", "de"])])
    assert _both(spark, f) == {3, 4}


def test_is_empty_and_values_count(spark):
    assert _both(spark, Filter(
        must=[FieldCondition("tags", is_empty=True)])) == {2, 3}
    assert _both(spark, Filter(
        must=[FieldCondition("tags", is_empty=False)])) == {1, 4}
    assert _both(spark, Filter(
        must=[FieldCondition("tags", values_count={"gte": 2, "lt": 3})]
    )) == {1}
    # null array counts as 0 elements (Qdrant: missing field -> 0)
    assert _both(spark, Filter(
        must=[FieldCondition("tags", values_count={"lte": 0})])) == {2, 3}


def test_nested_same_element_semantics(spark):
    from image_indexing_and_retrival_with_qdrant_spark.filters import Nested
    # tok >= 'e' AND len >= 5 on the SAME element: id 2 ('gamma', 5)
    # and id 4 ('epsilon', 7). id 1 has 'alpha'(5) and 'be'(2) — a
    # dotted-key AND across elements would wrongly keep it.
    inner = Filter(must=[FieldCondition("tok", range={"gte": "e"}),
                         FieldCondition("len", range={"gte": 5})])
    f = Filter(must=[Nested("sections", inner)])
    assert _both(spark, f) == {2, 4}
    # null array -> no element matches (id 3 excluded), and must_not
    # over a Nested keeps it (vacuous truth), matching Qdrant.
    f2 = Filter(must_not=[Nested("sections", inner)])
    assert _both(spark, f2) == {1, 3}


def test_min_should_and_has_id(spark):
    from image_indexing_and_retrival_with_qdrant_spark.filters import HasId
    f = Filter(min_should={"conditions": [
        FieldCondition("lang", match="en"),
        FieldCondition("tags", values_count={"gte": 2}),
        FieldCondition("id", range={"gte": 4}),
    ], "min_count": 2})
    assert _both(spark, f) == {1, 4}
    f2 = Filter(must=[HasId([1, 3], id_col="id")])
    assert _both(spark, f2) == {1, 3}
    # HasId composes with other clauses
    f3 = Filter(must=[HasId([1, 2, 3], id_col="id"),
                      FieldCondition("tags", is_empty=True)])
    assert _both(spark, f3) == {2, 3}


def test_nested_in_nested_sql_vars_distinct(spark):
    """Two nesting levels compile with distinct lambda vars in the
    DuckDB twin (depth-derived names)."""
    from image_indexing_and_retrival_with_qdrant_spark.filters import Nested
    df = spark.createDataFrame(
        [(1, [{"xs": [{"v": 5}]}, {"xs": [{"v": 1}]}]),
         (2, [{"xs": [{"v": 1}]}]),
         (3, None)],
        "id int, lvl1 array<struct<xs:array<struct<v:bigint>>>>",
    )
    inner = Filter(must=[Nested("xs", Filter(
        must=[FieldCondition("v", range={"gte": 5})]))])
    f = Filter(must=[Nested("lvl1", inner)])
    col_ids = {r.id for r in df.filter(f.to_column()).collect()}
    assert col_ids == {1}
    import duckdb
    q = """
    WITH t AS (SELECT * FROM (VALUES
      (1, [{'xs': [{'v': 5}]}, {'xs': [{'v': 1}]}]),
      (2, [{'xs': [{'v': 1}]}]),
      (3, NULL)) AS v(id, lvl1))
    SELECT id FROM t WHERE %s
    """ % f.to_sql()
    assert {r[0] for r in duckdb.sql(q).fetchall()} == {1}


def test_extended_dsl_on_collection_search(spark, tmp_path):
    from image_indexing_and_retrival_with_qdrant_spark.filters import HasId, Nested
    coll = create_collection(str(tmp_path), "fx", dim=2, metric="dot",
                             normalize=False)
    pts = spark.createDataFrame(
        [(1, ["a"], [{"k": "x", "w": 9}], [1.0, 0.0]),
         (2, [], [{"k": "x", "w": 1}], [0.9, 0.0]),
         (3, ["a", "b"], [{"k": "y", "w": 9}], [0.8, 0.0])],
        "id int, tags array<string>, meta array<struct<k:string,w:bigint>>,"
        " embedding array<double>",
    )
    coll.upsert(spark, pts)
    flt = Filter(
        must=[Nested("meta", Filter(must=[
            FieldCondition("k", match="x"),
            FieldCondition("w", range={"gte": 5})]))],
        must_not=[FieldCondition("tags", is_empty=True)],
    )
    hits = coll.search(spark, [1.0, 0.0], k=5, query_filter=flt).collect()
    assert [r.id for r in hits] == [1]
    hits2 = coll.search(spark, [1.0, 0.0], k=5,
                        query_filter=HasId([2, 3], id_col="id")).collect()
    assert [r.id for r in hits2] == [2, 3]


def test_datetime_range(spark):
    import datetime as dt
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5)), (2, dt.datetime(2024, 1, 15)),
         (3, dt.datetime(2024, 1, 25))],
        "id int, ts timestamp",
    )
    f = Filter(must=[FieldCondition("ts", datetime_range={
        "gte": "2024-01-10 00:00:00", "lt": "2024-01-20 00:00:00"})])
    assert {r.id for r in df.filter(f.to_column()).collect()} == {2}
    # DuckDB twin on identical rows
    import duckdb
    q = """
    WITH t AS (SELECT * FROM (VALUES
      (1, TIMESTAMP '2024-01-05'), (2, TIMESTAMP '2024-01-15'),
      (3, TIMESTAMP '2024-01-25')) AS v(id, ts))
    SELECT id FROM t WHERE %s
    """ % f.to_sql()
    assert {r[0] for r in duckdb.sql(q).fetchall()} == {2}


@pytest.mark.parametrize("name", ["docs_extended_filter_dsl",
                                  "events_datetime_filter_dsl"])
@pytest.mark.parametrize("sf", ["sf_smoke", "sf_oracle"])
def test_extended_dsl_oracle_parity(spark, name, sf, request):
    compare(spark, REGISTRY[name], request.getfixturevalue(sf), name)


def test_match_text_and_of_tokens(spark):
    """Qdrant MatchText('a b') requires BOTH tokens present."""
    f = Filter(must=[FieldCondition("text", match_text="beta alpha")])
    # only id 1 has both 'alpha' and 'beta'
    assert {r.id for r in _df(spark).filter(f.to_column()).collect()} == {1}
    with pytest.raises(ValueError, match="no word tokens"):
        FieldCondition("text", match_text="!!").to_column()
