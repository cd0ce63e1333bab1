from omop_etl_spark.dialect import (
    is_plpgsql_script,
    rewrite_casts,
    rewrite_distinct_on,
    spark_type,
    translate,
)


def test_cast_simple_tokens():
    assert rewrite_casts("0::int") == "CAST(0 AS INT)"
    assert rewrite_casts("x::bigint as y") == "CAST(x AS BIGINT) as y"
    assert (
        rewrite_casts("a::numeric, b::text")
        == "CAST(a AS DECIMAL(38,18)), CAST(b AS STRING)"
    )


def test_cast_parenthesized_and_literals():
    assert rewrite_casts("f(x+1)::numeric(10,2)") == "CAST(f(x+1) AS DECIMAL(10,2))"
    assert rewrite_casts("'a''b'::text") == "CAST('a''b' AS STRING)"
    assert rewrite_casts("z::double precision") == "CAST(z AS DOUBLE)"


def test_cast_no_op():
    assert rewrite_casts("select 1") == "select 1"


def test_spark_type_mapping():
    assert spark_type("varchar(30)") == "STRING"
    assert spark_type("serial") == "BIGINT"
    assert spark_type("numeric(12,4)") == "DECIMAL(12,4)"
    assert spark_type("timestamp") == "TIMESTAMP"


def test_distinct_on_single():
    out = rewrite_distinct_on("select distinct on (k) k, v from t")
    assert "row_number() OVER (PARTITION BY k ORDER BY k, v)" in out
    assert "__don_rn = 1" in out


def test_distinct_on_union_branches():
    sql = (
        "select distinct on (a) a, b from t1 "
        "UNION select distinct on (a) a, b from t2 order by a"
    )
    out = rewrite_distinct_on(sql)
    assert out.count("__don_rn = 1") == 2
    assert out.rstrip().endswith("order by a")


def test_distinct_on_strips_alias_in_order():
    out = rewrite_distinct_on("select distinct on (k) k as kk, v as vv from t")
    assert "ORDER BY k, v)" in out


def test_plpgsql_detection():
    assert is_plpgsql_script("CREATE OR REPLACE FUNCTION f() ...")
    assert not is_plpgsql_script("create table x as select 1")


def test_translate_strips_semicolon():
    assert translate("select 1;") == "select 1"
