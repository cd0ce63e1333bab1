"""End-to-end golden tests for every DML feature.

Each test re-creates one of the reference's integration fixtures
(reference tests/test_integration.py + tests/rules/*.yaml, summarized
in FIXTURES.md §1) as inline YAML + in-memory source tables, runs the
Spark engine, and checks the exact golden row sets. Surrogate ids here
are deterministic (rank by source order + natural key — SURVEY §4.3);
for these fixtures natural-key order coincides with the reference's
insertion order, so the golden ids match the reference's serials.
"""

import pytest

from omop_etl_spark import load_rules_text


def seed_cerner(engine, spark):
    engine.register_df(
        "cerner.foo",
        spark.createDataFrame(
            [(0, "a", 4, 2), (1, "c", 5, 5), (2, "d", 9, 7)],
            "id int, alpha string, beta int, gamma int",
        ),
    )
    engine.register_df(
        "cerner.bar",
        spark.createDataFrame(
            [(0, "x", 8, 3), (1, "a", 4, 4), (2, "c", 6, 5)],
            "id int, alpha string, beta int, gamma int",
        ),
    )


def rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


COPY_RULES = """
name: baz
primary_key:
  name: id
  sources:
    foo_pk:
      table: foo
      columns:
        id: integer
columns:
  - name: alpha
    enabled: true
    tables: [foo]
    expression: foo.alpha
  - name: beta
    tables: [foo, bar]
    constraints:
      - foo.id = bar.id
    primary_key: foo_pk
    expression: bar.beta
"""


def test_copy(engine, spark):
    seed_cerner(engine, spark)
    out = engine.run([load_rules_text(COPY_RULES)])["baz"]
    assert rows(out, "id") == [(1, "a", 8), (2, "c", 4), (3, "d", 6)]


JOIN_RULES = """
name: baz
primary_key:
  name: id
  sources:
    foobar_pk:
      table: foo2bar
      columns:
        foo_id: integer
        bar_id: integer
columns:
  - name: alpha
    tables: [foo, bar, foo2bar]
    constraints:
      - foo.id = foo2bar.foo_id
      - bar.id = foo2bar.bar_id
    expression: foo.alpha
    primary_key: foobar_pk
  - name: beta
    tables: [foo, bar, foo2bar]
    constraints:
      - foo.id = foo2bar.foo_id
      - bar.id = foo2bar.bar_id
    expression: CASE WHEN foo.beta > bar.beta THEN foo.beta ELSE bar.beta END
    primary_key: foobar_pk
  - name: gamma
    tables: [foo, bar, foo2bar]
    constraints:
      - foo.id = foo2bar.foo_id
      - bar.id = foo2bar.bar_id
    expression: CASE WHEN foo.gamma > bar.gamma THEN foo.gamma ELSE bar.gamma END
    primary_key: foobar_pk
"""


def test_join_composite_pk(engine, spark):
    seed_cerner(engine, spark)
    engine.register_df(
        "cerner.foo2bar",
        spark.createDataFrame([(0, 1), (1, 2)], "foo_id int, bar_id int"),
    )
    out = engine.run([load_rules_text(JOIN_RULES)])["baz"]
    # reference golden: tests/rules/join.yaml header + test_integration.py:588-599
    assert rows(out, "id") == [(1, "a", 4, 4), (2, "c", 6, 5)]


MERGE_RULES = """
name: baz
primary_key:
  name: id
  sources:
    foo_pk:
      table: foo
      columns:
        id: integer
    bar_pk:
      table: bar
      columns:
        id: integer
columns:
  - name: alpha
    tables: [foo]
    primary_key: foo_pk
    expression: foo.alpha
  - name: beta
    tables: [foo]
    primary_key: foo_pk
    expression: foo.beta
  - name: gamma
    tables: [foo]
    expression: foo.gamma
    primary_key: foo_pk
  - name: alpha
    tables: [bar]
    expression: bar.alpha
    primary_key: bar_pk
  - name: beta
    tables: [bar]
    expression: bar.beta
    primary_key: bar_pk
  - name: gamma
    tables: [bar]
    expression: bar.gamma
    primary_key: bar_pk
"""


def test_merge_multi_source(engine, spark):
    seed_cerner(engine, spark)
    out = engine.run([load_rules_text(MERGE_RULES)])["baz"]
    # reference golden: tests/rules/merge.yaml header (6 rows, foo then bar)
    assert rows(out, "id") == [
        (1, "a", 4, 2),
        (2, "c", 5, 5),
        (3, "d", 9, 7),
        (4, "x", 8, 3),
        (5, "a", 4, 4),
        (6, "c", 6, 5),
    ]


def test_merge_last_writer_wins(engine, spark):
    """Two overlapping rules for one column on the SAME pk source: the
    later rule overwrites the rows it matches (reference sequential
    UPDATE semantics, schema.py:474-478)."""
    seed_cerner(engine, spark)
    rules = """
name: baz
primary_key:
  name: id
  sources:
    foo_pk:
      table: foo
      columns:
        id: integer
columns:
  - name: alpha
    tables: [foo]
    expression: foo.alpha
  - name: alpha
    tables: [foo]
    constraints:
      - foo.beta > 4
    expression: 'upper(foo.alpha)'
"""
    out = engine.run([load_rules_text(rules)])["baz"]
    assert rows(out, "id") == [(1, "a"), (2, "C"), (3, "D")]


EVENT_RULES = """
name: events
primary_key:
  name: id
  sources:
    event_pk:
      table: event
      columns:
        id: integer
columns:
  - name: staff_id
    tables: [event]
    primary_key: event_pk
    references:
      table: person
      column: staff_id
    expression: event.staff_id
  - name: patient_id
    tables: [event]
    primary_key: event_pk
    references:
      person:
        table: patient
        column: id
    expression: event.patient_id
"""


def test_event_fk_remap(engine, spark):
    engine.register_df(
        "cerner.event",
        spark.createDataFrame(
            [(0, 456, 456), (2, 457, 456), (3, 101, 100), (4, None, 999)],
            "id int, staff_id int, patient_id int",
        ),
    )
    # pre-seeded mapping frame for the referenced table (reference
    # test_integration.py:729-742 creates it inline)
    engine.register_df(
        "mapping.person",
        spark.createDataFrame(
            [
                (0, 101, None),
                (1, 456, None),
                (2, 457, None),
                (3, None, 100),
                (4, None, 456),
                (5, None, 749),
                (6, None, 999),
            ],
            "id bigint, staff_id int, patient_id int",
        ),
    )
    out = engine.run([load_rules_text(EVENT_RULES)])["events"]
    # reference golden: test_integration.py:744-753
    assert rows(out, "id") == [(1, 1, 4), (2, 2, 4), (3, 0, 3), (4, None, 6)]


CONSTANT_RULES = """
name: baz
primary_key:
  name: id
  sources:
    foo:
      table: foo
      columns:
        id: integer
columns:
  - name: alpha
    constant: alpha
  - name: beta
    data_type: integer
    constant: 1
  - name: gamma
    data_type: integer
    constant: 2
"""


def test_constant_columns(engine, spark):
    seed_cerner(engine, spark)
    out = engine.run([load_rules_text(CONSTANT_RULES)])["baz"]
    # reference golden: test_integration.py:844-854
    assert rows(out, "id") == [(1, "alpha", 1, 2), (2, "alpha", 1, 2), (3, "alpha", 1, 2)]


EXTERNAL_RULES = """
name: baz
primary_key:
  name: id
  sources:
    foo_pk:
      table: foo
      columns:
        id: integer
columns:
  - name: alpha
    tables: [foo, external.vocabulary]
    constraints:
      - foo.id = external.vocabulary.id
    expression: external.vocabulary.name
  - name: beta
    tables: [foo]
    expression: foo.beta
"""


def test_external_lookup(engine, spark):
    seed_cerner(engine, spark)
    engine.register_df(
        "external.vocabulary",
        spark.createDataFrame(
            [(0, "vocab1"), (1, "vocab2"), (2, "vocab3")], "id int, name string"
        ),
    )
    out = engine.run([load_rules_text(EXTERNAL_RULES)])["baz"]
    # reference golden: tests/rules/external.yaml header
    assert rows(out, "id") == [(1, "vocab1", 4), (2, "vocab2", 5), (3, "vocab3", 9)]


DEP_RULES = """
scripts:
  - TRUE;
pre_init:
  - alias: temp_table_4
    query: select * from (VALUES (0::int, 1::numeric), (1::int, 2::numeric)) as t (id, beta)
"""

CUSTOM_QUERY_RULES = """
scripts:
  - |
    CREATE OR REPLACE FUNCTION total_rows ()
    RETURNS integer AS $total$
    declare
      total integer;
    BEGIN
      SELECT count(*) into total FROM foo;
      RETURN total;
    END;
    $total$ LANGUAGE plpgsql;
depends_on:
  - dep

pre_init:
  - alias: temp_table_1
    query: select * from (VALUES (0::int, 1::numeric), (1::int, 2::numeric), (2::int, 3::numeric), (3::int, 4::numeric), (4::int, 5::numeric)) as t (id, beta)

post_init:
  - alias: temp_table_2
    query: select mapping.baz.id, temp_table_1.beta from mapping.baz, temp_table_1 where mapping.baz.id = temp_table_1.id

variables:
  foo_table: &foo_table
    alias: foo
    query: select x.id, alpha, beta, total_rows() as total from (values (0, 'a1'), (2, 'b1'), (4, 'c1')) x(id, alpha), temp_table_1 where x.id = temp_table_1.id

name: baz
primary_key:
  name: id
  sources:
    foo:
      name: foo
      table: *foo_table
      columns:
        id: integer

columns:
  - name: alpha
    tables: [*foo_table]
    expression: foo.alpha
    primary_key: foo
  - name: beta
    tables: [*foo_table]
    expression: foo.beta
    primary_key: foo
  - name: disabled
    enabled: false
"""


def test_custom_query_pipeline(engine, spark):
    """QueryTable sources, VALUES inline tables, ``::`` casts, pre/post
    init temp tables, dependency files, UDF registration replacing the
    pl/pgsql script, and a disabled column."""
    seed_cerner(engine, spark)
    engine.register_udf("total_rows", lambda: 3, "int")
    # the reference's dep.yaml ships a literal `TRUE;` placeholder
    # script (never executed there — compile-only); opt into the
    # warn-and-continue mode for this replay
    engine.strict_scripts = False
    dep = load_rules_text(DEP_RULES, name="dep")
    table = load_rules_text(CUSTOM_QUERY_RULES)
    out = engine.run([table, dep])["baz"]  # run() topo-sorts dep first
    got = rows(out, "id")
    # reference golden: test_integration.py:321-332 — beta is numeric
    assert [(r[0], r[1], float(r[2])) for r in got] == [
        (1, "a1", 1.0),
        (2, "b1", 3.0),
        (3, "c1", 5.0),
    ]
    # post_init temp view exists and read the persisted mapping frame
    assert spark.table("temp_table_2").count() == 3
    # dependency's pre_init view is registered
    assert spark.table("temp_table_4").count() == 2


def test_failing_script_raises_by_default(engine):
    # a broken setup script must abort the run (ADVICE r1): later rules
    # would otherwise silently join against a missing lookup
    import pytest

    from omop_etl_spark.rules.loader import load_rules_text

    engine.strict_scripts = True
    bad = load_rules_text(
        "scripts:\n  - create table nope as select * from missing_tbl\n",
        name="baddep",
    )
    with pytest.raises(RuntimeError, match="setup script failed"):
        engine.run_dependency(bad)


def test_dependency_cycle_detected(engine):
    from omop_etl_spark.rules.loader import topo_sort
    from omop_etl_spark.rules.model import DependencySpec, RuleError

    a = DependencySpec(name="a", depends_on=("b",))
    b = DependencySpec(name="b", depends_on=("a",))
    with pytest.raises(RuleError, match="cycle"):
        topo_sort([a, b])


def test_external_lookup_from_csv(engine, spark, tmp_path):
    """register_csv: the reference's curated external/*.csv pattern."""
    seed_cerner(engine, spark)
    csv = tmp_path / "vocabulary.csv"
    csv.write_text("id,name\n0,vocab1\n1,vocab2\n2,vocab3\n")
    engine.register_csv("external.vocabulary", csv, "id int, name string")
    out = engine.run([load_rules_text(EXTERNAL_RULES)])["baz"]
    assert rows(out, "id") == [(1, "vocab1", 4), (2, "vocab2", 5), (3, "vocab3", 9)]
