"""Rule-parsing validation layer — mirrors the reference's rejection
matrix (reference tests/test_parsing.py:300-325, SURVEY §5 layer 1) and
its injection validators (schema.py:251-259, 393-414). Pure parsing, no
Spark session needed."""

import pytest
import yaml

from omop_etl_spark.rules.model import (
    ConstantRule,
    DependencySpec,
    DisabledRule,
    ExpressionRule,
    RuleError,
    TableSpec,
    parse_spec,
)

BASE = """
name: baz
primary_key:
  name: baz_id
  sources:
    foo_pk:
      table: foo
      columns:
        id: integer
columns:
  - {columns}
"""


def _parse(column_yaml: str):
    return parse_spec(yaml.safe_load(BASE.format(columns=column_yaml)))


def test_missing_column_name_rejected():
    with pytest.raises(RuleError, match="requires a name"):
        _parse("{tables: [foo], expression: foo.beta}")


def test_missing_expression_rejected():
    with pytest.raises(RuleError, match="expression or constant"):
        _parse("{name: alpha, tables: [foo]}")


def test_missing_tables_rejected():
    with pytest.raises(RuleError, match="requires tables"):
        _parse("{name: alpha, expression: foo.beta}")


def test_unknown_primary_key_rejected():
    # reference schema.py:403-414
    with pytest.raises(RuleError, match="unknown primary_key"):
        _parse("{name: alpha, tables: [foo], expression: foo.beta, primary_key: nope}")


def test_single_source_pk_injected():
    # reference schema.py:393-401: single-source tables may omit the
    # column-level primary_key; it is injected
    spec = _parse("{name: alpha, tables: [foo], expression: foo.beta}")
    rule = spec.columns[0]
    assert isinstance(rule, ExpressionRule) and rule.primary_key == "foo_pk"


def test_multi_source_requires_explicit_pk():
    doc = yaml.safe_load(BASE.format(columns="{name: a, tables: [foo], expression: foo.b}"))
    doc["primary_key"]["sources"]["bar_pk"] = {"table": "bar", "columns": {"id": "integer"}}
    with pytest.raises(RuleError, match="primary_key required"):
        parse_spec(doc)


def test_disabled_column_skipped():
    # reference schema.py:170-184: enabled: false contributes nothing
    spec = _parse("{name: alpha, enabled: false}")
    assert isinstance(spec.columns[0], DisabledRule)


def test_constant_column_parses():
    spec = _parse("{name: alpha, constant: 1}")
    rule = spec.columns[0]
    assert isinstance(rule, ConstantRule) and rule.constant == 1


def test_pk_without_sources_rejected():
    with pytest.raises(RuleError, match="at least one source"):
        parse_spec({"name": "baz", "primary_key": {"name": "id", "sources": {}}})


def test_document_without_name_is_dependency():
    # reference __main__.py:25-27 fallback
    spec = parse_spec({"pre_init": [{"alias": "t", "query": "SELECT 1"}]})
    assert isinstance(spec, DependencySpec) and not isinstance(spec, TableSpec)


def test_inline_query_source_needs_alias():
    with pytest.raises(RuleError, match="alias"):
        parse_spec(
            {
                "name": "baz",
                "primary_key": {
                    "name": "id",
                    "sources": {
                        "q": {"table": {"query": "SELECT 1"}, "columns": {"id": "integer"}}
                    },
                },
            }
        )
