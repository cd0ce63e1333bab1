"""Web-API parity tests (pure function; transport is optional)."""

import yaml

from omop_etl_spark.api import translate_rule

RULE = """
name: person_copy
default_schema: cerner
primary_key:
  name: person_id
  sources:
    customer_pk:
      table: customer
      columns:
        c_custkey: bigint
columns:
  - name: full_name
    tables: [customer]
    expression: customer.c_name
"""


def test_translate_rule_script_and_warnings():
    out = translate_rule(
        yaml.safe_load(RULE), {"person_copy": {"full_name", "birth_year"}}
    )
    assert "mapping source customer_pk" in out["script"]
    assert "customer.c_name" in out["script"]
    # populated + pk columns never warn; missing required ones do
    assert out["warnings"] == [
        "required column 'birth_year' of 'person_copy' is not populated"
    ]


def test_translate_rule_no_required_no_warnings():
    out = translate_rule(yaml.safe_load(RULE))
    assert out["warnings"] == []


def test_translate_dependency_payload():
    out = translate_rule({"pre_init": [{"alias": "t", "query": "SELECT 1"}]})
    assert out["warnings"] == [] and "dependency" in out["script"]
