"""Golden-workbook parity: replay the reference's four realistic
validation rules (person, location, visit_occurrence,
condition_occurrence) through the Spark engine against the Excel
workbook fixtures, and compare with the golden ``OMOP.*`` sheets.

Mirrors reference tests/test_rules.py:131-171: actual rows are sorted
by the golden sheet's first column (the surrogate key) and compared
column-wise. Surrogate ids align because our deterministic ids (rank by
source order + natural key — SURVEY §4.3) coincide with Postgres serial
order for this workbook (sheets are sorted by their natural keys, and
the location DISTINCT ON queries carry an ORDER BY).

The rule YAMLs and workbook are read from the reference checkout at
runtime (they are fixtures, not code); tests skip if it is absent.
"""

import math
from datetime import date, datetime, timedelta
from pathlib import Path

import pytest

from omop_etl_spark import load_rules_text
from omop_etl_spark.sources.xlsx import EXCEL_EPOCH, read_workbook, sheet_to_rows

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

# sheet name -> spark schema (types from the reference DDL, FIXTURES §2);
# columns absent from the sheet but referenced by rules are padded NULL
SOURCE_SCHEMAS = {
    "PERSON": (
        "cerner.person",
        "person_id bigint, active_ind int, sex_cd int, birth_dt_tm timestamp, deceased_dt_tm timestamp",
        {"birth_dt_tm", "deceased_dt_tm"},
    ),
    "ENCOUNTER": (
        "cerner.encounter",
        "encntr_id bigint, person_id bigint, loc_nurse_unit_cd bigint, loc_facility_cd bigint, active_ind bigint",
        set(),
    ),
    "ENCNTR_LOC_HIST": (
        "cerner.encntr_loc_hist",
        "encntr_loc_hist_id bigint, encntr_id bigint, loc_nurse_unit_cd bigint, loc_facility_cd bigint, active_ind bigint",
        set(),
    ),
    "DIAGNOSIS": (
        "cerner.diagnosis",
        "diagnosis_id bigint, person_id bigint, nomenclature_id bigint",
        set(),
    ),
    "PROBLEM": (
        "cerner.problem",
        "problem_instance_id bigint, person_id bigint, nomenclature_id bigint",
        set(),
    ),
    "ADDRESS": (
        "cerner.address",
        "address_id bigint, active_ind int, state string, zipcode string",
        set(),
    ),
    "NOMENCLATURE": (
        "cerner.nomenclature",
        "nomenclature_id bigint, source_identifier_keycap string, concept_cki string, source_vocabulary_cd bigint",
        set(),
    ),
    "CODE_VALUE": (
        "cerner.code_value",
        "code_value bigint, display string",
        set(),
    ),
    "OMOP.CONCEPT": (
        "omop.concept",
        "concept_id bigint, concept_code string, vocabulary_id string, domain_id string, standard_concept string",
        set(),
    ),
    "OMOP.CONCEPT_RELATIONSHIP": (
        "omop.concept_relationship",
        "concept_id_1 bigint, concept_id_2 bigint, relationship_id string",
        set(),
    ),
}

GOLDEN_DATE_COLS = {"death_datetime"}

CASES = [
    ("person", "OMOP.PERSON"),
    ("location", "OMOP.LOCATION"),
    ("visit_occurrence", "OMOP.VISIT_OCCURRENCE"),
    ("condition_occurrence", "OMOP.CONDITION_OCCURRENCE"),
]


def _coerce(value, spark_type):
    if value is None:
        return None
    if spark_type == "string":
        if isinstance(value, float) and value == int(value):
            return str(int(value))
        return str(value)
    if spark_type == "timestamp":
        if isinstance(value, (int, float)):
            return EXCEL_EPOCH + timedelta(days=float(value))
        return value
    if spark_type in ("bigint", "int"):
        return int(value)
    return value


def _register_workbook(engine, spark):
    wb = read_workbook(REFERENCE / "tests/data/mapping_test_data.xlsx")
    for sheet, (qualified, schema, date_cols) in SOURCE_SCHEMAS.items():
        header, rows = sheet_to_rows(wb[sheet], date_cols=date_cols)
        fields = [f.strip().split() for f in schema.split(",")]
        types = {name: typ for name, typ in fields}
        data = []
        for row in rows:
            rec = dict(zip(header, row))
            data.append(
                tuple(_coerce(rec.get(name), typ) for name, typ in fields)
            )
        engine.register_df(qualified, spark.createDataFrame(data, schema))
    # referenced by a condition_occurrence rule but empty in the fixture
    engine.register_df(
        "omop.vocabulary", spark.createDataFrame([], "vocabulary_id string")
    )
    _register_external_csvs(engine, spark)
    return wb


def _register_external_csvs(engine, spark):
    import csv

    for name in ("FACILITY_POSTCODE", "PERSON_ETHNICITY_CONCEPT"):
        path = REFERENCE / "external" / f"{name}.csv"
        with open(path, newline="", encoding="utf-8-sig") as f:
            reader = csv.DictReader(f)
            cols = [c.split(".")[-1].lower() for c in reader.fieldnames]
            rows = [tuple(r[k] or None for k in reader.fieldnames) for r in reader]
        int_cols = {"source_facility_cd", "target_postcode", "targetconceptid"}
        schema = ", ".join(
            f"{c} {'bigint' if c in int_cols else 'string'}" for c in cols
        )
        data = [
            tuple(
                int(v) if c in int_cols and v not in (None, "", " ") else (v if v not in ("",) else None)
                for c, v in zip(cols, row)
            )
            for row in rows
        ]
        engine.register_df(f"external.{name.lower()}", spark.createDataFrame(data, schema))


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, int):
        return float(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()[:19]
    s = str(v)
    try:
        return float(s)
    except ValueError:
        return s


@pytest.fixture(scope="module")
def workbook_results(spark):
    """Run all four validation rules once; reuse across cases."""
    from omop_etl_spark import Engine

    for db in spark.sql("SHOW DATABASES").collect():
        if db[0] != "default":
            spark.sql(f"DROP DATABASE IF EXISTS {db[0]} CASCADE")
    spark.sql("USE default")
    engine = Engine(spark)
    wb = _register_workbook(engine, spark)
    specs = [
        load_rules_text((REFERENCE / "validation" / f"{name}.yaml").read_text())
        for name, _ in CASES
    ]
    results = engine.run(specs)
    return wb, results


@pytest.mark.parametrize("rule,golden_sheet", CASES)
def test_golden_workbook(rule, golden_sheet, workbook_results):
    wb, results = workbook_results
    header, golden_rows = sheet_to_rows(wb[golden_sheet])
    target = results[golden_sheet.split(".")[-1].upper()]

    order_col = header[0]
    actual_rows = [
        tuple(getattr(r, c) for c in header)
        for r in target.orderBy(order_col).collect()
    ]
    assert len(actual_rows) == len(golden_rows), (
        f"{rule}: {len(actual_rows)} rows vs golden {len(golden_rows)}"
    )
    for j, col in enumerate(header):
        expected = [
            _norm(
                EXCEL_EPOCH + timedelta(days=row[j])
                if col in GOLDEN_DATE_COLS and isinstance(row[j], (int, float))
                else row[j]
            )
            for row in golden_rows
        ]
        actual = [_norm(row[j]) for row in actual_rows]
        assert actual == expected, f"{rule}.{col}: {actual} != {expected}"
