"""Web-API parity: rule JSON → compiled artifacts + warnings.

The reference exposes ``POST /api/translate`` (reference api.py:43-45):
the body deserializes straight into a table rule, the response is
``{script, warnings}`` where warnings flag required OMOP columns the
rule does not populate (api.py:19-40, driven by
schema/required_omop_columns.csv, schema.py:44-52).

Our engine is DataFrame-native, so the "script" is the inspectable
compiled artifact set (per-source mapping SQL + per-rule match SQL) —
the same text the ``translate`` CLI prints. The transport layer is
optional: :func:`translate_rule` is a pure function; :func:`create_app`
wraps it in FastAPI only when that package is installed (it is not a
dependency of this repo).
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Any, Mapping

from .planner.compiler import TableCompiler
from .rules.model import ExpressionRule, TableSpec, parse_spec

__all__ = ["translate_rule", "load_required_columns_csv", "create_app"]


def load_required_columns_csv(path: str | Path) -> dict[str, set[str]]:
    """(table → required columns) from the reference-format CSV
    (``table,column`` header; reference schema.py:44-52)."""
    required: dict[str, set[str]] = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            required.setdefault(row["table"].strip().lower(), set()).add(
                row["column"].strip().lower()
            )
    return required


def _render_script(spec: TableSpec) -> str:
    compiler = TableCompiler(spark=None, spec=spec)
    lines = [f"-- table: {spec.name} (pk {spec.primary_key.name})"]
    for src_name, src in spec.primary_key.sources.items():
        lines.append(f"-- mapping source {src_name}:")
        lines.append(compiler.source_select_sql(src))
    for rule in spec.columns:
        if isinstance(rule, ExpressionRule):
            lines.append(f"-- column {rule.name} [{rule.primary_key}]:")
            lines.append(compiler.match_sql(rule))
    return "\n".join(lines)


def translate_rule(
    payload: Mapping[str, Any],
    required_columns: Mapping[str, set[str]] | None = None,
) -> dict[str, Any]:
    """Translate one table-rule mapping (already-parsed JSON/YAML) into
    ``{"script": str, "warnings": [str, ...]}``.

    Warning text mirrors the reference's check (api.py:19-40): one
    entry per required column of the target table that no enabled rule
    populates (the surrogate pk itself is always populated by the
    skeleton phase and never warned about).
    """
    spec = parse_spec(dict(payload))
    if not isinstance(spec, TableSpec):
        return {"script": "-- dependency file (scripts/temp tables only)", "warnings": []}
    warnings = []
    if required_columns:
        populated = {c.lower() for c in spec.column_order}
        populated.add(spec.primary_key.name.lower())
        for col in sorted(required_columns.get(spec.name.lower(), set()) - populated):
            warnings.append(f"required column '{col}' of '{spec.name}' is not populated")
    return {"script": _render_script(spec), "warnings": warnings}


def create_app(required_columns_csv: str | Path | None = None):
    """FastAPI app exposing ``POST /api/translate`` — import-gated:
    raises ImportError with guidance when fastapi is absent."""
    try:
        from fastapi import FastAPI
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "fastapi is not installed; use omop_etl_spark.api.translate_rule "
            "directly or install fastapi to serve it"
        ) from exc

    required = (
        load_required_columns_csv(required_columns_csv)
        if required_columns_csv
        else None
    )
    app = FastAPI(title="omop-etl-spark")

    @app.post("/api/translate")
    def translate(payload: dict) -> dict:  # pragma: no cover - thin wrapper
        return translate_rule(payload, required)

    return app
