"""omop_etl_spark — a PySpark-native metadata-driven ETL + analytics engine.

A from-scratch Spark implementation of the capabilities of the
clinical-ai/omop-etl reference (a YAML→PostgreSQL SQL compiler): the
same YAML data-manipulation language, executed directly on Spark
DataFrames through Catalyst instead of compiled to a Postgres script —
plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.
"""

from .engine import Engine
from .rules.loader import load_rules_dir, load_rules_text
from .rules.model import TableSpec, DependencySpec, RuleError

__all__ = [
    "Engine",
    "load_rules_dir",
    "load_rules_text",
    "TableSpec",
    "DependencySpec",
    "RuleError",
]

__version__ = "0.1.0"
