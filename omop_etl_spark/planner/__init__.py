from .compiler import TableCompiler, MAPPING_SCHEMA, TARGET_SCHEMA
from .surrogate import with_surrogate_id

__all__ = ["TableCompiler", "MAPPING_SCHEMA", "TARGET_SCHEMA", "with_surrogate_id"]
