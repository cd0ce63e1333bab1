from .dedup import exact_dedup, dedup_groups
from .sampling import hash_split, pack_sequences, stratified_sample, unit_hash

__all__ = [
    "exact_dedup",
    "dedup_groups",
    "hash_split",
    "pack_sequences",
    "stratified_sample",
    "unit_hash",
]
