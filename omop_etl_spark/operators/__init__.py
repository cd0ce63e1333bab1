from .chunking import chunk_documents, tfidf_topk
from .dedup import exact_dedup, dedup_groups
from .sampling import hash_split, pack_sequences, stratified_sample, unit_hash

__all__ = [
    "chunk_documents",
    "tfidf_topk",
    "exact_dedup",
    "dedup_groups",
    "hash_split",
    "pack_sequences",
    "stratified_sample",
    "unit_hash",
]
