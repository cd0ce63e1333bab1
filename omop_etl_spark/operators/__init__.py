from .dedup import exact_dedup, dedup_groups

__all__ = ["exact_dedup", "dedup_groups"]
