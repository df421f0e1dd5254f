"""Compressed-stream search: per-block bloom tables (SPEC_SEARCH.md).

Round-1 scope: table types 1-4, uncompressed table chunks (0x45), reductions,
boundary-overlap indexing, BlockSearcher with the first-window boundary rule
and the no-false-negatives invariant.  Compressed tables (0x46, huff0) and
sidecar streams (0x47) are roadmap items.
"""

from .table import SearchTableConfig, hash_value
from .build import build_table
from .searcher import BlockSearcher, SearchResult, SearchStats

__all__ = [
    "SearchTableConfig",
    "hash_value",
    "build_table",
    "BlockSearcher",
    "SearchResult",
    "SearchStats",
]
