from .filter import filter_batch, compact, project
from .hashagg import AggSpec, group_aggregate, global_aggregate
from .join import hash_join
from .sort import sort_batch, limit_batch, SortKey

__all__ = [
    "filter_batch", "compact", "project", "AggSpec", "group_aggregate",
    "global_aggregate", "hash_join", "sort_batch", "limit_batch", "SortKey",
]
