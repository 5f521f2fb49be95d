from .optim import compare_trees, count_nonfinite, tree_stats
from .summary import batch_summary

__all__ = ["compare_trees", "count_nonfinite", "tree_stats", "batch_summary"]
