from .metrics import evaluation, format_results_table, k_reciprocal, rank

__all__ = ["evaluation", "format_results_table", "k_reciprocal", "rank"]
