from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.data.graph import (
    SparseGraph,
    normalized_adjacency,
    normalized_adjacency_with_self,
    normalized_rectangular,
    generalized_normalized_adjacency,
)

__all__ = [
    "Dataset",
    "SparseGraph",
    "normalized_adjacency",
    "normalized_adjacency_with_self",
    "normalized_rectangular",
    "generalized_normalized_adjacency",
]
