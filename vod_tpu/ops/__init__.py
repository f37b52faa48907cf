"""Pure-JAX numeric kernels (replaces the reference's numba kernels in
`src/vod_dataloaders/core/` with vmap/jit-able XLA programs)."""

from .numpy_ops import (
    gather_values_by_indices,
    masked_log_softmax,
    masked_softmax,
    normalize_scores,
    replace_negative_indices,
)
from .merge import merge_search_results
from .sample import (
    PrioritySampledSections,
    labeled_priority_sampling,
    priority_sampling,
    sample_search_results,
)

__all__ = [
    "PrioritySampledSections",
    "gather_values_by_indices",
    "labeled_priority_sampling",
    "masked_log_softmax",
    "masked_softmax",
    "merge_search_results",
    "normalize_scores",
    "priority_sampling",
    "replace_negative_indices",
    "sample_search_results",
]
