from .loader import (
    ArrayDataLoader,
    MapDataLoader,
    Prefetcher,
    iter_item_batches,
)
from .synthetic import SyntheticDataLoader, make_synthetic_arrays

__all__ = [
    "ArrayDataLoader",
    "MapDataLoader",
    "Prefetcher",
    "SyntheticDataLoader",
    "iter_item_batches",
    "make_synthetic_arrays",
]
