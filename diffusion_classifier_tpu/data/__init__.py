from .loader import ArrayDataLoader, MapDataLoader, Prefetcher
from .synthetic import SyntheticDataLoader, make_synthetic_arrays

__all__ = [
    "ArrayDataLoader",
    "MapDataLoader",
    "Prefetcher",
    "SyntheticDataLoader",
    "make_synthetic_arrays",
]
