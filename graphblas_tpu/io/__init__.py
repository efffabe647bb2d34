"""I/O: triplet files (the demo interchange format), MatrixMarket, and
the native C parser bridge."""

from .read import (read_triplets, read_matrix, write_triplets, mmread,
                   get_matrix)
from .native import native_lib

__all__ = ["read_triplets", "read_matrix", "write_triplets", "mmread",
           "get_matrix", "native_lib"]
