"""I/O: triplet files (the demo interchange format), MatrixMarket, and
the native C parser bridge."""

from .read import (read_triplets, read_matrix, write_triplets, mmread,
                   get_matrix)
from .native import native_lib
from .checkpoint import save_matrix, load_matrix, save_vector, load_vector

__all__ = ["read_triplets", "read_matrix", "write_triplets", "mmread",
           "get_matrix", "native_lib", "save_matrix", "load_matrix",
           "save_vector", "load_vector"]
