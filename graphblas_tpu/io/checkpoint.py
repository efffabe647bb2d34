"""Checkpoint / resume: matrix serialization.

The reference's persistence story is O(1) import/export of raw arrays
plus triplet text files (SURVEY §5 "Checkpoint/resume").  This module
adds the binary form: matrices round-trip through ``.npz`` (CSR arrays +
dtype tag), vectors likewise.  Works for any builtin type; UDTs save one
array per field.
"""

from __future__ import annotations

import numpy as np

from ..core.io_export import export_csr, import_csr
from ..core.matrix import Matrix, Vector
from ..core.types import Type, type_of_dtype

__all__ = ["save_matrix", "load_matrix", "save_vector", "load_vector"]


def _flatten_udt(X, prefix=""):
    out = {}
    for k, v in X.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_udt(v, key + "."))
        else:
            out[key] = v
    return out


def save_matrix(path, A) -> None:
    """Serialize a Matrix/CsrMatrix to .npz (CSR arrays; UDTs save one
    array per (possibly nested) field)."""
    if isinstance(A, Matrix) and A.type.is_udt:
        I, J, X = A.extractTuples()
        fields = {f"field.{k}": v for k, v in _flatten_udt(X).items()}
        np.savez_compressed(path, kind="udt", typename=A.type.name,
                            nrows=A.nrows, ncols=A.ncols, I=I, J=J,
                            **fields)
        return
    nr, nc, p, j, x = export_csr(A)
    np.savez_compressed(path, kind="csr", nrows=nr, ncols=nc,
                        indptr=p, indices=j, values=x)


def load_matrix(path, type: Type = None, as_csr: bool = False):
    """Load a matrix saved by :func:`save_matrix`.  UDT archives need
    the matching ``type`` passed in (the Type carries the field map)."""
    z = np.load(path, allow_pickle=False)
    if str(z["kind"]) == "udt":
        if type is None or not type.is_udt:
            raise ValueError("loading a UDT archive requires type=")
        nr, nc = int(z["nrows"]), int(z["ncols"])
        I, J = z["I"], z["J"]
        M = Matrix.new(type, nr, nc)

        def field(t, prefix=""):
            return {k: (field(ft, f"{prefix}{k}.") if ft.is_udt else
                        z[f"field.{prefix}{k}"])
                    for k, ft in t.fields}
        X = field(type)
        for k in range(len(I)):
            val = _index_udt(X, int(k))
            M = M.setElement(val, int(I[k]), int(J[k]), blocking=False)
        return M.wait()
    nr, nc = int(z["nrows"]), int(z["ncols"])
    t = type or type_of_dtype(z["values"].dtype)
    C = import_csr(nr, nc, z["indptr"], z["indices"], z["values"], t)
    return C if as_csr else C.to_matrix()


def _index_udt(X, k):
    return {key: (_index_udt(v, k) if isinstance(v, dict) else v[k])
            for key, v in X.items()}


def save_vector(path, v: Vector) -> None:
    I, X = v.extractTuples()
    np.savez_compressed(path, kind="vec", n=v.size, I=I, X=X)


def load_vector(path, type: Type = None) -> Vector:
    z = np.load(path, allow_pickle=False)
    t = type or type_of_dtype(z["X"].dtype)
    return Vector.from_coo(z["I"], z["X"], int(z["n"]), type=t)
