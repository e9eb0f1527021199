"""Sparse-matrix ingest: MatrixMarket loading and COO->CSR conversion.

The hot path is the native C++ library ``native/libnmf_host.so``
(multithreaded mmap-free parser + counting-sort CSR build), reached through
ctypes; a pure-numpy fallback keeps everything working when the library has
not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import NamedTuple

import numpy as np

__all__ = [
    "load_mtx", "coo_to_csr", "native_available", "to_bcoo",
    "stable_argsort", "gather3", "gather3k", "dense_scatter",
    "tile_key", "chunk_fill", "class_extract",
]

_LIB = None
_LIB_TRIED = False


class _MtxResult(ctypes.Structure):
    _fields_ = [
        ("rows", ctypes.c_int64),
        ("cols", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("row_idx", ctypes.POINTER(ctypes.c_int32)),
        ("col_idx", ctypes.POINTER(ctypes.c_int32)),
        ("values", ctypes.POINTER(ctypes.c_float)),
        ("error", ctypes.c_int32),
    ]


def _load_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libnmf_host.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.nmf_load_mtx.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MtxResult)]
        lib.nmf_load_mtx.restype = ctypes.c_int32
        lib.nmf_free.argtypes = [ctypes.c_void_p]
        lib.nmf_coo_to_csr.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
        ]
        lib.nmf_coo_to_csr.restype = ctypes.c_int64
        lib.nmf_argsort64.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
        ]
        lib.nmf_argsort64.restype = ctypes.c_int64
        lib.nmf_gather3.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
        ]
        lib.nmf_gather3.restype = None
        lib.nmf_dense_scatter.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
        ]
        lib.nmf_dense_scatter.restype = None
        lib.nmf_tile_key.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
        ]
        lib.nmf_tile_key.restype = None
        lib.nmf_gather3k.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
        ]
        lib.nmf_gather3k.restype = None
        lib.nmf_chunk_fill.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
        ]
        lib.nmf_chunk_fill.restype = None
        lib.nmf_class_extract.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int64),
        ]
        lib.nmf_class_extract.restype = None
        _LIB = lib
    except (OSError, AttributeError):
        # AttributeError: a stale libnmf_host.so built before a symbol was
        # added — fall back to numpy rather than crash (rebuild with
        # `make -C native` to re-enable the native path)
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load_lib() is not None


class COO(NamedTuple):
    rows: int
    cols: int
    row_idx: np.ndarray
    col_idx: np.ndarray
    values: np.ndarray


class CSR(NamedTuple):
    rows: int
    cols: int
    indptr: np.ndarray
    indices: np.ndarray
    data: np.ndarray


def load_mtx(path: str) -> COO:
    """Parse a MatrixMarket coordinate file into COO arrays."""
    lib = _load_lib()
    if lib is not None:
        res = _MtxResult()
        rc = lib.nmf_load_mtx(str(path).encode(), ctypes.byref(res))
        if rc == 0:
            n = res.nnz
            ri = np.ctypeslib.as_array(res.row_idx, (n,)).copy()
            ci = np.ctypeslib.as_array(res.col_idx, (n,)).copy()
            v = np.ctypeslib.as_array(res.values, (n,)).copy()
            lib.nmf_free(res.row_idx)
            lib.nmf_free(res.col_idx)
            lib.nmf_free(res.values)
            return COO(int(res.rows), int(res.cols), ri, ci, v)
        if rc == 2:
            raise ValueError(f"Unsupported MatrixMarket format: {path}")
        # rc == 1: IO error -> fall through to numpy for the error message
    return _load_mtx_numpy(path)


def _load_mtx_numpy(path: str) -> COO:
    import scipy.io

    m = scipy.io.mmread(path).tocoo()
    return COO(
        m.shape[0],
        m.shape[1],
        m.row.astype(np.int32),
        m.col.astype(np.int32),
        m.data.astype(np.float32),
    )


def coo_to_csr(coo: COO) -> CSR:
    """COO -> CSR with duplicate summing."""
    lib = _load_lib()
    nnz = len(coo.values)
    if lib is not None:
        indptr = np.zeros(coo.rows + 1, np.int64)
        indices = np.empty(nnz, np.int32)
        data = np.empty(nnz, np.float32)
        new_nnz = lib.nmf_coo_to_csr(
            coo.rows,
            nnz,
            np.ascontiguousarray(coo.row_idx, np.int32),
            np.ascontiguousarray(coo.col_idx, np.int32),
            np.ascontiguousarray(coo.values, np.float32),
            indptr,
            indices,
            data,
        )
        return CSR(coo.rows, coo.cols, indptr, indices[:new_nnz], data[:new_nnz])
    import scipy.sparse

    m = scipy.sparse.coo_matrix(
        (coo.values, (coo.row_idx, coo.col_idx)), shape=(coo.rows, coo.cols)
    ).tocsr()
    m.sum_duplicates()
    return CSR(
        coo.rows,
        coo.cols,
        m.indptr.astype(np.int64),
        m.indices.astype(np.int32),
        m.data.astype(np.float32),
    )


def stable_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of a non-negative int64 key array — the native
    parallel radix sort when available (measured ~4x numpy's stable sort on
    the 17.6M-key config4 tile keys), numpy otherwise."""
    lib = _load_lib()
    keys = np.ascontiguousarray(keys, np.int64)
    # The radix path orders two's-complement digits, which puts negative
    # keys AFTER positives — guard with one cheap O(n) min scan (all current
    # call sites build non-negative fused tile keys, but a silent
    # size-and-build-dependent ordering would be a brutal debug).
    if (
        lib is not None
        and (1 << 16) <= len(keys) < (1 << 31)
        and int(keys.min(initial=0)) >= 0
    ):
        order = np.empty(len(keys), np.int64)
        lib.nmf_argsort64(len(keys), keys, order)
        return order
    return np.argsort(keys, kind="stable")


def gather3(order, r, c, v):
    """(r[order], c[order], v[order]) in one parallel native pass."""
    lib = _load_lib()
    if lib is None or len(order) < (1 << 16):
        return r[order], c[order], v[order]
    n = len(order)
    ro = np.empty(n, np.int32)
    co = np.empty(n, np.int32)
    vo = np.empty(n, np.float32)
    lib.nmf_gather3(
        n, np.ascontiguousarray(order, np.int64),
        np.ascontiguousarray(r, np.int32),
        np.ascontiguousarray(c, np.int32),
        np.ascontiguousarray(v, np.float32), ro, co, vo,
    )
    return ro, co, vo


def dense_scatter(dvals: np.ndarray, blk, lcol, lrow, v):
    """dvals[blk, lcol, lrow] = v (unique positions), parallel native."""
    lib = _load_lib()
    if (lib is None or len(blk) < (1 << 16)
            or not dvals.flags.c_contiguous):
        # non-contiguous dvals: reshape(-1) would copy and the native
        # writes would land in the temporary — use the numpy path
        dvals[blk, lcol, lrow] = v
        return
    lib.nmf_dense_scatter(
        len(blk), np.ascontiguousarray(blk, np.int64),
        np.ascontiguousarray(lcol, np.int32),
        np.ascontiguousarray(lrow, np.int32),
        np.ascontiguousarray(v, np.float32),
        dvals.reshape(-1),
    )


def tile_key(rows, cols, n_colpanels: int, stripe_tiles: int):
    """Fused tile key ((r//128)//st * ncp + c//128)*st + (r//128)%st in one
    native pass (five numpy passes otherwise)."""
    lib = _load_lib()
    if lib is None or len(rows) < (1 << 16):
        rp = rows // 128
        return (
            (rp // stripe_tiles).astype(np.int64) * n_colpanels + cols // 128
        ) * stripe_tiles + rp % stripe_tiles
    out = np.empty(len(rows), np.int64)
    lib.nmf_tile_key(
        len(rows), np.ascontiguousarray(rows, np.int32),
        np.ascontiguousarray(cols, np.int32), n_colpanels, stripe_tiles, out,
    )
    return out


def gather3k(order, r, c, v, k):
    """(r[order], c[order], v[order], k[order]) in one parallel pass."""
    lib = _load_lib()
    if lib is None or len(order) < (1 << 16):
        return r[order], c[order], v[order], k[order]
    n = len(order)
    ro = np.empty(n, np.int32)
    co = np.empty(n, np.int32)
    vo = np.empty(n, np.float32)
    ko = np.empty(n, np.int64)
    lib.nmf_gather3k(
        n, np.ascontiguousarray(order, np.int64),
        np.ascontiguousarray(r, np.int32),
        np.ascontiguousarray(c, np.int32),
        np.ascontiguousarray(v, np.float32),
        np.ascontiguousarray(k, np.int64), ro, co, vo, ko,
    )
    return ro, co, vo, ko


def chunk_fill(t_first, counts, base, s_rows, s_cols, s_vals, cwidth,
               coords, vals):
    """Per-tile chunk-slot assignment + coords/vals fill in one native pass
    over the tile-sorted residual; returns the flat slot id per nonzero.
    ``coords``/``vals`` are the flat (nchunks*128,) chunk-store arrays
    (modified in place); the numpy fallback reproduces the original
    pos_in_tile / chunk-index arithmetic exactly."""
    lib = _load_lib()
    nnz = len(s_rows)
    if lib is not None and nnz >= (1 << 16) and coords.flags.c_contiguous             and vals.flags.c_contiguous:
        slot = np.empty(nnz, np.int64)
        lib.nmf_chunk_fill(
            len(t_first), np.ascontiguousarray(t_first, np.int64),
            np.ascontiguousarray(counts, np.int64),
            np.ascontiguousarray(base, np.int64),
            np.ascontiguousarray(s_rows, np.int32),
            np.ascontiguousarray(s_cols, np.int32),
            np.ascontiguousarray(s_vals, np.float32),
            cwidth, coords, vals, slot,
        )
        return slot
    pos = np.arange(nnz, dtype=np.int64) - np.repeat(t_first, counts)
    slot = (np.repeat(base, counts) + pos // 128) * 128 + pos % 128
    coords[slot] = ((s_cols % cwidth) << 7 | (s_rows % 128)).astype(np.int32)
    vals[slot] = s_vals
    return slot


def class_extract(t_first, counts, dst, a_rows, a_cols, a_vals, order):
    """Copy each tile's contiguous run of the sorted arrays to its class's
    region (dst[t] = destination offset of tile t), gathering the CSR ids
    (``order``) along — one native pass; the numpy fallback scatters via a
    per-entry destination index."""
    n = len(a_rows)
    ro = np.empty(n, np.int32)
    co = np.empty(n, np.int32)
    vo = np.empty(n, np.float32)
    oo = np.empty(n, np.int64)
    lib = _load_lib()
    if lib is not None and n >= (1 << 16):
        lib.nmf_class_extract(
            len(t_first), np.ascontiguousarray(t_first, np.int64),
            np.ascontiguousarray(counts, np.int64),
            np.ascontiguousarray(dst, np.int64),
            np.ascontiguousarray(a_rows, np.int32),
            np.ascontiguousarray(a_cols, np.int32),
            np.ascontiguousarray(a_vals, np.float32),
            np.ascontiguousarray(order, np.int64), ro, co, vo, oo,
        )
        return ro, co, vo, oo
    d = np.repeat(dst, counts) + (
        np.arange(n, dtype=np.int64) - np.repeat(t_first, counts)
    )
    ro[d] = a_rows
    co[d] = a_cols
    vo[d] = a_vals
    oo[d] = order
    return ro, co, vo, oo


def to_bcoo(x, dtype=np.float32):
    """COO/CSR -> jax BCOO (sorted, deduped)."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    if isinstance(x, CSR):
        rows = np.repeat(
            np.arange(x.rows, dtype=np.int32), np.diff(x.indptr).astype(np.int64)
        )
        idx = np.stack([rows, x.indices], axis=1)
        vals = x.data
        shape = (x.rows, x.cols)
        return jsparse.BCOO(
            (jnp.asarray(vals, dtype), jnp.asarray(idx)),
            shape=shape,
            indices_sorted=True,
            unique_indices=True,
        )
    csr = coo_to_csr(x)
    return to_bcoo(csr, dtype)
