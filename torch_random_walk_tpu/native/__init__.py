"""ctypes bindings for the native graph-preprocessing runtime.

Loads ``libtrw_native.so`` (built by ``make -C csrc``; see
csrc/graph_native.cpp for what lives there and why it's C++).  Every entry
point has a NumPy fallback so the framework works — slower — without the
native build; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _build():
    """Best-effort `make -C csrc` for fresh checkouts (silent on failure)."""
    import subprocess

    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    if not os.path.exists(os.path.join(csrc, "Makefile")):
        return
    try:
        subprocess.run(["make", "-C", csrc], check=True, timeout=120,
                       capture_output=True)
    except Exception:
        pass


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(__file__), "libtrw_native.so")
    if not os.path.exists(path):
        _build()
    if not os.path.exists(path):
        _LIB = False
        return False
    lib = ctypes.CDLL(path)
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.rw_build_csr.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64,
                                 i64p, i32p]
    lib.rw_build_csr.restype = ctypes.c_int
    lib.rw_pack_fat.argtypes = [i64p, i32p, ctypes.c_int64, ctypes.c_int64,
                                ctypes.c_int, ctypes.c_int, u32p, u32p]
    lib.rw_pack_fat.restype = ctypes.c_int
    lib.rw_cuckoo_build.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int,
                                    u32p]
    lib.rw_cuckoo_build.restype = ctypes.c_int
    if hasattr(lib, "rw_pack_fat6"):  # absent in stale prebuilt .so files
        lib.rw_pack_fat6.argtypes = [i64p, i32p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int,
                                     ctypes.c_int, ctypes.c_int, u32p, u32p]
        lib.rw_pack_fat6.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def build_csr(src, dst, num_nodes: int):
    """(src, dst) int64 edge arrays -> (row_ptr int64, col_idx int32 or
    int64), sorted by (src, dst).  Native parallel radix sort when available
    and ids fit 32 bits; ids >= 2^31 take a NumPy int64 path."""
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    e = src.shape[0]
    if e and (src.min() < 0 or dst.min() < 0 or src.max() >= num_nodes
              or dst.max() >= num_nodes):
        raise ValueError(
            f"edge ids out of range [0, {num_nodes}): "
            f"src in [{src.min()}, {src.max()}], "
            f"dst in [{dst.min()}, {dst.max()}]")
    lib = _load()
    if lib and num_nodes < 2**31:
        row_ptr = np.empty(num_nodes + 1, np.int64)
        col_idx = np.empty(e, np.int32)
        rc = lib.rw_build_csr(src, dst, e, num_nodes, row_ptr, col_idx)
        if rc == 0:
            return row_ptr, col_idx
    order = np.lexsort((dst, src))
    sdst = dst[order]
    counts = np.bincount(src, minlength=num_nodes)
    row_ptr = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    return row_ptr, (sdst.astype(np.int32) if num_nodes < 2**31 else sdst)


def pack_fat(row_ptr, col_idx, node_bits: int, start_bits: int):
    """CSR -> ((E, 2) edge_tab, (N, 2) node_tab) packed uint32 fat tables."""
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    n = row_ptr.shape[0] - 1
    e = col_idx.shape[0]
    lib = _load()
    if lib:
        edge_tab = np.empty((e, 2), np.uint32)
        node_tab = np.empty((n, 2), np.uint32)
        rc = lib.rw_pack_fat(row_ptr, col_idx, n, e, node_bits, start_bits,
                             edge_tab, node_tab)
        if rc == 0:
            return edge_tab, node_tab

    def pack(node, start, deg):
        v = (node.astype(np.uint64)
             | (start.astype(np.uint64) << np.uint64(node_bits))
             | (deg.astype(np.uint64) << np.uint64(node_bits + start_bits)))
        return np.stack([(v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                         (v >> np.uint64(32)).astype(np.uint32)], axis=-1)

    starts = row_ptr[:-1]
    degs = np.diff(row_ptr)
    return (pack(col_idx.astype(np.int64), starts[col_idx], degs[col_idx]),
            pack(np.arange(n), starts, degs))


def pack_fat6(row_ptr, col_idx, node_bits: int, start_bits: int,
              bloom_words: int = 3):
    """CSR -> ((E, W) edge_tab6, (N, W) node_tab6) wide fat tables for the
    free-running biased engine, W = 2 + bloom_words + 1 (packed meta +
    neighbor Bloom + edge multiplicities — see ops/walk.fat6_for for the
    row layout and the degree-based width choice).  Returns None when the
    native library is unavailable; the caller falls back to the NumPy
    build (bit-identical, minutes slower at 100M+ edges)."""
    lib = _load()
    if not lib or not hasattr(lib, "rw_pack_fat6"):
        return None
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    n = row_ptr.shape[0] - 1
    e = col_idx.shape[0]
    width = 2 + bloom_words + 1
    edge_tab6 = np.empty((e, width), np.uint32)
    node_tab6 = np.empty((n, width), np.uint32)
    rc = lib.rw_pack_fat6(row_ptr, col_idx, n, e, node_bits, start_bits,
                          bloom_words, edge_tab6, node_tab6)
    if rc != 0:
        return None
    return edge_tab6, node_tab6


def cuckoo_build(src, dst, log_size: int):
    """Edge keys -> ((S, 2) uint32 cuckoo table, salt) or None on failure.
    Bit-compatible with graph/hashset.py (same hash family and layout)."""
    lib = _load()
    if not lib:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    table = np.empty((1 << log_size, 2), np.uint32)
    salt = lib.rw_cuckoo_build(src, dst, src.shape[0], log_size, table)
    if salt < 0:
        return None
    return table, int(salt)
