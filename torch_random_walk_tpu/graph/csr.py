"""CSR graph container and builders.

Replaces the reference's ``torch_rw/utils.py:5-18`` (``to_csr`` /
``nodes_tensor``) with O(E log E) NumPy construction instead of the quadratic
``list.index`` loops, and adds the invariants the TPU kernels rely on:

- ``col_idx`` is sorted *within each row*, enabling O(log deg) binary-search
  neighbor membership tests (vs the reference's O(deg) linear scan,
  /root/reference/csrc/cpu/rw_cpu.cpp:32-56).
- ids default to int32 (TPU-friendly; ogbn-scale node ids fit) — a documented
  deviation from the reference's int64 contract (SURVEY.md §5 dtype contract).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Compressed-sparse-row adjacency.

    row_ptr: (num_nodes + 1,) int — row offsets into col_idx.
    col_idx: (num_edges,) int — neighbor ids, sorted within each row.
    """

    row_ptr: jnp.ndarray
    col_idx: jnp.ndarray
    # Static metadata (Python ints — usable as static values under jit).
    num_nodes: int
    num_edges: int
    max_degree: int

    @property
    def search_iters(self) -> int:
        """Static trip count for binary search over one row: ceil(log2(max_deg))+1."""
        return max(1, int(math.ceil(math.log2(max(self.max_degree, 2)))) + 1)

    @classmethod
    def from_arrays(cls, row_ptr, col_idx, sort_rows: bool = True) -> "CSRGraph":
        row_ptr = np.asarray(row_ptr)
        col_idx = np.asarray(col_idx)
        num_nodes = int(row_ptr.shape[0]) - 1
        degrees = np.diff(row_ptr)
        if sort_rows and col_idx.size:
            # Sort neighbor ids within each row (required for binary search).
            order = np.lexsort((col_idx, np.repeat(np.arange(num_nodes), degrees)))
            col_idx = col_idx[order]
        dtype = np.int32 if num_nodes < 2**31 and col_idx.size < 2**31 else np.int64
        return cls(
            row_ptr=jnp.asarray(row_ptr.astype(dtype)),
            col_idx=jnp.asarray(col_idx.astype(dtype)),
            num_nodes=num_nodes,
            num_edges=int(col_idx.shape[0]),
            max_degree=int(degrees.max()) if num_nodes else 0,
        )

    @classmethod
    def from_edges(
        cls, src, dst, num_nodes: int | None = None, symmetrize: bool = False
    ) -> "CSRGraph":
        """Build from raw edge arrays (the scalable path for ogbn-scale graphs)."""
        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        if num_nodes is None:
            num_nodes = int(max(src.max(), dst.max())) + 1 if src.size else 0
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        counts = np.bincount(src, minlength=num_nodes)
        row_ptr = np.zeros(num_nodes + 1, np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return cls.from_arrays(row_ptr, dst, sort_rows=False)

    @classmethod
    def from_networkx(cls, graph) -> "CSRGraph":
        """Adjacency in graph.nodes() order, matching the reference's
        ``nx.to_scipy_sparse_matrix`` node ordering (torch_rw/utils.py:6)."""
        import scipy.sparse  # noqa: F401  (nx needs scipy for this)
        import networkx as nx

        csr = nx.to_scipy_sparse_array(graph, format="csr")
        return cls.from_arrays(csr.indptr, csr.indices)


def to_csr(graph):
    """Reference-parity helper (torch_rw/utils.py:5): networkx graph ->
    (row_ptr, col_idx) arrays."""
    g = CSRGraph.from_networkx(graph)
    return g.row_ptr, g.col_idx


def nodes_tensor(graph):
    """Reference-parity helper (torch_rw/utils.py:11): node indices 0..N-1
    in insertion order — O(N) instead of the reference's O(N^2) loop."""
    return jnp.arange(len(graph.nodes()), dtype=jnp.int32)
