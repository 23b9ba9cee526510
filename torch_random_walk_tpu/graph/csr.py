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
class PackedLayout:
    """Static bit layout of the fat tables (see ``CSRGraph.edge_tab``).

    A row packs ``(node, start, deg)`` into one 64-bit value split across two
    uint32 words:  V = node | start << node_bits | deg << (node_bits +
    start_bits).  All widths are Python ints, so jitted kernels specialize on
    the layout and unpacking compiles to a couple of VPU shifts.
    """

    node_bits: int
    start_bits: int
    deg_bits: int

    @property
    def fits(self) -> bool:
        # Total must pack into 64 bits AND every field must survive the
        # int32 cast in unpack (field values < 2^31).
        return (self.node_bits + self.start_bits + self.deg_bits <= 64
                and max(self.node_bits, self.start_bits, self.deg_bits) <= 31)

    def pack_np(self, node, start, deg) -> np.ndarray:
        """(k,) int arrays -> (k, 2) uint32 packed rows (host-side)."""
        v = (
            np.asarray(node, np.uint64)
            | (np.asarray(start, np.uint64) << np.uint64(self.node_bits))
            | (np.asarray(deg, np.uint64)
               << np.uint64(self.node_bits + self.start_bits))
        )
        lo = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (v >> np.uint64(32)).astype(np.uint32)
        return np.stack([lo, hi], axis=-1)

    def _extract(self, w0, w1, offset: int, bits: int):
        """Extract a field from two uint32 words; static offset/width."""
        mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
        if offset >= 32:
            word = w1 >> jnp.uint32(offset - 32)
        elif offset + bits <= 32:
            word = w0 >> jnp.uint32(offset)
        else:
            word = (w0 >> jnp.uint32(offset)) | (w1 << jnp.uint32(32 - offset))
        return (word & mask).astype(jnp.int32)

    def unpack(self, rows):
        """(k, 2) uint32 rows -> (node, start, deg) int32 arrays (in-kernel)."""
        w0 = rows[..., 0]
        w1 = rows[..., 1]
        node = self._extract(w0, w1, 0, self.node_bits)
        start = self._extract(w0, w1, self.node_bits, self.start_bits)
        deg = self._extract(w0, w1, self.node_bits + self.start_bits,
                            self.deg_bits)
        return node, start, deg


def _bits_for(n: int) -> int:
    return max(1, int(n - 1).bit_length()) if n > 1 else 1


@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Compressed-sparse-row adjacency.

    row_ptr: (num_nodes + 1,) int — row offsets into col_idx.
    col_idx: (num_edges,) int — neighbor ids, sorted within each row.

    Fat tables (the TPU hot path; see ops/fatwalk.py): the walk engine's
    measured bottleneck is the TPU gather engine's *row rate*, and an (E, 2)
    row gather runs ~2.6x faster than a scalar gather — so each walk step is
    ONE row gather from ``edge_tab`` instead of three scalar gathers
    (row_ptr[cur], row_ptr[cur+1], col_idx[idx]).  ``edge_tab[e]`` packs
    (dst, row_ptr[dst], deg[dst]) of edge e's destination: after gathering it
    you already hold everything needed for the *next* step.  ``node_tab[v]``
    packs the same for node v (walk entry).
    """

    row_ptr: jnp.ndarray
    col_idx: jnp.ndarray
    # Static metadata (Python ints — usable as static values under jit).
    num_nodes: int
    num_edges: int
    max_degree: int
    # Fat-table hot path (None when the packed fields exceed 64 bits total
    # or any single field exceeds 31 bits, e.g. >= 2^31 edges;
    # kernels then fall back to the scalar-gather path).
    layout: PackedLayout | None = None
    edge_tab: jnp.ndarray | None = None  # (E, 2) uint32
    node_tab: jnp.ndarray | None = None  # (N, 2) uint32

    @property
    def search_iters(self) -> int:
        """Static trip count for binary search over one row: ceil(log2(max_deg))+1."""
        return max(1, int(math.ceil(math.log2(max(self.max_degree, 2)))) + 1)

    @classmethod
    def from_arrays(cls, row_ptr, col_idx, sort_rows: bool = True,
                    build_fat: bool = True) -> "CSRGraph":
        row_ptr = np.asarray(row_ptr)
        col_idx = np.asarray(col_idx)
        num_nodes = int(row_ptr.shape[0]) - 1
        num_edges = int(col_idx.shape[0])
        degrees = np.diff(row_ptr)
        if sort_rows and col_idx.size:
            # Sort neighbor ids within each row (required for binary search).
            order = np.lexsort((col_idx, np.repeat(np.arange(num_nodes), degrees)))
            col_idx = col_idx[order]
        dtype = np.int32 if num_nodes < 2**31 and col_idx.size < 2**31 else np.int64
        max_degree = int(degrees.max()) if num_nodes else 0

        layout = edge_tab = node_tab = None
        if build_fat and num_nodes and num_edges:
            layout = PackedLayout(
                node_bits=_bits_for(num_nodes),
                start_bits=_bits_for(num_edges + 1),
                deg_bits=_bits_for(max_degree + 1),
            )
            if layout.fits:
                from torch_random_walk_tpu import native

                et, nt = native.pack_fat(row_ptr.astype(np.int64),
                                         col_idx.astype(np.int32),
                                         layout.node_bits, layout.start_bits)
                edge_tab = jnp.asarray(et)
                node_tab = jnp.asarray(nt)
            else:
                # LOUD fallback (VERDICT r2 item 5): the scalar-gather path
                # is ~3x slower, and >= 2^31-edge graphs should go through
                # the partitioned engines (parallel/partition_v2.py)
                # instead of silently degrading on one chip.
                import warnings

                warnings.warn(
                    f"fat tables disabled: packed fields "
                    f"(node={layout.node_bits}b, start={layout.start_bits}b,"
                    f" deg={layout.deg_bits}b) exceed the 2x32-bit row — "
                    f"walks fall back to the ~3x-slower scalar-gather path."
                    f" For graphs past 2^31 edges use the partitioned "
                    f"engines (PartitionedCSR + walk_partitioned_*).",
                    stacklevel=2)
                layout = None
        return cls(
            row_ptr=jnp.asarray(row_ptr.astype(dtype)),
            col_idx=jnp.asarray(col_idx.astype(dtype)),
            num_nodes=num_nodes,
            num_edges=num_edges,
            max_degree=max_degree,
            layout=layout,
            edge_tab=edge_tab,
            node_tab=node_tab,
        )

    @classmethod
    def from_edges(
        cls, src, dst, num_nodes: int | None = None, symmetrize: bool = False
    ) -> "CSRGraph":
        """Build from raw edge arrays (the scalable path for ogbn-scale graphs)."""
        from torch_random_walk_tpu import native

        src = np.asarray(src, np.int64)
        dst = np.asarray(dst, np.int64)
        if symmetrize:
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
        if num_nodes is None:
            num_nodes = int(max(src.max(), dst.max())) + 1 if src.size else 0
        row_ptr, col_idx = native.build_csr(src, dst, num_nodes)
        return cls.from_arrays(row_ptr, col_idx, sort_rows=False)

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
    in insertion order — O(N) instead of the reference's O(N^2) loop.

    Semantics proof: the reference computes ``nodes.index(node)`` for each
    ``node`` in ``nodes = list(graph.nodes())`` (torch_rw/utils.py:12-15).
    Because graph nodes are unique, each node's first occurrence is its own
    position, so the result is always ``arange(len(nodes))`` regardless of
    the graph's insertion order.  Pinned by
    ``tests/test_graph.py::test_nodes_tensor_matches_reference_law``.
    """
    return jnp.arange(len(graph.nodes()), dtype=jnp.int32)
