"""Dataset loaders for the BASELINE.md benchmark configs.

Loads graphs from (in order of preference): OGB (``ogb`` package, if
installed), .npz edge files, or synthetic generators.  Everything returns a
CSRGraph; loaders are host-side and cached as .npz after first download.
"""

from __future__ import annotations

import os

import numpy as np

from torch_random_walk_tpu.graph.csr import CSRGraph


def load_npz(path: str) -> CSRGraph:
    """.npz with ``src``/``dst`` int arrays (optionally ``num_nodes``)."""
    with np.load(path) as data:
        n = int(data["num_nodes"]) if "num_nodes" in data else None
        return CSRGraph.from_edges(data["src"], data["dst"], num_nodes=n)


def save_npz(path: str, src, dst, num_nodes: int | None = None) -> None:
    arrays = {"src": np.asarray(src, np.int64),
              "dst": np.asarray(dst, np.int64)}
    if num_nodes is not None:
        arrays["num_nodes"] = np.int64(num_nodes)
    np.savez_compressed(path, **arrays)


def load_ogbn(name: str, root: str = "dataset", symmetrize: bool = True):
    """ogbn-products / ogbn-papers100M etc. via the ``ogb`` package.

    Returns (CSRGraph, labels or None).  Caches the edge list as .npz next
    to the OGB download so reloads skip the package entirely.
    """
    cache = os.path.join(root, f"{name.replace('-', '_')}_edges.npz")
    labels_cache = os.path.join(root, f"{name.replace('-', '_')}_labels.npy")
    if os.path.exists(cache):
        # The cache stores the RAW directed edge list; symmetrize applies on
        # every load so cached and fresh paths build the same graph.
        with np.load(cache) as data:
            g = CSRGraph.from_edges(
                data["src"], data["dst"],
                num_nodes=int(data["num_nodes"]) if "num_nodes" in data else None,
                symmetrize=symmetrize)
        labels = (np.load(labels_cache)
                  if os.path.exists(labels_cache) else None)
        return g, labels
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError as err:  # pragma: no cover - env without ogb
        raise ImportError(
            f"the 'ogb' package is required to download {name}; install it "
            f"or provide a cached edge file at {cache}") from err
    dataset = NodePropPredDataset(name=name, root=root)
    graph, labels = dataset[0]
    src, dst = graph["edge_index"]
    n = int(graph["num_nodes"])
    os.makedirs(root, exist_ok=True)
    save_npz(cache, src, dst, n)
    if labels is not None:
        labels = np.asarray(labels).reshape(-1)
        np.save(labels_cache, labels)
    g = CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=symmetrize)
    return g, labels


def synthetic_power_law(num_nodes: int, avg_degree: int,
                        seed: int = 0) -> CSRGraph:
    """Synthetic graph with a heavy-tailed in-degree (hub) distribution —
    the stand-in for ogbn-scale graphs when downloads are unavailable."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    u = rng.random(num_edges)
    dst = (u * u * num_nodes).astype(np.int64)
    src = rng.integers(0, num_nodes, num_edges)
    ring = np.arange(num_nodes, dtype=np.int64)
    src = np.concatenate([src, ring, (ring + 1) % num_nodes])
    dst = np.concatenate([dst, (ring + 1) % num_nodes, ring])
    return CSRGraph.from_edges(src, dst, num_nodes=num_nodes)
