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


def _atomic_savez(path: str, compressed: bool = False, **arrays) -> None:
    """Write-to-temp + os.replace so an interrupted save never leaves a
    truncated .npz at the final path (a corrupt cache would otherwise win
    the os.path.exists check on every later load).  Mirrors np.savez's
    auto-append of '.npz' to suffix-less paths."""
    if not path.endswith(".npz"):
        path += ".npz"
    # (the tmp name must keep the .npz suffix — np.savez appends it
    # otherwise and the os.replace source would not exist)
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        (np.savez_compressed if compressed else np.savez)(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save_npz(path: str, src, dst, num_nodes: int | None = None) -> None:
    arrays = {"src": np.asarray(src, np.int64),
              "dst": np.asarray(dst, np.int64)}
    if num_nodes is not None:
        arrays["num_nodes"] = np.int64(num_nodes)
    _atomic_savez(path, compressed=True, **arrays)


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


def load_planetoid(name: str, root: str = "dataset"):
    """Cora/Citeseer/Pubmed loader (BASELINE.json config 2 graphs).

    Accepts either a cached ``{root}/{name}_edges.npz`` with src/dst int
    arrays (+ optional ``labels``), or the standard Planetoid pickle files
    ``ind.{name}.graph`` / ``ind.{name}.ally`` / ``ind.{name}.ty`` /
    ``ind.{name}.test.index`` as distributed with the GCN codebase.
    Returns (CSRGraph symmetrized, labels or None).
    """
    name = name.lower()
    cache = os.path.join(root, f"{name}_edges.npz")
    if os.path.exists(cache):
        with np.load(cache) as data:
            g = CSRGraph.from_edges(data["src"], data["dst"],
                                    num_nodes=(int(data["num_nodes"])
                                               if "num_nodes" in data
                                               else None),
                                    symmetrize=True)
            labels = data["labels"] if "labels" in data else None
        return g, labels
    graph_path = os.path.join(root, f"ind.{name}.graph")
    if os.path.exists(graph_path):
        import pickle

        with open(graph_path, "rb") as f:
            adj = pickle.load(f, encoding="latin1")  # {node: [nbrs]}
        src = np.concatenate([np.full(len(v), k, np.int64)
                              for k, v in adj.items()]) if adj else np.zeros(0)
        dst = np.concatenate([np.asarray(v, np.int64)
                              for v in adj.values()]) if adj else np.zeros(0)
        # num_nodes from the adjacency KEYS, not just edge endpoints: real
        # Citeseer has isolated nodes (empty neighbor lists, some in the
        # test split), which contribute no edge — endpoint-max undercounts
        # and labels[test_index] then indexes out of bounds.
        n = max(len(adj),
                int(max(adj.keys())) + 1 if adj else 0,
                int(max(src.max(), dst.max())) + 1 if src.size else 0)
        tidx = os.path.join(root, f"ind.{name}.test.index")
        test_index = (np.loadtxt(tidx, dtype=np.int64).reshape(-1)
                      if os.path.exists(tidx) else None)
        if test_index is not None and test_index.size:
            n = max(n, int(test_index.max()) + 1)
        g = CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)
        labels = None
        ally = os.path.join(root, f"ind.{name}.ally")
        ty = os.path.join(root, f"ind.{name}.ty")
        if test_index is not None and all(os.path.exists(p)
                                          for p in (ally, ty)):
            with open(ally, "rb") as f:
                y_all = pickle.load(f, encoding="latin1")
            with open(ty, "rb") as f:
                y_test = pickle.load(f, encoding="latin1")
            labels = np.full(n, -1, np.int64)
            labels[: y_all.shape[0]] = np.asarray(y_all).argmax(1)
            order = np.sort(test_index)
            labels[order] = np.asarray(y_test)[np.argsort(test_index)].argmax(1)
        return g, labels
    raise FileNotFoundError(
        f"no planetoid data for '{name}' under {root}: provide {cache} "
        f"(src/dst[/labels]) or the ind.{name}.* pickle files")


def synthetic_sbm(num_nodes: int, num_blocks: int, avg_degree: float,
                  assortativity: float = 0.9, seed: int = 0):
    """Stochastic-block-model benchmark graph with ground-truth communities.

    The stand-in for Cora/Citeseer-class quality runs when real downloads
    are unavailable: node2vec embeddings must separate the blocks (node
    classification) and score held-out edges above chance (link prediction).
    Returns (CSRGraph, labels, undirected_edges (E, 2)).
    """
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_blocks, num_nodes)
    target_edges = int(num_nodes * avg_degree / 2)
    p_in_share = assortativity
    n_in = int(target_edges * p_in_share)
    n_out = target_edges - n_in
    # In-block edges: pick a block proportionally to its size, two members.
    by_block = [np.where(labels == b)[0] for b in range(num_blocks)]
    sizes = np.array([len(b) for b in by_block])
    probs = sizes / sizes.sum()
    blocks = rng.choice(num_blocks, n_in, p=probs)
    src_in = np.empty(n_in, np.int64)
    dst_in = np.empty(n_in, np.int64)
    for b in range(num_blocks):
        m = blocks == b
        k = int(m.sum())
        if k and sizes[b] >= 2:
            src_in[m] = rng.choice(by_block[b], k)
            dst_in[m] = rng.choice(by_block[b], k)
        else:
            src_in[m] = rng.integers(0, num_nodes, k)
            dst_in[m] = rng.integers(0, num_nodes, k)
    src_out = rng.integers(0, num_nodes, n_out)
    dst_out = rng.integers(0, num_nodes, n_out)
    src = np.concatenate([src_in, src_out])
    dst = np.concatenate([dst_in, dst_out])
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = np.stack([src, dst], axis=1)
    g = CSRGraph.from_edges(src, dst, num_nodes=num_nodes, symmetrize=True)
    return g, labels, edges


# Version token for the synthetic_power_law on-disk cache (ADVICE r4):
# bump when the edge construction in synthetic_power_law changes.
_POWERLAW_GEN_VERSION = "v1"


def synthetic_power_law(num_nodes: int, avg_degree: int,
                        seed: int = 0, cache_root: str | None = None
                        ) -> CSRGraph:
    """Synthetic graph with a heavy-tailed in-degree (hub) distribution —
    the stand-in for ogbn-scale graphs when downloads are unavailable.

    Generation is a pure function of (num_nodes, avg_degree, seed), so
    ``cache_root`` (or $TRW_GRAPH_CACHE) enables the same on-disk CSR cache
    products_shape_graph uses — the multi-minute host build of the 2M/36M
    bench shape collapses to a load."""
    cache_root = cache_root or os.environ.get("TRW_GRAPH_CACHE")
    cache = None
    if cache_root and num_nodes >= 500_000:
        # The generator version rides in the filename (ADVICE r4): bump
        # _POWERLAW_GEN_VERSION whenever the construction below changes, or
        # stale cached graphs would load silently and benchmarks would
        # compare against a different graph than freshly generated ones.
        # Legacy unversioned files predate the token but were written by
        # this exact v1 construction, so they remain valid for v1 only.
        cache = os.path.join(
            cache_root,
            f"powerlaw_{_POWERLAW_GEN_VERSION}_"
            f"{num_nodes}_{avg_degree}_{seed}.npz")
        legacy = os.path.join(
            cache_root, f"powerlaw_{num_nodes}_{avg_degree}_{seed}.npz")
        found = next((p for p in (cache, legacy)
                      if os.path.exists(p)), None)
        if found is not None and (found == cache
                                  or _POWERLAW_GEN_VERSION == "v1"):
            with np.load(found) as data:
                return CSRGraph.from_arrays(data["row_ptr"],
                                            data["col_idx"],
                                            sort_rows=False)
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    u = rng.random(num_edges)
    dst = (u * u * num_nodes).astype(np.int64)
    src = rng.integers(0, num_nodes, num_edges)
    ring = np.arange(num_nodes, dtype=np.int64)
    src = np.concatenate([src, ring, (ring + 1) % num_nodes])
    dst = np.concatenate([dst, (ring + 1) % num_nodes, ring])
    graph = CSRGraph.from_edges(src, dst, num_nodes=num_nodes)
    if cache:
        os.makedirs(cache_root, exist_ok=True)
        _atomic_savez(cache, row_ptr=np.asarray(graph.row_ptr),
                      col_idx=np.asarray(graph.col_idx))
    return graph


def products_shape_graph(root: str = "dataset") -> CSRGraph:
    """ogbn-products-shaped synthetic graph (2.45M nodes, ~127M directed
    edges, hub skew — BASELINE.json config 4) with on-disk CSR caching:
    the host-side edge generation + CSR build takes ~20 min; reloading the
    sorted arrays takes seconds.  Used by both bench.py --dataset
    ogbn-products (when real OGB data is absent) and the products-tier
    quality run."""
    cache = os.path.join(root, "products_shape_csr.npz")
    if os.path.exists(cache):
        with np.load(cache) as data:
            return CSRGraph.from_arrays(data["row_ptr"], data["col_idx"],
                                        sort_rows=False)
    graph = synthetic_power_law(2_449_029, 50, 0)
    os.makedirs(root, exist_ok=True)
    _atomic_savez(cache, row_ptr=np.asarray(graph.row_ptr),
                  col_idx=np.asarray(graph.col_idx))
    return graph


def synthetic_grid_kg(side: int = 45, seed: int = 0):
    """Grid-world knowledge graph with exact TransE ground truth.

    Entities are cells of a side x side grid; relations are translations
    (0 = east, 1 = north, 2 = east-2, 3 = north-east), so the KG is exactly
    TransE-representable (e_cell = position, w_r = the offset) and filtered
    tail-ranking MRR has an unambiguous ceiling of 1.0.  Border cells lack
    some out-triples and the far corner dead-ends, exercising the
    absorbing-padding path of triples walks during training.  Returns
    (TriplesGraph over the KEPT triples, all_triples, test_triples) with 10%
    of triples held out, matching the holdout protocol of the node tiers.
    """
    from torch_random_walk_tpu.graph.triples import TriplesGraph

    n = side * side
    offsets = [(1, 0), (0, 1), (2, 0), (1, 1)]  # (dx, dy) per relation
    triples = []
    for r, (dx, dy) in enumerate(offsets):
        x, y = np.meshgrid(np.arange(side - dx), np.arange(side - dy),
                           indexing="ij")
        h = x.ravel() * side + y.ravel()
        t = (x.ravel() + dx) * side + (y.ravel() + dy)
        triples.append(np.stack([h, np.full_like(h, r), t], axis=1))
    triples = np.concatenate(triples)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(triples.shape[0])
    k = triples.shape[0] // 10
    test, train = triples[perm[:k]], triples[perm[k:]]
    return (TriplesGraph.from_arrays(train, num_entities=n), triples, test)
