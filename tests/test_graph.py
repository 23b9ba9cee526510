import networkx as nx
import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu import graph as G


def toy_undirected():
    g = nx.Graph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return g


def toy_directed():
    g = nx.DiGraph()
    for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
              ("E", "A"), ("E", "D")]:
        g.add_edge(*e)
    return g


def test_csr_builder_matches_networkx():
    g = toy_undirected()
    csr = G.CSRGraph.from_networkx(g)
    assert csr.num_nodes == 5 and csr.num_edges == 14
    rp = np.asarray(csr.row_ptr)
    ci = np.asarray(csr.col_idx)
    np.testing.assert_array_equal(rp, [0, 3, 6, 9, 12, 14])
    # rows sorted, adjacency correct (node order A,B,C,D,E = insertion)
    adj = {i: sorted(ci[rp[i]:rp[i + 1]].tolist()) for i in range(5)}
    assert adj == {0: [1, 2, 4], 1: [0, 2, 3], 2: [0, 1, 3], 3: [1, 2, 4],
                   4: [0, 3]}
    for i in range(5):
        row = ci[rp[i]:rp[i + 1]]
        assert np.all(np.diff(row) >= 0), "rows must be sorted"
    assert csr.max_degree == 3


def test_csr_from_edges_symmetrize():
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    csr = G.CSRGraph.from_edges(src, dst, num_nodes=3, symmetrize=True)
    assert csr.num_edges == 6
    rp, ci = np.asarray(csr.row_ptr), np.asarray(csr.col_idx)
    assert sorted(ci[rp[0]:rp[1]].tolist()) == [1, 2]


def test_node_edge_index_golden():
    """Golden from /root/reference/tests/test_rw_edge_list.py:31-37."""
    g = toy_directed()
    edge_list, mapping = G.to_edge_list_indexed(g)
    assert mapping == {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4}
    index, sorted_edges = G.build_node_edge_index(edge_list)
    np.testing.assert_array_equal(
        np.asarray(index),
        [[0, 1], [2, 3], [-1, -1], [4, 4], [5, 6]],
    )
    heads = np.asarray(sorted_edges)[:, 0]
    assert np.all(np.diff(heads) >= 0)


def test_edge_list_undirected_appends_reversed():
    g = toy_undirected()
    edge_list, _ = G.to_edge_list_indexed(g)
    e = np.asarray(edge_list)
    assert e.shape == (14, 2)
    np.testing.assert_array_equal(e[7:], e[:7, ::-1])


def test_relation_tail_index_golden():
    """Golden from /root/reference/tests/test_rw_triples.py:47-53."""
    triples = [(0, 5, 1), (1, 6, 3), (0, 5, 2), (2, 6, 4), (2, 7, 1),
               (0, 6, 3), (3, 7, 0), (3, 6, 2)]
    entities = jnp.array([0, 1, 2, 3, 4])
    index, sorted_triples = G.build_relation_tail_index(
        jnp.array(triples), entities
    )
    np.testing.assert_array_equal(
        np.asarray(index), [[0, 2], [3, 3], [4, 5], [6, 7], [-1, -1]]
    )
    heads = np.asarray(sorted_triples)[:, 0]
    assert np.all(np.diff(heads) >= 0)


def test_edge_list_graph_container():
    g = toy_directed()
    elg = G.EdgeListGraph.from_networkx(g)
    assert elg.num_nodes == 5 and elg.num_edges == 7 and elg.max_degree == 2
    np.testing.assert_array_equal(
        np.asarray(elg.node_edge_index),
        [[0, 1], [2, 3], [-1, -1], [4, 4], [5, 6]],
    )


def test_nodes_tensor_matches_reference_law():
    """Pin nodes_tensor == the reference's list.index loop
    (torch_rw/utils.py:11-18) on a graph whose insertion order is neither
    sorted nor contiguous (VERDICT r1 weak #6)."""
    g = nx.Graph()
    for e in [("Z", "M"), ("A", "Z"), ("M", "Q"), ("Q", "A"), ("B", "Z")]:
        g.add_edge(*e)
    nodes = list(g.nodes())
    reference = [nodes.index(n) for n in nodes]  # exact reference algorithm
    ours = G.nodes_tensor(g)
    assert reference == list(np.asarray(ours))
    assert list(np.asarray(ours)) == list(range(len(nodes)))


class TestDatasets:
    def test_npz_roundtrip(self, tmp_path):
        from torch_random_walk_tpu.graph import datasets
        p = str(tmp_path / "g.npz")
        datasets.save_npz(p, [0, 1, 2], [1, 2, 0], num_nodes=4)
        g = datasets.load_npz(p)
        assert (g.num_nodes, g.num_edges) == (4, 3)

    def test_synthetic_power_law(self):
        from torch_random_walk_tpu.graph import datasets
        g = datasets.synthetic_power_law(1000, 8, seed=0)
        assert g.num_nodes == 1000
        assert g.num_edges == 1000 * 8 + 2000
        # every node has out-degree >= 1 (ring edges)
        import numpy as np
        assert (np.diff(np.asarray(g.row_ptr)) >= 1).all()

    def test_load_planetoid_npz_cache(self, tmp_path):
        """Cached-npz path of the Cora/Citeseer loader: src/dst/labels in
        {root}/{name}_edges.npz -> symmetrized CSRGraph + labels."""
        import numpy as np
        from torch_random_walk_tpu.graph import datasets

        np.savez(str(tmp_path / "cora_edges.npz"),
                 src=np.array([0, 1, 2, 3]), dst=np.array([1, 2, 3, 0]),
                 num_nodes=np.int64(5),
                 labels=np.array([0, 0, 1, 1, 2]))
        g, labels = datasets.load_planetoid("Cora", root=str(tmp_path))
        assert g.num_nodes == 5
        assert g.num_edges == 8  # symmetrized
        np.testing.assert_array_equal(labels, [0, 0, 1, 1, 2])

    def test_load_planetoid_pickle_format(self, tmp_path):
        """Standard GCN-distribution pickle path: ind.{name}.graph adjacency
        dict + ally/ty one-hot labels + permuted test index; the loader must
        reassemble per-node labels in graph order."""
        import pickle

        import numpy as np
        from torch_random_walk_tpu.graph import datasets

        adj = {0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: [0]}
        with open(tmp_path / "ind.cora.graph", "wb") as f:
            pickle.dump(adj, f)
        y_all = np.eye(3)[[0, 1, 2]]          # labels for nodes 0-2
        # ty rows follow test.index FILE order (GCN-codebase contract:
        # labels[test_index[i]] = ty[i]): node 4 -> 2, node 3 -> 1.
        y_test = np.eye(3)[[2, 1]]
        test_index = np.array([4, 3])         # permuted on disk
        with open(tmp_path / "ind.cora.ally", "wb") as f:
            pickle.dump(y_all, f)
        with open(tmp_path / "ind.cora.ty", "wb") as f:
            pickle.dump(y_test, f)
        np.savetxt(tmp_path / "ind.cora.test.index", test_index, fmt="%d")
        g, labels = datasets.load_planetoid("cora", root=str(tmp_path))
        assert g.num_nodes == 5
        # undirected: each adjacency entry appears in both directions
        row_ptr = np.asarray(g.row_ptr)
        assert row_ptr[-1] == g.num_edges
        np.testing.assert_array_equal(labels, [0, 1, 2, 1, 2])

    def test_load_planetoid_isolated_test_nodes(self, tmp_path):
        """Real Citeseer has ISOLATED nodes in the test split (empty
        adjacency lists — no edge mentions them).  num_nodes must come from
        the adjacency keys/test index, not just edge endpoints, or
        labels[test_index] indexes out of bounds and the graph undercounts
        nodes (r2 review finding)."""
        import pickle

        import numpy as np
        from torch_random_walk_tpu.graph import datasets

        # Node 4 is isolated (highest index, empty list): endpoint-max
        # would undercount to 4 nodes.
        adj = {0: [1, 2], 1: [0], 2: [0, 3], 3: [2], 4: []}
        with open(tmp_path / "ind.citeseer.graph", "wb") as f:
            pickle.dump(adj, f)
        y_all = np.eye(3)[[0, 1, 2]]
        y_test = np.eye(3)[[2, 1]]
        test_index = np.array([4, 3])
        with open(tmp_path / "ind.citeseer.ally", "wb") as f:
            pickle.dump(y_all, f)
        with open(tmp_path / "ind.citeseer.ty", "wb") as f:
            pickle.dump(y_test, f)
        np.savetxt(tmp_path / "ind.citeseer.test.index", test_index, fmt="%d")
        g, labels = datasets.load_planetoid("citeseer", root=str(tmp_path))
        assert g.num_nodes == 5
        np.testing.assert_array_equal(labels, [0, 1, 2, 1, 2])
        # the isolated node is a dead end the walk engines absorb at
        deg = np.diff(np.asarray(g.row_ptr))
        assert deg[4] == 0

    def test_load_planetoid_missing_raises(self, tmp_path):
        import pytest

        from torch_random_walk_tpu.graph import datasets

        with pytest.raises(FileNotFoundError):
            datasets.load_planetoid("cora", root=str(tmp_path / "void"))

    def test_load_ogbn_npz_cache(self, tmp_path):
        """Cached-edge path of the OGB loader (the zero-egress contract:
        a {root}/{name}_edges.npz + optional labels file fully replaces the
        ogb package).  The cache stores RAW directed edges; symmetrize
        applies per load so cached and fresh builds agree."""
        import numpy as np
        from torch_random_walk_tpu.graph import datasets

        datasets.save_npz(str(tmp_path / "ogbn_products_edges.npz"),
                          [0, 1, 2], [1, 2, 3], num_nodes=4)
        np.save(str(tmp_path / "ogbn_products_labels.npy"),
                np.array([0, 1, 1, 0]))
        g, labels = datasets.load_ogbn("ogbn-products", root=str(tmp_path))
        assert g.num_nodes == 4
        assert g.num_edges == 6  # symmetrized
        np.testing.assert_array_equal(labels, [0, 1, 1, 0])
        g2, _ = datasets.load_ogbn("ogbn-products", root=str(tmp_path),
                                   symmetrize=False)
        assert g2.num_edges == 3  # raw directed edges

    def test_load_ogbn_without_package_or_cache(self, tmp_path):
        """No cache and no ogb package -> a loud ImportError naming the
        cache path (VERDICT r1: the loader must not fail silently)."""
        import pytest

        from torch_random_walk_tpu.graph import datasets

        try:
            import ogb  # noqa: F401
            pytest.skip("ogb installed in this environment")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="ogbn_arxiv_edges.npz"):
            datasets.load_ogbn("ogbn-arxiv", root=str(tmp_path))

    def test_products_shape_cache_roundtrip(self, tmp_path, monkeypatch):
        """products_shape_graph writes a CSR cache on first build and the
        reload is byte-identical (walks over the reloaded graph therefore
        reproduce the original bitstreams)."""
        import numpy as np
        from torch_random_walk_tpu.graph import datasets

        monkeypatch.setattr(
            datasets, "synthetic_power_law",
            lambda n, d, s: G.CSRGraph.from_edges(
                np.arange(500) % 100, (np.arange(500) * 7) % 100,
                num_nodes=100))
        g1 = datasets.products_shape_graph(str(tmp_path))
        assert (tmp_path / "products_shape_csr.npz").exists()
        monkeypatch.setattr(datasets, "synthetic_power_law", None)
        g2 = datasets.products_shape_graph(str(tmp_path))  # cache hit
        np.testing.assert_array_equal(np.asarray(g1.row_ptr),
                                      np.asarray(g2.row_ptr))
        np.testing.assert_array_equal(np.asarray(g1.col_idx),
                                      np.asarray(g2.col_idx))
        assert g2.max_degree == g1.max_degree
