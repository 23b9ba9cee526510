"""Fat-table walk engine tests: packing, cuckoo set, and bit-equivalence.

The fat engine (ops/fatwalk.py) must produce *bit-identical* walks to the
reference jnp path (ops/uniform.py, ops/node2vec.py) — same threefry
counters, same acceptance math — so the oracle-backed distribution tests in
test_walks_uniform.py / test_walks_node2vec.py transfer to it wholesale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from torch_random_walk_tpu.graph.csr import CSRGraph, PackedLayout
from torch_random_walk_tpu.graph.hashset import EdgeHashSet
from torch_random_walk_tpu.ops import fatwalk
from torch_random_walk_tpu.ops.fatwalk import FatMeta
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.ops.walk import edge_set_for, walk


def random_graph(n, avg_deg, seed, with_dead_ends=False):
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    if with_dead_ends:
        # Nodes in the top quarter get no out-edges.
        keep = src < (3 * n) // 4
        src, dst = src[keep], dst[keep]
    return CSRGraph.from_edges(src, dst, num_nodes=n)


class TestPackedLayout:
    def test_roundtrip(self):
        layout = PackedLayout(node_bits=21, start_bits=26, deg_bits=15)
        rng = np.random.default_rng(0)
        node = rng.integers(0, 2**21, 1000)
        start = rng.integers(0, 2**26, 1000)
        deg = rng.integers(0, 2**15, 1000)
        rows = jnp.asarray(layout.pack_np(node, start, deg))
        n2, s2, d2 = layout.unpack(rows)
        np.testing.assert_array_equal(np.asarray(n2), node)
        np.testing.assert_array_equal(np.asarray(s2), start)
        np.testing.assert_array_equal(np.asarray(d2), deg)

    def test_straddling_word_boundary(self):
        # start field crosses bit 32.
        layout = PackedLayout(node_bits=20, start_bits=25, deg_bits=12)
        node, start, deg = [7], [(1 << 25) - 3], [(1 << 12) - 1]
        rows = jnp.asarray(layout.pack_np(node, start, deg))
        n2, s2, d2 = layout.unpack(rows)
        assert (int(n2[0]), int(s2[0]), int(d2[0])) == (7, (1 << 25) - 3, (1 << 12) - 1)

    def test_graph_tables_consistent(self):
        g = random_graph(500, 6, seed=1)
        rp = np.asarray(g.row_ptr)
        ci = np.asarray(g.col_idx)
        node, start, deg = g.layout.unpack(g.node_tab)
        np.testing.assert_array_equal(np.asarray(node), np.arange(g.num_nodes))
        np.testing.assert_array_equal(np.asarray(start), rp[:-1])
        np.testing.assert_array_equal(np.asarray(deg), np.diff(rp))
        dst, dstart, ddeg = g.layout.unpack(g.edge_tab)
        np.testing.assert_array_equal(np.asarray(dst), ci)
        np.testing.assert_array_equal(np.asarray(dstart), rp[:-1][ci])
        np.testing.assert_array_equal(np.asarray(ddeg), np.diff(rp)[ci])


class TestEdgeHashSet:
    def test_membership_exact(self):
        rng = np.random.default_rng(3)
        n, e = 300, 2000
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        es = EdgeHashSet.from_edges(src, dst)
        present = set(zip(src.tolist(), dst.tolist()))
        # All present edges are found.
        hit = es.contains(jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32))
        assert bool(np.asarray(hit).all())
        # Random queries match ground truth exactly (no false positives).
        qu = rng.integers(0, n, 5000)
        qv = rng.integers(0, n, 5000)
        hit = np.asarray(es.contains(jnp.asarray(qu, jnp.int32),
                                     jnp.asarray(qv, jnp.int32)))
        truth = np.array([(a, b) in present for a, b in zip(qu, qv)])
        np.testing.assert_array_equal(hit, truth)

    def test_larger_build_converges(self):
        rng = np.random.default_rng(4)
        src = rng.integers(0, 50_000, 400_000)
        dst = rng.integers(0, 50_000, 400_000)
        es = EdgeHashSet.from_edges(src, dst)
        hit = es.contains(jnp.asarray(src[:1000], jnp.int32),
                          jnp.asarray(dst[:1000], jnp.int32))
        assert bool(np.asarray(hit).all())


class TestFatEquivalence:
    @pytest.mark.parametrize("dead_ends", [False, True])
    def test_uniform_bit_identical(self, dead_ends):
        g = random_graph(400, 5, seed=7, with_dead_ends=dead_ends)
        targets = jnp.arange(128, dtype=jnp.int32) % g.num_nodes
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 25, seed=11)
        fat = fatwalk.uniform_walk_fat(g.edge_tab, g.node_tab, targets,
                                       FatMeta.of(g), 25, seed=11)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25), (1.0, 3.0)])
    def test_node2vec_bit_identical(self, p, q):
        g = random_graph(300, 6, seed=9)
        targets = jnp.arange(96, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, p, q, 20,
                                seed=13, search_iters=g.search_iters)
        es = edge_set_for(g)
        fat = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                        targets, FatMeta.of(g), es.log_size,
                                        es.salt, p, q, 20, seed=13)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_node2vec_dead_ends(self):
        g = random_graph(300, 4, seed=10, with_dead_ends=True)
        targets = jnp.arange(64, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, 0.5, 2.0, 15,
                                seed=3, search_iters=g.search_iters)
        es = edge_set_for(g)
        fat = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                        targets, FatMeta.of(g), es.log_size,
                                        es.salt, 0.5, 2.0, 15, seed=3)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_public_walk_routes_to_fat(self):
        """walk(CSRGraph, ...) runs the freerun mixture engine at EVERY
        batch size (one bitstream family for the whole graph entry point);
        walk(row_ptr, col_idx, ...) keeps the reference-shaped rejection
        bitstream."""
        from torch_random_walk_tpu.ops.node2vec import (
            node2vec_walk_csr,
            node2vec_walk_csr_mixture,
        )

        g = random_graph(200, 5, seed=2)
        targets = jnp.arange(50, dtype=jnp.int32) % g.num_nodes
        via_graph = walk(g, target_nodes=targets, p=0.5, q=2.0,
                         walk_length=12, seed=5)
        mix_ref = node2vec_walk_csr_mixture(g.row_ptr, g.col_idx, targets,
                                            0.5, 2.0, 12, 5,
                                            g.layout.deg_bits,
                                            search_iters=g.search_iters)
        np.testing.assert_array_equal(np.asarray(via_graph),
                                      np.asarray(mix_ref))
        via_arrays = walk(g.row_ptr, g.col_idx, targets, p=0.5, q=2.0,
                          walk_length=12, seed=5)
        rej_ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, 0.5, 2.0,
                                    12, 5, search_iters=g.search_iters)
        np.testing.assert_array_equal(np.asarray(via_arrays),
                                      np.asarray(rej_ref))

    def test_public_walk_batch_size_invariant(self):
        """The graph-path bitstream must not depend on batch size: walker i's
        walk is identical whether launched in a batch of 256 or 4608 (the
        freerun engine keys every draw on the global walker id, and dispatch
        no longer switches samplers across a batch-size threshold)."""
        g = random_graph(300, 6, seed=21)
        big = jnp.arange(4608, dtype=jnp.int32) % g.num_nodes
        w_big = walk(g, target_nodes=big, p=0.5, q=2.0, walk_length=10,
                     seed=9)
        w_small = walk(g, target_nodes=big[:256], p=0.5, q=2.0,
                       walk_length=10, seed=9)
        np.testing.assert_array_equal(np.asarray(w_big)[:256],
                                      np.asarray(w_small))

    def test_clear_graph_caches_transparent(self):
        """Dropping the lazy cuckoo/fat6 device tables mid-pipeline (the
        HBM release used between bench phases) rebuilds them on the next
        biased walk with a bit-identical result."""
        from torch_random_walk_tpu.ops.walk import clear_graph_caches

        g = random_graph(200, 5, seed=4)
        targets = jnp.arange(64, dtype=jnp.int32) % g.num_nodes
        before = walk(g, target_nodes=targets, p=0.5, q=2.0,
                      walk_length=10, seed=6)
        clear_graph_caches(g)
        after = walk(g, target_nodes=targets, p=0.5, q=2.0,
                     walk_length=10, seed=6)
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
        clear_graph_caches(g)  # idempotent on an empty cache
        clear_graph_caches(g)


class TestEdgeListTriplesFat:
    def _edge_graph(self, seed, dead_ends=True):
        from torch_random_walk_tpu.graph.edge_list import EdgeListGraph
        rng = np.random.default_rng(seed)
        n, e = 200, 1200
        src = rng.integers(0, (3 * n) // 4 if dead_ends else n, e)
        dst = rng.integers(0, n, e)
        return EdgeListGraph.from_arrays(np.stack([src, dst], 1), num_nodes=n)

    @pytest.mark.parametrize("restart", [True, False])
    def test_edge_list_uniform_bit_identical(self, restart):
        from torch_random_walk_tpu.ops.edge_list_walk import (
            uniform_walk_edge_list)
        g = self._edge_graph(11)
        targets = jnp.arange(128, dtype=jnp.int32) % g.num_nodes
        ref = uniform_walk_edge_list(g.edge_list, g.node_edge_index, targets,
                                     20, 9, -1, restart)
        fat = fatwalk.uniform_walk_edge_list_fat(
            g.edge_tab, g.node_tab, targets, FatMeta.of(g), 20, 9, -1, restart)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_edge_list_public_routing(self):
        from torch_random_walk_tpu.ops.walk import walk_edge_list
        g = self._edge_graph(12)
        targets = jnp.arange(64, dtype=jnp.int32) % g.num_nodes
        via_graph = walk_edge_list(g, target_nodes=targets, walk_length=10,
                                   seed=4, padding_idx=-1, restart=True)
        via_arrays = walk_edge_list(g.edge_list, g.node_edge_index, targets,
                                    walk_length=10, seed=4, padding_idx=-1,
                                    restart=True)
        np.testing.assert_array_equal(np.asarray(via_graph),
                                      np.asarray(via_arrays))

    def test_triples_uniform_bit_identical(self):
        from torch_random_walk_tpu.graph.triples import TriplesGraph
        from torch_random_walk_tpu.ops.triples_walk import uniform_walk_triples
        rng = np.random.default_rng(13)
        n, e, r = 150, 900, 12
        heads = rng.integers(0, (3 * n) // 4, e)
        rels = rng.integers(0, r, e)
        tails = rng.integers(0, n, e)
        g = TriplesGraph.from_arrays(np.stack([heads, rels, tails], 1),
                                     num_entities=n)
        targets = jnp.arange(96, dtype=jnp.int32) % n
        ref = uniform_walk_triples(g.triples, g.relation_tail_index, targets,
                                   15, -1, True, 21)
        fat = fatwalk.uniform_walk_triples_fat(g.triple_tab, g.node_meta,
                                               targets, 15, -1, 21,
                                               g.num_entities, g.num_triples)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_triples_public_routing(self):
        from torch_random_walk_tpu.graph.triples import TriplesGraph
        from torch_random_walk_tpu.ops.walk import walk_triples
        rng = np.random.default_rng(14)
        n = 100
        t = np.stack([rng.integers(0, n, 500), rng.integers(0, 5, 500),
                      rng.integers(0, n, 500)], 1)
        g = TriplesGraph.from_arrays(t, num_entities=n)
        targets = jnp.arange(32, dtype=jnp.int32) % n
        via_graph = walk_triples(g, target_nodes=targets, walk_length=8,
                                 seed=2, padding_idx=-1)
        via_arrays = walk_triples(g.triples, g.relation_tail_index, targets,
                                  walk_length=8, seed=2, padding_idx=-1)
        np.testing.assert_array_equal(np.asarray(via_graph),
                                      np.asarray(via_arrays))

    @pytest.mark.parametrize("restart", [True, False])
    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (1.0, 4.0)])
    def test_edge_list_biased_bit_identical(self, restart, p, q):
        from torch_random_walk_tpu.ops.edge_list_walk import (
            biased_walk_edge_list)
        from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list
        g = self._edge_graph(15)
        targets = jnp.arange(96, dtype=jnp.int32) % g.num_nodes
        ref = biased_walk_edge_list(g.edge_list, g.node_edge_index, targets,
                                    p, q, 14, 6, -1, restart,
                                    search_iters=g.search_iters)
        es = _edge_set_for_edge_list(g)
        fat = fatwalk.node2vec_walk_edge_list_fat(
            g.edge_tab, g.node_tab, es.table, targets, FatMeta.of(g),
            es.log_size, es.salt, p, q, 14, 6, -1, restart)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_edge_list_biased_large_batch(self):
        from torch_random_walk_tpu.ops.edge_list_walk import (
            biased_walk_edge_list)
        from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list
        g = self._edge_graph(16)
        targets = jnp.arange(8192, dtype=jnp.int32) % g.num_nodes
        ref = biased_walk_edge_list(g.edge_list, g.node_edge_index, targets,
                                    0.5, 2.0, 10, 3, -1, True,
                                    search_iters=g.search_iters)
        es = _edge_set_for_edge_list(g)
        fat = fatwalk.node2vec_walk_edge_list_fat(
            g.edge_tab, g.node_tab, es.table, targets, FatMeta.of(g),
            es.log_size, es.salt, 0.5, 2.0, 10, 3, -1, True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    def test_edge_list_biased_public_routing(self):
        from torch_random_walk_tpu.ops.walk import walk_edge_list
        g = self._edge_graph(17)
        targets = jnp.arange(64, dtype=jnp.int32) % g.num_nodes
        via_graph = walk_edge_list(g, target_nodes=targets, p=0.5, q=2.0,
                                   walk_length=8, seed=4, padding_idx=-1,
                                   restart=True)
        via_arrays = walk_edge_list(g.edge_list, g.node_edge_index, targets,
                                    p=0.5, q=2.0, walk_length=8, seed=4,
                                    padding_idx=-1, restart=True)
        np.testing.assert_array_equal(np.asarray(via_graph),
                                      np.asarray(via_arrays))


class TestFatLargeBatch:
    """The production CSR node2vec branches — hierarchical compaction
    (B >= 4096, wide frozen band) and the speculative scan (narrow band) —
    must equal the jnp reference path bit-for-bit, so the oracle-verified
    transition law transfers to them (VERDICT r1 weakness #1).  Branch
    selection is asserted via fatwalk.rejection_branch so each test provably
    exercises the path it names."""

    def _check(self, g, p, q, num_walkers, walk_length=12, seed=13):
        targets = jnp.arange(num_walkers, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, p, q,
                                walk_length, seed=seed,
                                search_iters=g.search_iters)
        es = edge_set_for(g)
        fat = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                        targets, FatMeta.of(g), es.log_size,
                                        es.salt, p, q, walk_length, seed=seed)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    @pytest.mark.parametrize("num_walkers", [4096, 8192])
    def test_hierarchical_bit_identical(self, num_walkers):
        # p=.5, q=2 -> frozen-band fraction 0.5: compacted-levels branch.
        assert fatwalk.rejection_branch(0.5, 2.0, num_walkers) == "hierarchical"
        self._check(random_graph(400, 6, seed=31), 0.5, 2.0, num_walkers)

    def test_hierarchical_with_dead_ends(self):
        assert fatwalk.rejection_branch(0.5, 2.0, 4096) == "hierarchical"
        self._check(random_graph(400, 5, seed=32, with_dead_ends=True),
                    0.5, 2.0, 4096)

    def test_speculative_zero_band(self):
        # q == 1 -> prob_1 == prob_2: band 0, no draw ever needs the cuckoo
        # set; the speculative scan's pure-register path.
        assert fatwalk.rejection_branch(0.5, 1.0, 4096) == "speculative"
        self._check(random_graph(400, 6, seed=33), 0.5, 1.0, 4096)

    def test_speculative_narrow_band(self):
        # p=1, q=1.25 -> f_ratio = 0.2: speculative scan WITH a compacted
        # hash pass over frozen draws.
        assert fatwalk.rejection_branch(1.0, 1.25, 4096) == "speculative"
        self._check(random_graph(400, 6, seed=34), 1.0, 1.25, 4096)

    def test_small_gate_boundary(self):
        assert fatwalk.rejection_branch(0.5, 2.0, 4095) == "small"
        self._check(random_graph(400, 6, seed=36), 0.5, 2.0, 2048)

    def test_chunked_offsets_at_hierarchical_size(self):
        g = random_graph(400, 6, seed=35)
        es = edge_set_for(g)
        kw = dict(meta=FatMeta.of(g), hash_log_size=es.log_size,
                  hash_salt=es.salt, p=0.5, q=2.0, walk_length=10, seed=5)
        targets = jnp.arange(8192, dtype=jnp.int32) % g.num_nodes
        full = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                         targets, **kw)
        lo = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[:4096], walker_offset=0, **kw)
        hi = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[4096:], walker_offset=4096,
                                       **kw)
        np.testing.assert_array_equal(
            np.asarray(full), np.concatenate([np.asarray(lo), np.asarray(hi)]))


class TestBloomBranch:
    """The free-running production branch (engaged whenever wide fat tables
    are supplied at B >= 4096).  sampler="rejection" must stay bit-identical
    to the jnp rejection path (Bloom negatives are exact; frozen rounds
    replay identical counters through the cuckoo set)."""

    def _check(self, g, p, q, num_walkers, walk_length=12, seed=13):
        from torch_random_walk_tpu.ops.walk import fat6_for
        targets = jnp.arange(num_walkers, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, p, q,
                                walk_length, seed=seed,
                                search_iters=g.search_iters)
        es = edge_set_for(g)
        fat = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                        targets, FatMeta.of(g), es.log_size,
                                        es.salt, p, q, walk_length, seed=seed,
                                        fat6=fat6_for(g), sampler="rejection")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25), (0.5, 1.0)])
    def test_freerun_rejection_bit_identical(self, p, q):
        assert fatwalk.rejection_branch(p, q, 4096, True) == "bloom"
        self._check(random_graph(400, 6, seed=61), p, q, 4096)

    def test_freerun_rejection_large_batch_dead_ends(self):
        self._check(random_graph(400, 5, seed=62, with_dead_ends=True),
                    0.5, 2.0, 8192)

    def test_freerun_rejection_chunked_offsets(self):
        from torch_random_walk_tpu.ops.walk import fat6_for
        g = random_graph(400, 6, seed=64)
        es = edge_set_for(g)
        kw = dict(meta=FatMeta.of(g), hash_log_size=es.log_size,
                  hash_salt=es.salt, p=0.5, q=2.0, walk_length=10, seed=5,
                  fat6=fat6_for(g), sampler="rejection")
        targets = jnp.arange(8192, dtype=jnp.int32) % g.num_nodes
        full = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                         targets, **kw)
        lo = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[:4096], walker_offset=0, **kw)
        hi = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[4096:], walker_offset=4096,
                                       **kw)
        np.testing.assert_array_equal(
            np.asarray(full), np.concatenate([np.asarray(lo), np.asarray(hi)]))


class TestWarmBiasedTablesCache:
    """warm_biased_tables(graph, cache_dir): the disk-cached cuckoo + fat6
    tables must be bit-identical to a fresh build (they are pure functions
    of the CSR), and a stale cache (wrong shape/width/graph) must be
    rebuilt, not trusted."""

    def test_roundtrip_bit_identical(self, tmp_path):
        import importlib

        walk_mod = importlib.import_module("torch_random_walk_tpu.ops.walk")

        g = random_graph(300, 5, seed=91)
        cache = str(tmp_path / "fatcache")
        walk_mod.warm_biased_tables(g, cache)          # build + save
        es1 = walk_mod._EDGE_SET_CACHE[id(g)]
        ft1 = walk_mod._BLOOM_CACHE[id(g)]
        walk_mod.clear_graph_caches(g)
        walk_mod.warm_biased_tables(g, cache)          # load
        es2 = walk_mod._EDGE_SET_CACHE[id(g)]
        ft2 = walk_mod._BLOOM_CACHE[id(g)]
        assert (es1.log_size, es1.salt) == (es2.log_size, es2.salt)
        np.testing.assert_array_equal(np.asarray(es1.table),
                                      np.asarray(es2.table))
        np.testing.assert_array_equal(np.asarray(ft1[0]), np.asarray(ft2[0]))
        np.testing.assert_array_equal(np.asarray(ft1[1]), np.asarray(ft2[1]))

    def test_stale_cache_rebuilt(self, tmp_path):
        import importlib

        walk_mod = importlib.import_module("torch_random_walk_tpu.ops.walk")

        g1 = random_graph(300, 5, seed=92)
        g2 = random_graph(400, 5, seed=93)  # different graph, same dir
        cache = str(tmp_path / "fatcache")
        walk_mod.warm_biased_tables(g1, cache)
        walk_mod.warm_biased_tables(g2, cache)  # must detect the mismatch
        ft2 = walk_mod._BLOOM_CACHE[id(g2)]
        assert ft2[0].shape[0] == g2.num_edges
        # The rewritten cache now belongs to g2.
        walk_mod.clear_graph_caches(g2)
        walk_mod.warm_biased_tables(g2, cache)
        np.testing.assert_array_equal(
            np.asarray(ft2[0]),
            np.asarray(walk_mod._BLOOM_CACHE[id(g2)][0]))

    def test_walks_identical_from_cache(self, tmp_path):
        import importlib

        walk_mod = importlib.import_module("torch_random_walk_tpu.ops.walk")

        g = random_graph(300, 5, seed=94)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        fresh = np.asarray(walk(g, target_nodes=targets, p=0.5, q=2.0,
                                walk_length=8, seed=3))
        cache = str(tmp_path / "fatcache")
        walk_mod.clear_graph_caches(g)
        walk_mod.warm_biased_tables(g, cache)
        walk_mod.clear_graph_caches(g)
        walk_mod.warm_biased_tables(g, cache)  # from disk
        cached = np.asarray(walk(g, target_nodes=targets, p=0.5, q=2.0,
                                 walk_length=8, seed=3))
        np.testing.assert_array_equal(fresh, cached)


class TestVirtualLanes:
    """walks_per_lane (r5) is a pure performance knob: lane l advances
    walker ids l, lanes+l, 2*lanes+l back to back, draws stay keyed by
    (global walker id, step, round), so walks must be BIT-IDENTICAL for
    every V — including under chunked walker_offset launches and the
    exhausted-budget poison path."""

    def _walks(self, g, targets, v, **kw):
        from torch_random_walk_tpu.ops.walk import fat6_for
        es = edge_set_for(g)
        return np.asarray(fatwalk.node2vec_walk_fat(
            g.edge_tab, g.node_tab, es.table, targets, FatMeta.of(g),
            es.log_size, es.salt, 0.5, 2.0, 12, seed=13, fat6=fat6_for(g),
            walks_per_lane=v, **kw))

    @pytest.mark.parametrize("v", [2, 4])
    def test_v_invariant(self, v):
        g = random_graph(400, 6, seed=81)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        np.testing.assert_array_equal(self._walks(g, targets, 1),
                                      self._walks(g, targets, v))

    def test_v_invariant_dead_ends(self):
        g = random_graph(400, 5, seed=82, with_dead_ends=True)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        np.testing.assert_array_equal(self._walks(g, targets, 1),
                                      self._walks(g, targets, 4))

    def test_v_chunked_offsets(self):
        g = random_graph(400, 6, seed=83)
        targets = jnp.arange(8192, dtype=jnp.int32) % g.num_nodes
        full = self._walks(g, targets, 2)
        lo = self._walks(g, targets[:4096], 2, walker_offset=0)
        hi = self._walks(g, targets[4096:], 2, walker_offset=4096)
        np.testing.assert_array_equal(full, np.concatenate([lo, hi]))

    def test_v_indivisible_falls_back(self):
        g = random_graph(400, 6, seed=84)
        targets = jnp.arange(4095, dtype=jnp.int32) % g.num_nodes
        np.testing.assert_array_equal(self._walks(g, targets, 1),
                                      self._walks(g, targets, 4))

    @pytest.mark.parametrize("restart", [True, False])
    def test_v_invariant_edge_list(self, restart):
        from torch_random_walk_tpu.graph.edge_list import EdgeListGraph
        from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list
        rng = np.random.default_rng(85)
        n = 300
        src = rng.integers(0, n, 1800)
        dst = rng.integers(0, n, 1800)
        keep = src < (3 * n) // 4  # dead ends exercise the pad/jump path
        g = EdgeListGraph.from_arrays(
            np.stack([src[keep], dst[keep]], axis=1), num_nodes=n)
        es = _edge_set_for_edge_list(g)
        targets = jnp.arange(4096, dtype=jnp.int32) % n
        outs = [np.asarray(fatwalk.node2vec_walk_edge_list_fat(
            g.edge_tab, g.node_tab, es.table, targets, FatMeta.of(g),
            es.log_size, es.salt, 0.5, 2.0, 12, 7, n, restart,
            walks_per_lane=v)) for v in (1, 4)]
        np.testing.assert_array_equal(outs[0], outs[1])


class TestMixtureSampler:
    """The composition-envelope sampler (production default): fat freerun
    mixture must equal the jnp mixture reference bit-for-bit, and the jnp
    mixture's transition law must match the exact node2vec distribution
    (same oracle as the rejection sampler — the LAW is sampler-invariant)."""

    def _check(self, g, p, q, num_walkers, walk_length=12, seed=13):
        from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr_mixture
        from torch_random_walk_tpu.ops.walk import fat6_for
        targets = jnp.arange(num_walkers, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr_mixture(g.row_ptr, g.col_idx, targets, p, q,
                                        walk_length, seed,
                                        g.layout.deg_bits,
                                        search_iters=g.search_iters)
        es = edge_set_for(g)
        fat = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                        targets, FatMeta.of(g), es.log_size,
                                        es.salt, p, q, walk_length, seed=seed,
                                        fat6=fat6_for(g), sampler="mixture")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(fat))

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25), (0.25, 2.0),
                                     (0.5, 1.0)])
    def test_mixture_bit_identical(self, p, q):
        self._check(random_graph(400, 6, seed=71), p, q, 4096)

    def test_mixture_dead_ends(self):
        self._check(random_graph(400, 5, seed=72, with_dead_ends=True),
                    0.5, 2.0, 4096)

    def test_mixture_parallel_edges(self):
        """Multigraph: parallel edges multiply both the base slots and the
        spike mass (rev/own multiplicities)."""
        rng = np.random.default_rng(73)
        n = 120
        src = rng.integers(0, n, 900)
        dst = rng.integers(0, n, 900)
        src = np.concatenate([src, src[:300]])  # force parallel edges
        dst = np.concatenate([dst, dst[:300]])
        g = CSRGraph.from_edges(src, dst, num_nodes=n)
        self._check(g, 0.25, 2.0, 4096, walk_length=10)

    def test_mixture_wide_bloom_deg50(self):
        """Average degree ~50 selects the 416-bit Bloom width
        (ops/walk.bloom_words_for — narrow filters saturate there, and the
        r4 width curve shows (E, 16) rows gather at the same rate as
        (E, 10)); the wide rows must stay bit-identical to the jnp mixture
        reference through the freerun engine."""
        from torch_random_walk_tpu.ops.walk import bloom_words_for, fat6_for

        rng = np.random.default_rng(75)
        n = 800
        src = rng.integers(0, n, n * 50)
        dst = rng.integers(0, n, n * 50)
        g = CSRGraph.from_edges(src, dst, num_nodes=n)
        assert bloom_words_for(g.num_nodes, g.num_edges) == 13
        assert fat6_for(g)[0].shape[1] == 16
        self._check(g, 0.5, 2.0, 4096, walk_length=10)

    def test_mixture_matches_node2vec_law(self):
        """Empirical transition law of the mixture sampler == the exact
        node2vec distribution (oracle) — sampler equivalence."""
        from torch_random_walk_tpu.graph import oracle
        from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr_mixture
        import networkx as nx
        import torch_random_walk_tpu as trw
        gx = nx.Graph()
        for e in [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("D", "C"),
                  ("E", "A"), ("E", "D")]:
            gx.add_edge(*e)
        csr = trw.CSRGraph.from_networkx(gx)
        rp, ci = np.asarray(csr.row_ptr), np.asarray(csr.col_idx)
        p, q = 0.5, 2.0
        walks = np.asarray(node2vec_walk_csr_mixture(
            csr.row_ptr, csr.col_idx, jnp.zeros(30000, jnp.int32), p, q, 5,
            99, csr.layout.deg_bits, search_iters=csr.search_iters))
        pooled = {}
        for s in range(2, walks.shape[1]):
            for t, v, x in zip(walks[:, s - 2], walks[:, s - 1], walks[:, s]):
                pooled.setdefault((t, v), []).append(x)
        checked = 0
        for (t, v), nxts in pooled.items():
            if len(nxts) < 2000:
                continue
            emp = np.bincount(nxts, minlength=5) / len(nxts)
            probs = oracle.node2vec_csr_probs(rp, ci, t, v, p, q, 5)
            np.testing.assert_allclose(emp, probs, atol=0.03)
            checked += 1
        assert checked >= 5

    def test_public_walk_default_is_mixture(self):
        """walk(CSRGraph) at production batch sizes routes to the freerun
        mixture engine and equals the jnp mixture reference."""
        from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr_mixture
        from torch_random_walk_tpu.ops.walk import walk
        g = random_graph(300, 6, seed=74)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        via_graph = walk(g, target_nodes=targets, p=0.5, q=2.0,
                         walk_length=10, seed=5)
        ref = node2vec_walk_csr_mixture(g.row_ptr, g.col_idx, targets, 0.5,
                                        2.0, 10, 5, g.layout.deg_bits,
                                        search_iters=g.search_iters)
        np.testing.assert_array_equal(np.asarray(via_graph), np.asarray(ref))


class TestShardingDeterminism:
    """SURVEY §7 hard part 4: chunked launches with walker_offset must
    reproduce the single-launch bitstream exactly."""

    def test_uniform_chunked_equals_full(self):
        g = random_graph(300, 6, seed=21)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        full = fatwalk.uniform_walk_fat(g.edge_tab, g.node_tab, targets,
                                        FatMeta.of(g), 12, seed=5)
        lo = fatwalk.uniform_walk_fat(g.edge_tab, g.node_tab, targets[:128],
                                      FatMeta.of(g), 12, seed=5,
                                      walker_offset=0)
        hi = fatwalk.uniform_walk_fat(g.edge_tab, g.node_tab, targets[128:],
                                      FatMeta.of(g), 12, seed=5,
                                      walker_offset=128)
        np.testing.assert_array_equal(
            np.asarray(full), np.concatenate([np.asarray(lo), np.asarray(hi)]))

    def test_biased_chunked_equals_full(self):
        g = random_graph(300, 6, seed=22)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        es = edge_set_for(g)
        kw = dict(meta=FatMeta.of(g), hash_log_size=es.log_size,
                  hash_salt=es.salt, p=0.5, q=2.0, walk_length=10, seed=5)
        full = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                         targets, **kw)
        lo = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[:128], walker_offset=0, **kw)
        hi = fatwalk.node2vec_walk_fat(g.edge_tab, g.node_tab, es.table,
                                       targets[128:], walker_offset=128, **kw)
        np.testing.assert_array_equal(
            np.asarray(full), np.concatenate([np.asarray(lo), np.asarray(hi)]))


class TestDrainBudgetPoison:
    """Exhausting the freerun drain budget must be LOUD, not a silent
    truncation (ADVICE r3): walks that could not finish within max_rounds
    carry -1 in their final position; every non-poisoned walk stays
    bit-identical to the jnp reference."""

    def test_exhausted_budget_poisons_final_position(self):
        from torch_random_walk_tpu.ops.node2vec import (
            node2vec_walk_csr_mixture,
        )
        from torch_random_walk_tpu.ops.walk import fat6_for

        g = random_graph(400, 6, seed=71)
        es = edge_set_for(g)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        length = 12
        fat6 = fat6_for(g)
        ref = node2vec_walk_csr_mixture(g.row_ptr, g.col_idx, targets, 0.5,
                                        2.0, length, 7, g.layout.deg_bits,
                                        search_iters=g.search_iters)
        # slack ~0 collapses the main scan phase; max_rounds=1 leaves a
        # drain budget far below what a length-12 walk needs.
        starved = fatwalk._node2vec_freerun(
            fat6[0], fat6[1], es.table, targets, FatMeta.of(g), es.log_size,
            es.salt, 0.5, 2.0, length, seed=7, max_rounds=1, slack=0.01)
        starved = np.asarray(starved)
        poisoned = starved[:, length] == -1
        assert poisoned.any(), "starved run should have unfinished walks"
        np.testing.assert_array_equal(starved[~poisoned],
                                      np.asarray(ref)[~poisoned])

    def test_default_budget_never_poisons(self):
        from torch_random_walk_tpu.ops.node2vec import (
            node2vec_walk_csr_mixture,
        )
        from torch_random_walk_tpu.ops.walk import fat6_for

        g = random_graph(400, 6, seed=72)
        es = edge_set_for(g)
        targets = jnp.arange(4096, dtype=jnp.int32) % g.num_nodes
        fat6 = fat6_for(g)
        ref = node2vec_walk_csr_mixture(g.row_ptr, g.col_idx, targets, 0.5,
                                        2.0, 12, 8, g.layout.deg_bits,
                                        search_iters=g.search_iters)
        full = fatwalk._node2vec_freerun(
            fat6[0], fat6[1], es.table, targets, FatMeta.of(g), es.log_size,
            es.salt, 0.5, 2.0, 12, seed=8)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(full))


class TestEdgeListFreerun:
    """The r4 free-running biased edge-list engine vs the step-synchronous
    cross-check: identical counters consumed in per-lane round order must
    give bit-identical walks at any batch size, both restart modes."""

    @pytest.mark.parametrize("restart", [True, False])
    @pytest.mark.parametrize("num_walkers", [512, 4096])
    def test_freerun_equals_stepwise(self, restart, num_walkers):
        from torch_random_walk_tpu.graph.edge_list import EdgeListGraph

        rng = np.random.default_rng(81)
        n = 500
        src = rng.integers(0, n, n * 5)
        dst = rng.integers(0, n, n * 5)
        keep = src < (3 * n) // 4  # dead ends exercise pad/jump
        from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list

        el = EdgeListGraph.from_arrays(
            np.stack([src[keep], dst[keep]], axis=1), num_nodes=n)
        es = _edge_set_for_edge_list(el)
        targets = jnp.arange(num_walkers, dtype=jnp.int32) % n
        kw = dict(meta=fatwalk.FatMeta(layout=el.layout, num_nodes=n,
                                       num_edges=el.num_edges),
                  hash_log_size=es.log_size,
                  hash_salt=es.salt, p=0.5, q=2.0, walk_length=12,
                  seed=9, padding_idx=n, restart=restart)
        old = fatwalk._node2vec_edge_list_stepwise(
            el.edge_tab, el.node_tab, es.table, targets, **kw)
        new = fatwalk.node2vec_walk_edge_list_freerun(
            el.edge_tab, el.node_tab, es.table, targets, **kw)
        np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
