"""Owner-routed partitioned walk engine (parallel/partition_v2.py).

Bit-identity to the single-device engines on the 8-device virtual CPU mesh,
carry-over correctness under deliberately starved capacities, and the
exchange accounting the bench harness consumes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.parallel.mesh import make_mesh
from torch_random_walk_tpu.parallel.partition import (
    PartitionedCSR,
    build_partition_hashes,
)
from torch_random_walk_tpu.parallel.partition_v2 import (
    RoutedConfig,
    build_partition_blooms,
    walk_partitioned_node2vec_routed,
    walk_partitioned_routed,
)


def random_graph(n, avg_deg, seed, with_dead_ends=False):
    rng = np.random.default_rng(seed)
    e = n * avg_deg
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    if with_dead_ends:
        keep = src < (3 * n) // 4
        src, dst = src[keep], dst[keep]
    return CSRGraph.from_edges(src, dst, num_nodes=n)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


class TestRoutedUniform:
    @pytest.mark.parametrize("dead_ends", [False, True])
    def test_bit_identical_to_single_device(self, mesh, dead_ends):
        g = random_graph(2000, 6, seed=41, with_dead_ends=dead_ends)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 20, seed=9)
        # Dead-end graphs absorb walkers onto a few nodes: one shard may log
        # nearly everything, so give the log full-batch capacity.
        cfg = RoutedConfig(pair_capacity=512, log_capacity=512 * 21,
                           max_phases=120)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 20, seed=9,
                                              config=cfg)
        assert info["overflow_dropped"] == 0
        assert info["log_entries"] == 512 * 21
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_starved_capacity_carries_not_drops(self, mesh):
        """With pair capacity far below demand, walkers lag phases via the
        carry buffer but the output is still exact."""
        g = random_graph(1000, 5, seed=42)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        cfg = RoutedConfig(pair_capacity=16, log_capacity=8192,
                           max_phases=4000, carry_capacity=512)
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 8, seed=3)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 8, seed=3,
                                              config=cfg)
        assert info["overflow_dropped"] == 0
        assert info["phases"] > 9  # provably lagged
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_truncated_run_raises(self, mesh):
        """max_phases too small to finish => loud RuntimeError, never a
        silently short walk tensor."""
        g = random_graph(1000, 5, seed=42)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        cfg = RoutedConfig(pair_capacity=16, log_capacity=8192,
                           max_phases=4, carry_capacity=512)
        with pytest.raises(RuntimeError, match="routed walk incomplete"):
            walk_partitioned_routed(pg, targets, mesh, 8, seed=3, config=cfg)

    def test_default_config_survives_absorbing_log_skew(self, mesh):
        """Dead-end graphs absorb walkers onto a few nodes, so one shard
        can log nearly all B*(L+1) entries.  The default RoutedConfig now
        sizes the log at the true worst case — no manual override, no
        RuntimeError (r2 review finding: the 'zero-drop default' claim)."""
        g = random_graph(2000, 6, seed=41, with_dead_ends=True)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 20, seed=9)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 20, seed=9)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_default_config_zero_drop_under_skew(self, mesh):
        """The auto RoutedConfig must never drop records even when every
        walker starts on one shard (carry >= B guarantee)."""
        g = random_graph(1000, 5, seed=47)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.zeros(1024, jnp.int32)
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 10, seed=2)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 10, seed=2)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_skewed_targets_single_owner(self, mesh):
        """All walkers start on one shard (worst-case arrival hot spot)."""
        g = random_graph(1600, 6, seed=43)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.zeros(256, jnp.int32)  # all on shard 0
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 12, seed=5)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 12, seed=5)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

class TestOverlappedSchedule:
    """schedule="overlapped" (r5): two-pipeline software-pipelined phases —
    each while body exchanges one half-frontier while locally sampling the
    other, so the all_to_all can hide under on-partition gathers.  Records
    never migrate between pipelines and draws are unchanged, so walks must
    be bit-identical to the serial schedule (and hence to the single-device
    engines); each hop costs two (cheaper) phases, so the phase count
    roughly doubles while the exchanged-record total is unchanged."""

    @pytest.mark.parametrize("dead_ends", [False, True])
    def test_uniform_bit_identical(self, mesh, dead_ends):
        g = random_graph(2000, 6, seed=45, with_dead_ends=dead_ends)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 20, seed=9)
        w, info = walk_partitioned_routed(pg, targets, mesh, 20, seed=9,
                                          schedule="overlapped")
        assert info["overflow_dropped"] == 0
        assert info["schedule"] == "overlapped"
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(w))

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25)])
    def test_node2vec_bit_identical(self, mesh, p, q):
        g = random_graph(2000, 6, seed=46)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        hashes = build_partition_hashes(pg, g)
        blooms = build_partition_blooms(pg, g)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, p, q, 14,
                                seed=3, search_iters=g.search_iters)
        w, info = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, p, q, 14, seed=3, blooms=blooms,
            schedule="overlapped")
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(w))

    def test_node2vec_search_membership_overlapped(self, mesh):
        g = random_graph(2000, 6, seed=47)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        blooms = build_partition_blooms(pg, g)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, 0.5, 2.0, 14,
                                seed=3, search_iters=g.search_iters)
        w, _ = walk_partitioned_node2vec_routed(
            pg, None, targets, mesh, 0.5, 2.0, 14, seed=3, blooms=blooms,
            schedule="overlapped")
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(w))

    def test_record_totals_match_serial(self, mesh):
        g = random_graph(2000, 6, seed=48)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        _, ser = walk_partitioned_routed(pg, targets, mesh, 16, seed=5)
        _, ovl = walk_partitioned_routed(pg, targets, mesh, 16, seed=5,
                                         schedule="overlapped")
        # Same records travel, split across two pipelines; only the phase
        # schedule differs.
        assert ovl["exchanged_records"] == ser["exchanged_records"]
        assert ovl["phases"] > ser["phases"]

    def test_triples_bit_identical(self, mesh):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedTriples,
            walk_triples_partitioned_routed,
        )

        rng = np.random.default_rng(9)
        t = np.stack([rng.integers(0, 700, 4000),
                      rng.integers(0, 8, 4000),
                      rng.integers(0, 1000, 4000)], axis=1)
        g = trw.TriplesGraph.from_arrays(t, num_entities=1000)
        pad = g.num_entities + 3
        pg = PartitionedTriples.from_triples(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_entities
        routed, info = walk_triples_partitioned_routed(
            pg, targets, mesh, walk_length=7, padding_idx=pad, seed=11,
            schedule="overlapped")
        assert info["overflow_dropped"] == 0
        assert info["terminated"] == 256
        single = trw.walk_triples(g, target_nodes=targets, walk_length=7,
                                  padding_idx=pad, seed=11)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    @pytest.mark.parametrize("restart", [True, False])
    def test_edge_list_bit_identical(self, mesh, restart):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            walk_edge_list_partitioned_routed,
        )

        rng = np.random.default_rng(10)
        src = rng.integers(0, 700, 3600)
        dst = rng.integers(0, 1000, 3600)
        g = trw.EdgeListGraph.from_arrays(
            np.stack([src, dst], axis=1), num_nodes=1000)
        pad = 1000
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % 700
        routed, info = walk_edge_list_partitioned_routed(
            pg, targets, mesh, walk_length=9, padding_idx=pad,
            restart=restart, seed=4, schedule="overlapped")
        assert info["overflow_dropped"] == 0
        single = trw.walk_edge_list(g, target_nodes=targets, walk_length=9,
                                    seed=4, padding_idx=pad, restart=restart)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    def test_edge_list_biased_bit_identical(self, mesh):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            build_edge_list_partition_blooms,
            build_edge_list_partition_hashes,
            walk_edge_list_node2vec_partitioned_routed,
        )

        rng = np.random.default_rng(11)
        src = rng.integers(0, 630, 3600)
        dst = rng.integers(0, 900, 3600)
        g = trw.EdgeListGraph.from_arrays(
            np.stack([src, dst], axis=1), num_nodes=900)
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        hashes = build_edge_list_partition_hashes(pg, g)
        blooms = build_edge_list_partition_blooms(pg, g)
        targets = jnp.arange(256, dtype=jnp.int32) % 630
        routed, info = walk_edge_list_node2vec_partitioned_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, walk_length=8,
            padding_idx=900, restart=True, seed=6, blooms=blooms,
            schedule="overlapped")
        assert info["overflow_dropped"] == 0
        single = trw.walk_edge_list(g, target_nodes=targets, p=0.5, q=2.0,
                                    walk_length=8, seed=6, padding_idx=900,
                                    restart=True)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))


class TestRoutedNode2vec:
    def _ref(self, g, targets, p, q, length, seed):
        return node2vec_walk_csr(g.row_ptr, g.col_idx, targets, p, q, length,
                                 seed=seed, search_iters=g.search_iters)

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25), (0.5, 1.0)])
    def test_bit_identical_to_single_device(self, mesh, p, q):
        g = random_graph(2000, 6, seed=51)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        hashes = build_partition_hashes(pg, g)
        blooms = build_partition_blooms(pg, g)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = self._ref(g, targets, p, q, 12, 7)
        walks, info = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, p, q, 12, seed=7, blooms=blooms)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_bit_identical_without_blooms(self, mesh):
        """blooms=None (saturated filters) must give the same walks — every
        in-band draw just takes the exact remote path."""
        g = random_graph(1500, 6, seed=55)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        hashes = build_partition_hashes(pg, g)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        ref = self._ref(g, targets, 0.5, 2.0, 8, 7)
        walks, _ = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 8, seed=7)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    @pytest.mark.parametrize("p,q", [(0.5, 2.0), (4.0, 0.25)])
    def test_search_membership_identical(self, mesh, p, q):
        """hashes=None (r4, VERDICT r3 #5): the distance-1 test binary-
        searches t's sorted row in the local col slice instead of probing a
        per-shard cuckoo — zero membership memory (the 10.7 GB/shard term
        of the papers100M D=8 budget), bit-identical walks."""
        g = random_graph(2000, 6, seed=51)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        blooms = build_partition_blooms(pg, g)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        ref = self._ref(g, targets, p, q, 12, 7)
        walks, info = walk_partitioned_node2vec_routed(
            pg, None, targets, mesh, p, q, 12, seed=7, blooms=blooms)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_search_membership_dead_ends_no_blooms(self, mesh):
        g = random_graph(1500, 5, seed=52, with_dead_ends=True)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        ref = self._ref(g, targets, 0.5, 2.0, 10, 3)
        walks, info = walk_partitioned_node2vec_routed(
            pg, None, targets, mesh, 0.5, 2.0, 10, seed=3)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_dead_ends_bit_identical(self, mesh):
        g = random_graph(2000, 5, seed=52, with_dead_ends=True)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        hashes = build_partition_hashes(pg, g)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        cfg = RoutedConfig(pair_capacity=256, log_capacity=256 * 11,
                           max_phases=200)
        ref = self._ref(g, targets, 0.5, 2.0, 10, 3)
        walks, info = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 10, seed=3, config=cfg)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_collectives_per_step_amortized(self, mesh):
        """One all_to_all per phase, <= 3 phases per walk step amortized:
        ~1.3-1.6 draw/resolve phases (v1 paid 2 psums per rejection round,
        ~7 rounds-worth of full-frontier traffic per step) plus exactly one
        LOG hop per step — the price of even-share O(B*L/D) per-shard walk
        memory (VERDICT r2 item 4; was O(B*L) per shard)."""
        g = random_graph(4000, 8, seed=53)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        hashes = build_partition_hashes(pg, g)
        blooms = build_partition_blooms(pg, g)
        targets = jnp.arange(1024, dtype=jnp.int32) % g.num_nodes
        length = 16
        walks, info = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, length, seed=11,
            blooms=blooms)
        assert info["overflow_dropped"] == 0
        assert info["collectives_per_step"] <= 3.0, info
        # Exchange volume is O(B) per phase, not O(B * D).
        assert info["exchange_bytes"] < 56 * 4 * 1024 * (length + 2)

    def test_starved_capacity_exact(self, mesh):
        g = random_graph(1000, 5, seed=54)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        hashes = build_partition_hashes(pg, g)
        cfg = RoutedConfig(pair_capacity=16, log_capacity=4096,
                           max_phases=4000, carry_capacity=1024)
        ref = self._ref(g, targets, 0.5, 2.0, 6, 5)
        walks, info = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 6, seed=5, config=cfg)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))

    def test_uniform_exchange_accounting(self, mesh):
        """O(B)-byte exchange: records sent ~= B * L (one routing record per
        walker-step), nothing proportional to B * D."""
        g = random_graph(2000, 6, seed=44)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        num, length = 512, 10
        targets = jnp.arange(num, dtype=jnp.int32) % g.num_nodes
        _, info = walk_partitioned_routed(pg, targets, mesh, length, seed=1)
        sent = info["exchanged_records"]
        assert num * length <= sent <= 2 * num * (length + 1)
        assert info["exchange_bytes"] == sent * 12


class TestRoutedTriples:
    """Owner-routed KG-triples walks (PartitionedTriples)."""

    def _random_kg(self, n, avg_deg, seed, dead_frac=0.25):
        import torch_random_walk_tpu as trw

        rng = np.random.default_rng(seed)
        t = n * avg_deg
        heads = rng.integers(0, max(int(n * (1 - dead_frac)), 1), t)
        rels = rng.integers(0, 8, t)
        tails = rng.integers(0, n, t)
        triples = np.stack([heads, rels, tails], axis=1)
        return trw.TriplesGraph.from_arrays(triples, num_entities=n)

    @pytest.mark.parametrize("dead_frac", [0.0, 0.3])
    def test_bit_identical_to_single_device(self, mesh, dead_frac):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedTriples,
            walk_triples_partitioned_routed,
        )

        g = self._random_kg(1000, 5, seed=7, dead_frac=dead_frac)
        pad = g.num_entities + 3
        pg = PartitionedTriples.from_triples(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_entities
        routed, info = walk_triples_partitioned_routed(
            pg, targets, mesh, walk_length=7, padding_idx=pad, seed=11)
        assert info["overflow_dropped"] == 0
        assert info["terminated"] == 256
        single = trw.walk_triples(g, target_nodes=targets, walk_length=7,
                                  padding_idx=pad, seed=11)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    def test_hub_head_and_carry_starvation(self, mesh):
        """One head owns most triples (all walkers route to its shard) and
        capacities are deliberately starved: carry-over must queue, not
        drop, and the result stays bit-identical."""
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedTriples,
            walk_triples_partitioned_routed,
        )

        rng = np.random.default_rng(3)
        n = 64
        hub = [(h, 0, 0) for h in range(n)]  # every entity points at 0
        fan = [(0, 1, t) for t in range(n)]  # entity 0 fans out everywhere
        g = trw.TriplesGraph.from_arrays(np.array(hub + fan), num_entities=n)
        pg = PartitionedTriples.from_triples(g, mesh.devices.size)
        targets = jnp.arange(64, dtype=jnp.int32)
        cfg = RoutedConfig(pair_capacity=8, log_capacity=64 * 7,
                           max_phases=400, carry_capacity=64)
        routed, info = walk_triples_partitioned_routed(
            pg, targets, mesh, walk_length=6, padding_idx=n, seed=5,
            config=cfg)
        assert info["overflow_dropped"] == 0
        single = trw.walk_triples(g, target_nodes=targets, walk_length=6,
                                  padding_idx=n, seed=5)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    def test_all_absorbed_terminates_early(self, mesh):
        """A KG whose every walk absorbs at step 1 must finish in ~1 phase
        chain, log only real transitions, and still match single-device."""
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedTriples,
            walk_triples_partitioned_routed,
        )

        n = 32
        # Heads 0..7 each have one triple to a dead entity (no out-triples).
        triples = np.array([(h, 2, 24 + h) for h in range(8)])
        g = trw.TriplesGraph.from_arrays(triples, num_entities=n)
        pg = PartitionedTriples.from_triples(g, mesh.devices.size)
        targets = jnp.arange(32, dtype=jnp.int32) % n
        routed, info = walk_triples_partitioned_routed(
            pg, targets, mesh, walk_length=5, padding_idx=n, seed=2)
        single = trw.walk_triples(g, target_nodes=targets, walk_length=5,
                                  padding_idx=n, seed=2)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))
        assert info["terminated"] == 32
        # Dead-head walkers log 1 entry, absorbed-at-step-2 walkers log 2.
        assert info["log_entries"] < 32 * 5

    def test_divisibility_error(self, mesh):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedTriples,
            walk_triples_partitioned_routed,
        )

        g = self._random_kg(100, 3, seed=1)
        pg = PartitionedTriples.from_triples(g, mesh.devices.size)
        with pytest.raises(ValueError, match="divisible"):
            walk_triples_partitioned_routed(
                pg, jnp.arange(13, dtype=jnp.int32), mesh, 4, 100)


class TestRoutedEdgeList:
    """Owner-routed edge-list walks (PartitionedEdgeList): padding/restart
    dead-end semantics resolved locally via the target word in the record."""

    def _graph(self, n, avg_deg, seed, dead_frac=0.3):
        import torch_random_walk_tpu as trw

        rng = np.random.default_rng(seed)
        e = n * avg_deg
        src = rng.integers(0, max(int(n * (1 - dead_frac)), 1), e)
        dst = rng.integers(0, n, e)
        return trw.EdgeListGraph.from_arrays(
            np.stack([src, dst], axis=1), num_nodes=n)

    @pytest.mark.parametrize("restart", [True, False])
    def test_bit_identical_to_single_device(self, mesh, restart):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            walk_edge_list_partitioned_routed,
        )

        g = self._graph(1200, 4, seed=17)
        pad = g.num_nodes + 9
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        targets = jnp.arange(256, dtype=jnp.int32) % g.num_nodes
        routed, info = walk_edge_list_partitioned_routed(
            pg, targets, mesh, walk_length=9, padding_idx=pad,
            restart=restart, seed=23)
        assert info["overflow_dropped"] == 0
        assert info["terminated"] == 256
        single = trw.walk_edge_list(g, target_nodes=targets, walk_length=9,
                                    seed=23, padding_idx=pad,
                                    restart=restart)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    def test_restart_cycles_through_dead_ends(self, mesh):
        """A graph where EVERY walk hits a dead end repeatedly: restart
        keeps walkers bouncing back to their targets (the fused local jump),
        still bit-identical and zero-drop."""
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            walk_edge_list_partitioned_routed,
        )

        n = 48
        # Nodes 0..15 each point at one dead node (16..47 have no edges).
        el = np.stack([np.arange(16), 16 + np.arange(16) % 32], axis=1)
        g = trw.EdgeListGraph.from_arrays(el, num_nodes=n)
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        targets = jnp.arange(48, dtype=jnp.int32) % 16
        routed, info = walk_edge_list_partitioned_routed(
            pg, targets, mesh, walk_length=8, padding_idx=n, restart=True,
            seed=31)
        single = trw.walk_edge_list(g, target_nodes=targets, walk_length=8,
                                    seed=31, padding_idx=n, restart=True)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))
        assert info["terminated"] == 48

    def test_absorbing_terminates_early(self, mesh):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            walk_edge_list_partitioned_routed,
        )

        n = 48
        el = np.stack([np.arange(16), 16 + np.arange(16)], axis=1)
        g = trw.EdgeListGraph.from_arrays(el, num_nodes=n)
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        targets = jnp.arange(48, dtype=jnp.int32) % 16
        routed, info = walk_edge_list_partitioned_routed(
            pg, targets, mesh, walk_length=10, padding_idx=n, restart=False,
            seed=31)
        single = trw.walk_edge_list(g, target_nodes=targets, walk_length=10,
                                    seed=31, padding_idx=n, restart=False)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))
        # Absorbed walks log only their first two positions.
        assert info["log_entries"] < 48 * 10


class TestRoutedEdgeListBiased:
    """Owner-routed BIASED (p/q) edge-list walks: the
    ops/edge_list_walk.py::biased_walk_edge_list law (padding/restart,
    pad-candidate prob_0 branch, fused pad->jump accepts) distributed with
    Bloom-in-record local decisions + exact resolution at owner(t)."""

    def _setup(self, mesh, n=900, avg_deg=4, seed=5, dead_frac=0.3):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            build_edge_list_partition_blooms,
            build_edge_list_partition_hashes,
        )

        rng = np.random.default_rng(seed)
        e = n * avg_deg
        src = rng.integers(0, max(int(n * (1 - dead_frac)), 1), e)
        dst = rng.integers(0, n, e)
        g = trw.EdgeListGraph.from_arrays(
            np.stack([src, dst], axis=1), num_nodes=n)
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        return (g, pg, build_edge_list_partition_hashes(pg, g),
                build_edge_list_partition_blooms(pg, g))

    @pytest.mark.parametrize("restart", [True, False])
    @pytest.mark.parametrize("pq", [(0.5, 2.0), (4.0, 0.25)])
    def test_bit_identical_to_single_device(self, mesh, restart, pq):
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            walk_edge_list_node2vec_partitioned_routed,
        )

        p, q = pq
        g, pg, hashes, blooms = self._setup(mesh)
        pad = g.num_nodes
        targets = jnp.arange(128, dtype=jnp.int32) % g.num_nodes
        routed, info = walk_edge_list_node2vec_partitioned_routed(
            pg, hashes, targets, mesh, p, q, 9, pad, restart=restart,
            seed=23, blooms=blooms)
        assert info["overflow_dropped"] == 0
        assert info["terminated"] == 128
        single = trw.walk_edge_list(g, target_nodes=targets, p=p, q=q,
                                    walk_length=9, seed=23, padding_idx=pad,
                                    restart=restart)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))

    def test_no_blooms_identical(self, mesh):
        """Omitting blooms (saturated filters: every in-band draw resolves
        remotely) must not change the walks, only the traffic."""
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            walk_edge_list_node2vec_partitioned_routed,
        )

        g, pg, hashes, blooms = self._setup(mesh, n=300, seed=9)
        pad = g.num_nodes
        targets = jnp.arange(64, dtype=jnp.int32) % g.num_nodes
        with_b, info_b = walk_edge_list_node2vec_partitioned_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 7, pad, seed=3,
            blooms=blooms)
        without, info_n = walk_edge_list_node2vec_partitioned_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 7, pad, seed=3)
        np.testing.assert_array_equal(np.asarray(with_b), np.asarray(without))
        single = trw.walk_edge_list(g, target_nodes=targets, p=0.5, q=2.0,
                                    walk_length=7, seed=3, padding_idx=pad,
                                    restart=True)
        np.testing.assert_array_equal(np.asarray(with_b), np.asarray(single))
        assert info_n["exchanged_records"] >= info_b["exchanged_records"]

    def test_absorbing_terminates_early(self, mesh):
        """Every walk dead-ends immediately: absorbed walkers stop shipping
        records and the pad tail is pre-filled at assembly."""
        import torch_random_walk_tpu as trw
        from torch_random_walk_tpu.parallel.partition_v2 import (
            PartitionedEdgeList,
            build_edge_list_partition_blooms,
            build_edge_list_partition_hashes,
            walk_edge_list_node2vec_partitioned_routed,
        )

        n = 48
        el = np.stack([np.arange(16), 16 + np.arange(16)], axis=1)
        g = trw.EdgeListGraph.from_arrays(el, num_nodes=n)
        pg = PartitionedEdgeList.from_edge_list(g, mesh.devices.size)
        hashes = build_edge_list_partition_hashes(pg, g)
        blooms = build_edge_list_partition_blooms(pg, g)
        targets = jnp.arange(48, dtype=jnp.int32) % 16
        routed, info = walk_edge_list_node2vec_partitioned_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, 10, n, restart=False,
            seed=31, blooms=blooms)
        single = trw.walk_edge_list(g, target_nodes=targets, p=0.5, q=2.0,
                                    walk_length=10, seed=31, padding_idx=n,
                                    restart=False)
        np.testing.assert_array_equal(np.asarray(routed), np.asarray(single))
        assert info["terminated"] == 48
        assert info["log_entries"] < 48 * 10


def test_routed_walk_length_zero(mesh):
    """L=0 returns the target-only column for every routed family (review
    finding: the completeness check spuriously fired with no transitions)."""
    import torch_random_walk_tpu as trw
    from torch_random_walk_tpu.parallel.partition_v2 import (
        PartitionedEdgeList,
        PartitionedTriples,
        walk_edge_list_partitioned_routed,
        walk_triples_partitioned_routed,
    )

    kg = trw.TriplesGraph.from_arrays(
        np.array([(i, 0, (i + 1) % 16) for i in range(16)]), num_entities=16)
    pg = PartitionedTriples.from_triples(kg, mesh.devices.size)
    t = jnp.arange(16, dtype=jnp.int32)
    w, info = walk_triples_partitioned_routed(pg, t, mesh, 0, 16)
    assert w.shape == (16, 1) and (np.asarray(w)[:, 0] == np.arange(16)).all()
    assert info["terminated"] == 16

    el = trw.EdgeListGraph.from_arrays(
        np.array([(i, (i + 1) % 16) for i in range(16)]), num_nodes=16)
    pe = PartitionedEdgeList.from_edge_list(el, mesh.devices.size)
    w2, info2 = walk_edge_list_partitioned_routed(pe, t, mesh, 0, 16)
    assert w2.shape == (16, 1)
    assert info2["overflow_dropped"] == 0


def test_large_batch_hub_skew_carry_engages(mesh):
    """VERDICT r2 item 3/4 'done' criterion: a realistic batch (B = 64K) on
    a hub-skewed graph with the DEFAULT RoutedConfig — the capacity
    carry-over machinery provably engages at volume (walkers lag phases
    beyond the no-carry minimum of 2(L+1)), zero-drop holds loudly, and
    walks stay bit-identical to the single-device engine.  Per-shard walk
    memory is the even share B*(L+1)/D by construction (the walk tensor is
    the wid-sharded shard_map output itself)."""
    rng = np.random.default_rng(97)
    n, e = 4096, 40_000
    # 85% of edges point INTO 32 hub nodes owned by one shard.
    src = rng.integers(0, n, e)
    dst = np.where(rng.random(e) < 0.85, rng.integers(0, 32, e),
                   rng.integers(0, n, e))
    g = CSRGraph.from_edges(src, dst, num_nodes=n)
    pg = PartitionedCSR.from_csr(g, mesh.devices.size)
    num_walkers, length = 65_536, 8
    targets = jnp.arange(num_walkers, dtype=jnp.int32) % n
    ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, length, seed=5)
    walks, info = walk_partitioned_routed(pg, targets, mesh, length, seed=5)
    assert info["overflow_dropped"] == 0
    assert info["log_entries"] == num_walkers * (length + 1)
    # Hub arrivals exceed per-destination pair capacity -> carry engages
    # and the run takes more than the no-carry phase count.
    assert info["phases"] > 2 * (length + 1), info
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))


class TestConfigResolve:
    """Directly-constructed configs default max_phases to 0; ADVICE r3:
    treat 0 as "auto" (derive the for_walk worst-case-carry bound from the
    config's own pair_capacity) instead of building a while_loop that never
    runs and blaming capacities."""

    def test_zero_max_phases_resolves_to_usable_budget(self):
        cfg = RoutedConfig(pair_capacity=128)
        r = RoutedConfig.resolve(cfg, 512, 8, 20)
        assert r.max_phases > 0
        assert r.pair_capacity == 128      # overrides preserved
        # Budget covers worst-case carry: 2 phases/step plus drain slack.
        assert r.max_phases >= 2 * 20 + 4

    def test_explicit_max_phases_kept(self):
        cfg = RoutedConfig(pair_capacity=128, max_phases=7)
        assert RoutedConfig.resolve(cfg, 512, 8, 20) is cfg

    def test_none_gives_for_walk_default(self):
        r = RoutedConfig.resolve(None, 512, 8, 20)
        assert r == RoutedConfig.for_walk(512, 8, 20)

    def test_zero_budget_walk_runs(self, mesh):
        """An end-to-end walk with a hand-built capacity-only config (the
        pattern every test above uses, minus the manual max_phases) must
        complete instead of raising an incomplete-walk error."""
        g = random_graph(1000, 5, seed=42)
        pg = PartitionedCSR.from_csr(g, mesh.devices.size)
        targets = jnp.arange(512, dtype=jnp.int32) % g.num_nodes
        cfg = RoutedConfig(pair_capacity=512, carry_capacity=512)
        ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 8, seed=3)
        walks, info = walk_partitioned_routed(pg, targets, mesh, 8, seed=3,
                                              config=cfg)
        assert info["overflow_dropped"] == 0
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))
