"""Pallas remote-DMA walker exchange, validated in interpret mode on the
virtual CPU mesh (VERDICT r1 item 7: kernel + interpret-mode test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.sharding import PartitionSpec as P

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.parallel.mesh import make_mesh
from torch_random_walk_tpu.parallel.pallas_exchange import pallas_all_to_all
from torch_random_walk_tpu.parallel.partition import PartitionedCSR
from torch_random_walk_tpu.parallel.partition_v2 import (
    RoutedConfig,
    walk_partitioned_routed,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_matches_xla_all_to_all(mesh):
    """The kernel's semantics == lax.all_to_all(split 0, concat 0)."""
    d = mesh.devices.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 2**32, (d, d, 32, 3), dtype=np.uint64)
                    .astype(np.uint32))

    def via_pallas(xs):
        return pallas_all_to_all(xs[0], "data", d, interpret=True)[None]

    def via_xla(xs):
        return lax.all_to_all(xs[0], "data", split_axis=0, concat_axis=0,
                              tiled=False)[None]

    kw = dict(mesh=mesh, in_specs=P("data"), out_specs=P("data"),
              check_vma=False)
    out_p = jax.jit(jax.shard_map(via_pallas, **kw))(x)
    out_x = jax.jit(jax.shard_map(via_xla, **kw))(x)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_x))


def test_routed_node2vec_through_pallas_exchange(mesh):
    """The BIASED routed engine (walk_partitioned_node2vec_routed) is
    bit-identical to the single-device node2vec path when its exchange runs
    through the Pallas remote-DMA kernel (interpret mode) — the biased
    engine's record layout (14-word STEP/RESOLVE records) exercises the
    kernel's wide-chunk path that the uniform test's 3-word records do not.
    (VERDICT r2 item 8.)"""
    from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
    from torch_random_walk_tpu.parallel.partition import (
        build_partition_hashes,
    )
    from torch_random_walk_tpu.parallel.partition_v2 import (
        build_partition_blooms,
        walk_partitioned_node2vec_routed,
    )

    rng = np.random.default_rng(11)
    n, e = 800, 4000
    g = CSRGraph.from_edges(rng.integers(0, n, e), rng.integers(0, n, e),
                            num_nodes=n)
    pg = PartitionedCSR.from_csr(g, mesh.devices.size)
    hashes = build_partition_hashes(pg, g)
    blooms = build_partition_blooms(pg, g)
    targets = jnp.arange(128, dtype=jnp.int32) % n
    ref = node2vec_walk_csr(g.row_ptr, g.col_idx, targets, 0.5, 2.0, 8,
                            seed=3, search_iters=g.search_iters)
    walks, info = walk_partitioned_node2vec_routed(
        pg, hashes, targets, mesh, 0.5, 2.0, 8, seed=3, blooms=blooms,
        exchange="pallas", exchange_interpret=True)
    assert info["overflow_dropped"] == 0
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))


def test_routed_walk_through_pallas_exchange(mesh):
    """The full routed uniform engine produces bit-identical walks when its
    exchange runs through the Pallas remote-DMA kernel (interpret mode)."""
    rng = np.random.default_rng(7)
    n, e = 800, 4000
    g = CSRGraph.from_edges(rng.integers(0, n, e), rng.integers(0, n, e),
                            num_nodes=n)
    pg = PartitionedCSR.from_csr(g, mesh.devices.size)
    targets = jnp.arange(128, dtype=jnp.int32) % n
    cfg = RoutedConfig(pair_capacity=128, log_capacity=128 * 9,
                       max_phases=40)
    ref = uniform_walk_csr(g.row_ptr, g.col_idx, targets, 8, seed=3)
    walks, info = walk_partitioned_routed(pg, targets, mesh, 8, seed=3,
                                          config=cfg, exchange="pallas",
                                          exchange_interpret=True)
    assert info["overflow_dropped"] == 0
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(walks))
