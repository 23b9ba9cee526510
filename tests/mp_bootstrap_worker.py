"""Worker for the TRUE multi-process bootstrap test (tests/test_multiprocess.py).

Launched N times as separate OS processes; each process owns a disjoint set
of CPU devices and joins the others through ``jax.distributed.initialize``
(parallel/mesh.init_distributed — the TPU-pod bootstrap path, SURVEY.md
§2.8).  The processes build one global mesh over all devices, run a
data-parallel walk whose batch is sharded ACROSS PROCESSES (collective
traffic rides the cross-process DCN path, not virtual intra-process
devices), and each process verifies its addressable output shards
bit-identical to the single-process reference walk.

Usage: python tests/mp_bootstrap_worker.py <process_id> <num_processes> <port>
Prints "MP_WORKER_OK <pid>" and exits 0 on success.
"""

import sys


def main() -> None:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax

    from torch_random_walk_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == nprocs * len(jax.local_devices())

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from torch_random_walk_tpu.graph.csr import CSRGraph
    from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
    from torch_random_walk_tpu.parallel.walk_dp import walk_data_parallel

    rng = np.random.default_rng(5)
    n, e = 600, 3000
    g = CSRGraph.from_edges(rng.integers(0, n, e), rng.integers(0, n, e),
                            num_nodes=n)
    num_walkers, walk_length = 64, 12
    targets_np = (np.arange(num_walkers) % n).astype(np.int32)

    # Single-device reference, computed identically in every process.
    ref = np.asarray(uniform_walk_csr(g.row_ptr, g.col_idx,
                                      jnp.asarray(targets_np), walk_length,
                                      seed=3))

    mesh = make_mesh()  # all GLOBAL devices, both processes' worth
    sharding = NamedSharding(mesh, P("data"))
    chunk = num_walkers // nprocs
    targets = jax.make_array_from_process_local_data(
        sharding, targets_np[pid * chunk:(pid + 1) * chunk],
        global_shape=(num_walkers,))

    walks = walk_data_parallel(g, targets, mesh, walk_length=walk_length,
                               seed=3)

    # Each process checks the shards it can address (together they cover
    # the whole batch across the two processes).
    checked = 0
    for shard in walks.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data),
                                      ref[shard.index])
        checked += np.asarray(shard.data).shape[0]
    assert checked == num_walkers // nprocs * len(jax.local_devices()) \
        or checked >= chunk, checked
    print(f"MP_WORKER_OK {pid} checked={checked}", flush=True)


if __name__ == "__main__":
    main()
