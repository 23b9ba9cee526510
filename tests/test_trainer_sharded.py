"""ShardedNode2Vec: fused dp x mp training step on a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
from torch_random_walk_tpu.parallel.mesh import make_mesh
from torch_random_walk_tpu.parallel.trainer import (
    ShardedNode2Vec,
    ShardedNode2VecConfig,
)


def toy_graph(n=96):
    rng = np.random.default_rng(0)
    src = np.concatenate([np.arange(n), rng.integers(0, n, 3 * n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, 3 * n)])
    return CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)


def test_sharded_step_runs_and_learns():
    mesh = make_mesh((4, 2), ("data", "model"))
    g = toy_graph()
    cfg = ShardedNode2VecConfig(dim=16, walk_length=8, window_size=3,
                                learning_rate=5e-2)
    trainer = ShardedNode2Vec(g, mesh, cfg)
    params, opt_state = trainer.init()
    # Embedding tables sharded on the feature axis over 'model'.
    spec = params["in_emb"].sharding.spec
    assert tuple(spec) == (None, "model")
    targets = np.arange(64, dtype=np.int32) % g.num_nodes
    losses = []
    for epoch in range(8):
        params, opt_state, loss = trainer.train_step(params, opt_state,
                                                     targets, epoch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_block_2d_mesh_matches_single_device():
    """Blockwise loss under dp x mp: feature-sharded table gathers stay
    chip-local, the contraction psums over 'model', and the first-step loss
    equals the unsharded blockwise trainer's."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = toy_graph()
    cfg_s = ShardedNode2VecConfig(dim=16, walk_length=6, window_size=3,
                                  seed=5, train_mode="block")
    trainer = ShardedNode2Vec(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(32, dtype=np.int32) % g.num_nodes
    _, _, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch=0)

    n2v = Node2Vec(g, Node2VecConfig(dim=16, walk_length=6, window_size=3,
                                     seed=5, train_mode="block"))
    p1, o1 = n2v.init()
    _, _, loss_single = n2v.epoch_step(
        p1, o1, jnp.asarray(targets), jnp.uint32(0))
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)


def test_sharded_windows_mode_still_learns():
    """The reference-shaped materialized-windows pipeline stays available
    under the mesh after 'block' became the default."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = toy_graph()
    cfg = ShardedNode2VecConfig(dim=16, walk_length=8, window_size=3,
                                learning_rate=5e-2, train_mode="windows")
    trainer = ShardedNode2Vec(g, mesh, cfg)
    params, opt_state = trainer.init()
    targets = np.arange(64, dtype=np.int32) % g.num_nodes
    losses = []
    for epoch in range(8):
        params, opt_state, loss = trainer.train_step(params, opt_state,
                                                     targets, epoch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_sparse_update_matches_single_device():
    """Touched-rows lazy Adam under the dp x mp mesh: the global id sort,
    psum'd sub-table gradients and feature-local row scatters must
    reproduce the single-device sparse step (losses AND params after two
    steps)."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = toy_graph()
    cfg_s = ShardedNode2VecConfig(dim=16, walk_length=6, window_size=3,
                                  learning_rate=5e-2, seed=3,
                                  update_mode="sparse")
    trainer = ShardedNode2Vec(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(32, dtype=np.int32) % g.num_nodes

    n2v = Node2Vec(g, Node2VecConfig(dim=16, walk_length=6, window_size=3,
                                     learning_rate=5e-2, seed=3,
                                     update_mode="sparse"))
    p1, o1 = n2v.init()
    for epoch in range(2):
        p_s, o_s, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch)
        p1, o1, loss_single = n2v.epoch_step(
            p1, o1, jnp.asarray(targets), jnp.uint32(epoch))
        np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                                   rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_s["in_emb"]),
                               np.asarray(p1["in_emb"]), rtol=1e-4,
                               atol=1e-6)
    assert int(np.asarray(o_s["count"])) == 2


def test_sharded_biased_matches_single_device_loss():
    """Biased (node2vec) sampling inside the sharded step must run the same
    freerun mixture engine — hence the same walks and loss — as the
    unsharded Node2Vec trainer (the fat6 tables ride into the jitted step
    as replicated arguments)."""
    mesh = make_mesh((8,), ("data",))
    g = toy_graph()
    cfg_s = ShardedNode2VecConfig(dim=8, walk_length=6, window_size=3,
                                  p=0.5, q=2.0, learning_rate=1e-2, seed=3)
    trainer = ShardedNode2Vec(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(32, dtype=np.int32) % g.num_nodes
    _, _, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch=0)

    n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3,
                                     p=0.5, q=2.0, learning_rate=1e-2,
                                     seed=3))
    p1, o1 = n2v.init()
    _, _, loss_single = n2v.epoch_step(
        p1, o1, jnp.asarray(targets), jnp.uint32(0))
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)


def test_sharded_matches_single_device_loss():
    """First-step loss must equal the unsharded fused trainer's (same seeds,
    same walk engine, SPMD is numerics-preserving for this graph size)."""
    mesh = make_mesh((8,), ("data",))
    g = toy_graph()
    cfg_s = ShardedNode2VecConfig(dim=8, walk_length=6, window_size=3,
                                  learning_rate=1e-2, seed=3)
    trainer = ShardedNode2Vec(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(32, dtype=np.int32) % g.num_nodes
    _, _, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch=0)

    n2v = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3,
                                     learning_rate=1e-2, seed=3))
    p1, o1 = n2v.init()
    _, _, loss_single = n2v.epoch_step(
        p1, o1, jnp.asarray(targets), jnp.uint32(0))
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
