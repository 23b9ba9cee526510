"""ShardedKGEmbedding: fused dp x mp KG training step on the virtual mesh."""

import numpy as np
import jax.numpy as jnp
import pytest

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.models.kge import KGEmbedding, KGEmbeddingConfig
from torch_random_walk_tpu.parallel.mesh import make_mesh
from torch_random_walk_tpu.parallel.kge_trainer import (
    ShardedKGEmbedding,
    ShardedKGEmbeddingConfig,
)


def chain_kg(n=48):
    t = [(i, 0, i + 1) for i in range(n - 1)]
    t += [(i, 1, i + 2) for i in range(n - 2)]
    return trw.TriplesGraph.from_arrays(np.array(t), num_entities=n)


@pytest.mark.parametrize("objective", ["transe", "skipgram"])
def test_sharded_kge_step_runs_and_learns(objective):
    mesh = make_mesh((4, 2), ("data", "model"))
    g = chain_kg()
    cfg = ShardedKGEmbeddingConfig(dim=16, walk_length=6, window_size=2,
                                   objective=objective, learning_rate=5e-2)
    trainer = ShardedKGEmbedding(g, mesh, cfg)
    params, opt_state = trainer.init()
    key = "ent" if objective == "transe" else "ent_in"
    assert tuple(params[key].sharding.spec) == (None, "model")
    targets = np.arange(48, dtype=np.int32) % g.num_entities
    losses = []
    for epoch in range(8):
        params, opt_state, loss = trainer.train_step(params, opt_state,
                                                     targets, epoch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("objective",
                         ["transe", "distmult", "skipgram", "cbow"])
def test_sharded_kge_matches_single_device(objective):
    """First-step loss under the dp x mp mesh equals the single-device
    trainer's — the walks, batches, and losses are the same pure function
    of (seed, epoch, targets) regardless of sharding."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = chain_kg()
    cfg_s = ShardedKGEmbeddingConfig(dim=16, walk_length=6, window_size=2,
                                     objective=objective, seed=9)
    trainer = ShardedKGEmbedding(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(24, dtype=np.int32) % g.num_entities
    _, _, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch=0)

    single = KGEmbedding(g, KGEmbeddingConfig(
        dim=16, walk_length=6, window_size=2, objective=objective, seed=9))
    p1, o1 = single.init()
    _, _, loss_single = single.epoch_step(p1, o1, jnp.asarray(targets), 0)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)


def test_sharded_kge_pure_dp_mesh():
    """On a mesh without a 'model' axis the tables stay replicated and the
    step still runs (the mp spec degrades to P())."""
    mesh = make_mesh((8,), ("data",))
    g = chain_kg()
    cfg = ShardedKGEmbeddingConfig(dim=8, walk_length=4, objective="transe")
    trainer = ShardedKGEmbedding(g, mesh, cfg)
    params, opt_state = trainer.init()
    targets = np.arange(16, dtype=np.int32) % g.num_entities
    params, opt_state, loss = trainer.train_step(params, opt_state, targets)
    assert np.isfinite(float(loss))


def test_sharded_sparse_matches_single_device():
    """Touched-rows lazy Adam under the dp x mp mesh: first-step loss (and
    the step itself) must equal the unsharded sparse trainer's."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = chain_kg()
    cfg_s = ShardedKGEmbeddingConfig(dim=16, walk_length=6,
                                     objective="transe", seed=3,
                                     update_mode="sparse")
    trainer = ShardedKGEmbedding(g, mesh, cfg_s)
    p_s, o_s = trainer.init()
    targets = np.arange(24, dtype=np.int32) % g.num_entities
    p_s, o_s, loss_sharded = trainer.train_step(p_s, o_s, targets, epoch=0)

    single = KGEmbedding(g, KGEmbeddingConfig(
        dim=16, walk_length=6, objective="transe", seed=3,
        update_mode="sparse"))
    p1, o1 = single.init()
    p1, o1, loss_single = single.epoch_step(p1, o1, jnp.asarray(targets), 0)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_s["ent"]), np.asarray(p1["ent"]),
                               rtol=1e-5, atol=1e-7)


def test_rotate_relation_sharding_guard():
    """RotatE relations are (R, dim/2): a dim whose HALF doesn't divide
    the model axis must fail loudly at construction, not deep in
    device_put (review finding)."""
    mesh = make_mesh((4, 2), ("data", "model"))
    g = chain_kg(16)
    with pytest.raises(ValueError, match="dim/2"):
        ShardedKGEmbedding(g, mesh, ShardedKGEmbeddingConfig(
            dim=6, objective="rotate"))
    # dim=8 -> 4 phases, divisible by 2: fine.
    tr = ShardedKGEmbedding(g, mesh, ShardedKGEmbeddingConfig(
        dim=8, objective="rotate"))
    p, o = tr.init()
    p, o, loss = tr.train_step(p, o, np.arange(16, dtype=np.int32))
    assert np.isfinite(float(loss))
