"""Alias-method negative sampling (utils/alias.py) and its trainer wiring.

The reference's negatives are plain uniform (windows_cpu.cpp:67-71) —
uniform stays the default everywhere; degree75 is the word2vec-standard
unigram^{3/4} option for the block-mode shared negatives.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.utils import prng
from torch_random_walk_tpu.utils.alias import (
    build_alias,
    degree75_weights,
    sample_alias,
    shared_negative_ids_alias,
)


def _empirical(weights, n_draws=200_000, seed=5):
    prob, alias = build_alias(weights)
    key = prng.derive_key(seed, prng.STREAM_TRAIN)
    ids = jnp.arange(n_draws, dtype=jnp.uint32)
    b0, b1 = prng.counter_bits(key, ids, jnp.zeros_like(ids))
    draws = np.asarray(sample_alias(prob, alias, b0, b1))
    return np.bincount(draws, minlength=len(weights)) / n_draws


def test_alias_matches_distribution():
    w = np.asarray([1.0, 2.0, 4.0, 8.0, 0.5, 0.0, 3.5])
    freq = _empirical(w)
    np.testing.assert_allclose(freq, w / w.sum(), atol=5e-3)
    assert freq[5] == 0.0  # zero-weight slot never drawn


def test_alias_uniform_special_case():
    freq = _empirical(np.ones(16))
    np.testing.assert_allclose(freq, 1 / 16, atol=5e-3)


def test_alias_rejects_bad_weights():
    with pytest.raises(ValueError):
        build_alias([])
    with pytest.raises(ValueError):
        build_alias([0.0, 0.0])
    with pytest.raises(ValueError):
        build_alias([1.0, -1.0])


def test_degree75_weights():
    g = trw.CSRGraph.from_edges([0, 0, 0, 1], [1, 2, 3, 0], num_nodes=5)
    w = degree75_weights(g.row_ptr)
    np.testing.assert_allclose(w, [3**0.75, 1.0, 0.0, 0.0, 0.0])


def test_shared_negative_ids_alias_deterministic():
    prob, alias = build_alias([1.0, 3.0, 6.0])
    a = np.asarray(shared_negative_ids_alias(9, 64, prob, alias))
    b = np.asarray(shared_negative_ids_alias(9, 64, prob, alias))
    assert (a == b).all()
    c = np.asarray(shared_negative_ids_alias(10, 64, prob, alias))
    assert (a != c).any()


def _toy_graph(n=64):
    rng = np.random.default_rng(0)
    src = np.concatenate([np.arange(n), rng.integers(0, n, 3 * n)])
    dst = np.concatenate([(np.arange(n) + 1) % n, rng.integers(0, n, 3 * n)])
    return trw.CSRGraph.from_edges(src, dst, num_nodes=n, symmetrize=True)


def test_node2vec_degree75_trains_and_differs_from_uniform():
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig

    g = _toy_graph()
    base = dict(dim=8, walk_length=6, window_size=3, learning_rate=5e-2,
                seed=4)
    n2v_u = Node2Vec(g, Node2VecConfig(**base))
    n2v_d = Node2Vec(g, Node2VecConfig(**base,
                                       negative_distribution="degree75"))
    targets = jnp.arange(32, dtype=jnp.int32) % g.num_nodes
    pu, ou = n2v_u.init()
    pd, od = n2v_d.init()
    lu = ld = None
    for epoch in range(4):
        pu, ou, lu = n2v_u.epoch_step(pu, ou, targets, jnp.uint32(epoch))
        pd, od, ld = n2v_d.epoch_step(pd, od, targets, jnp.uint32(epoch))
    assert np.isfinite(float(lu)) and np.isfinite(float(ld))
    # Same walks, different negative ids -> different losses/params.
    assert float(lu) != float(ld)
    # Determinism of the degree75 path.
    pd2, od2 = n2v_d.init()
    for epoch in range(4):
        pd2, od2, ld2 = n2v_d.epoch_step(pd2, od2, targets, jnp.uint32(epoch))
    assert float(ld) == float(ld2)


def test_degree75_requires_block_mode():
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig

    with pytest.raises(ValueError, match="block"):
        Node2Vec(_toy_graph(), Node2VecConfig(
            train_mode="windows", negative_distribution="degree75"))


def test_sharded_degree75_matches_single_device():
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
    from torch_random_walk_tpu.parallel.mesh import make_mesh
    from torch_random_walk_tpu.parallel.trainer import (
        ShardedNode2Vec,
        ShardedNode2VecConfig,
    )

    g = _toy_graph()
    mesh = make_mesh((4, 2), ("data", "model"))
    cfg_s = ShardedNode2VecConfig(dim=8, walk_length=6, window_size=3,
                                  seed=6, negative_distribution="degree75")
    tr = ShardedNode2Vec(g, mesh, cfg_s)
    p_s, o_s = tr.init()
    targets = np.arange(32, dtype=np.int32) % g.num_nodes
    _, _, loss_s = tr.train_step(p_s, o_s, targets, epoch=0)

    single = Node2Vec(g, Node2VecConfig(dim=8, walk_length=6, window_size=3,
                                        seed=6,
                                        negative_distribution="degree75"))
    p1, o1 = single.init()
    _, _, loss_1 = single.epoch_step(p1, o1, jnp.asarray(targets),
                                     jnp.uint32(0))
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)
