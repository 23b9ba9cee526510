"""KG embedding trainer tests (models/kge.py).

The reference pipeline ends at triples-window generation
(/root/reference/csrc/cpu/windows_cpu.cpp:161-475); these tests cover the
downstream trainer that consumes those batches: padding masking, determinism,
negative corruption, and end-to-end link-prediction quality on a ring KG
whose structure TransE/DistMult provably capture.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.models.kge import (
    KGEModel, KGEmbedding, KGEmbeddingConfig, corrupt_triples)
from torch_random_walk_tpu.models.eval import kg_tail_ranking_metrics

TRIPLES = [(0, 5, 1), (1, 6, 3), (0, 5, 2), (2, 6, 4), (2, 7, 1),
           (0, 6, 3), (3, 7, 0), (3, 6, 2)]


def toy_graph():
    return trw.TriplesGraph.from_arrays(np.array(TRIPLES), num_entities=5)


def ring_graph(n=40):
    """Directed ring (relation 0 = next, 1 = skip-2).  NOTE: a closed ring
    is NOT TransE-representable (translations around a cycle sum to n*w = 0,
    forcing w = 0 — measured MRR plateaus at ~0.32 for every lr/margin), so
    the ring is only used for the co-occurrence objective."""
    t = [(i, 0, (i + 1) % n) for i in range(n)]
    t += [(i, 1, (i + 2) % n) for i in range(n)]
    return trw.TriplesGraph.from_arrays(np.array(t), num_entities=n)


def chain_graph(n=24):
    """Directed chain (relation 0 = +1, relation 1 = +2): exactly
    TransE-representable (e_i = i*w_0, w_1 = 2*w_0); the tail entities
    dead-end, exercising absorbing-padding windows during training."""
    t = [(i, 0, i + 1) for i in range(n - 1)]
    t += [(i, 1, i + 2) for i in range(n - 2)]
    return trw.TriplesGraph.from_arrays(np.array(t), num_entities=n)


def test_num_relations_field():
    g = toy_graph()
    assert g.num_relations == 8  # max relation id 7 + 1
    assert ring_graph(8).num_relations == 2


def test_corrupt_triples_shapes_and_slots():
    pos = jnp.asarray([[0, 1, 2], [3, 0, 4]], jnp.int32)
    neg = np.asarray(corrupt_triples(pos, 100, 4, seed=7))
    assert neg.shape == (2, 4, 3)
    # Even slots keep head+relation, odd slots keep relation+tail.
    assert (neg[:, 0::2, 0] == np.asarray(pos)[:, None, 0]).all()
    assert (neg[:, 1::2, 2] == np.asarray(pos)[:, None, 2]).all()
    assert (neg[:, :, 1] == np.asarray(pos)[:, None, 1]).all()
    # Deterministic in (seed, epoch); different across seeds.
    again = np.asarray(corrupt_triples(pos, 100, 4, seed=7))
    assert (neg == again).all()
    other = np.asarray(corrupt_triples(pos, 100, 4, seed=8))
    assert (neg != other).any()


def test_pair_loss_masks_padding():
    g = toy_graph()
    m = KGEModel(g.num_entities, g.num_relations, dim=8, objective="transe")
    params, _ = m.init(0)
    pad = 8
    pos = jnp.asarray([[0, 5, 1], [2, 6, 4]], jnp.int32)
    neg = corrupt_triples(pos, g.num_entities, 2, seed=1)
    base = float(m.pair_loss_fn(params, pos, neg, pad))
    # Appending fully-padded positives must not change the masked mean.
    pos2 = jnp.concatenate([pos, jnp.full((3, 3), pad, jnp.int32)])
    neg2 = jnp.concatenate([neg, jnp.full((3, 2, 3), pad, jnp.int32)])
    padded = float(m.pair_loss_fn(params, pos2, neg2, pad))
    np.testing.assert_allclose(padded, base, rtol=1e-6)


@pytest.mark.parametrize("objective", ["skipgram", "cbow"])
def test_window_losses_mask_padding(objective):
    """Out-of-walk window slots (relation == pad) must contribute nothing:
    compare a walk batch against the same batch plus an all-absorbed walk."""
    g = toy_graph()
    pad = 8
    m = KGEModel(g.num_entities, g.num_relations, dim=8, objective=objective)
    params, _ = m.init(0)
    walks = trw.walk_triples(g, target_nodes=jnp.arange(4, dtype=jnp.int32),
                             walk_length=4, padding_idx=pad, seed=3)
    # Entity 4 has no out-triples -> its walk is absorbed from step 1 on,
    # i.e. every window it produces has a padded positive slot set.
    dead = trw.walk_triples(g, target_nodes=jnp.asarray([4], jnp.int32),
                            walk_length=4, padding_idx=pad, seed=3)
    assert (np.asarray(dead)[0, 1::2] == pad).all()
    if objective == "skipgram":
        from torch_random_walk_tpu.ops.windows import to_windows_triples
        tgt, pw, nw = to_windows_triples(walks, 2, g.num_entities, pad,
                                         g.triples, seed=0)
        base = float(m.skipgram_loss_fn(params, tgt, pw, nw, pad))
        tgt2, pw2, nw2 = to_windows_triples(
            jnp.concatenate([walks, dead]), 2, g.num_entities, pad,
            g.triples, seed=0)
        # Same seed -> the shared prefix of windows differs only in the
        # appended all-padding ones... negatives are re-drawn per slot id,
        # so instead assert the dead walk ALONE has zero-gradient loss.
        dt, dp, dn = to_windows_triples(dead, 2, g.num_entities, pad,
                                        g.triples, seed=0)
        dead_loss = float(m.skipgram_loss_fn(params, dt, dp, dn, pad))
        assert dead_loss == 0.0
        assert np.isfinite(base)
    else:
        from torch_random_walk_tpu.ops.windows import to_windows_triples_cbow
        pt, nt, win = to_windows_triples_cbow(walks, 2, g.num_entities, pad,
                                              g.triples, seed=0)
        base = float(m.cbow_loss_fn(params, pt, nt, win, pad))
        dt, dn, dw = to_windows_triples_cbow(dead, 2, g.num_entities, pad,
                                             g.triples, seed=0)
        dead_loss = float(m.cbow_loss_fn(params, dt, dn, dw, pad))
        assert dead_loss == 0.0
        assert np.isfinite(base)


@pytest.mark.parametrize("objective",
                         ["transe", "distmult", "skipgram", "cbow"])
def test_epoch_step_runs_and_is_deterministic(objective):
    g = toy_graph()
    cfg = KGEmbeddingConfig(dim=8, walk_length=4, window_size=2,
                            objective=objective, seed=11)
    tr = KGEmbedding(g, cfg)
    assert tr.padding_idx == 8  # max(num_entities=5, num_relations=8)
    params, opt = tr.init()
    targets = jnp.arange(5, dtype=jnp.int32)
    p1, o1, l1 = tr.epoch_step(params, opt, targets, 0)
    p2, o2, l2 = tr.epoch_step(params, opt, targets, 0)
    assert float(l1) == float(l2)
    for k in p1:
        assert (np.asarray(p1[k]) == np.asarray(p2[k])).all()
    # A different epoch perturbs the walk seed.
    _, _, l3 = tr.epoch_step(params, opt, targets, 1)
    assert np.isfinite(float(l3))


def test_padding_idx_collision_rejected():
    g = toy_graph()  # relations 5..7 exist
    with pytest.raises(ValueError, match="relation"):
        KGEmbedding(g, KGEmbeddingConfig(padding_idx=6))


@pytest.mark.parametrize("objective,min_mrr",
                         [("transe", 0.8), ("distmult", 0.55)])
def test_chain_link_prediction(objective, min_mrr):
    """End-to-end walk->train on the chain KG: MRR must beat random (~0.15
    with n=24 entities) by a wide margin (measured: transe 0.99, distmult
    0.78).  DistMult's symmetric score ties forward/backward neighbors, so
    its bar is lower."""
    g = chain_graph(24)
    cfg = KGEmbeddingConfig(dim=16, walk_length=8, objective=objective,
                            num_negatives=4, learning_rate=1e-1, seed=1)
    tr = KGEmbedding(g, cfg)
    params, losses = tr.train(200)
    assert losses[-1] < losses[0]
    metrics = kg_tail_ranking_metrics(
        tr.model.entity_embeddings(params),
        tr.model.relation_embeddings(params),
        np.asarray(g.triples), score=objective)
    assert metrics["mrr"] > min_mrr, metrics


def test_skipgram_embeddings_capture_ring_locality():
    """Co-occurrence objective: neighbors on the ring must be closer than
    antipodal entities in entity-embedding space."""
    g = ring_graph(24)
    cfg = KGEmbeddingConfig(dim=16, walk_length=8, window_size=2,
                            objective="skipgram", learning_rate=5e-2, seed=2)
    tr = KGEmbedding(g, cfg)
    params, losses = tr.train(120)
    assert losses[-1] < losses[0]
    emb = np.asarray(tr.embeddings(params), np.float64)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    n = emb.shape[0]
    near = np.mean([emb[i] @ emb[(i + 1) % n] for i in range(n)])
    far = np.mean([emb[i] @ emb[(i + n // 2) % n] for i in range(n)])
    assert near > far + 0.1, (near, far)


def test_filtered_ranking_excludes_known_tails():
    """With every true tail filtered, a perfect model ranks each test tail
    first; construct embeddings where entity i sits at angle 2πi/n and
    relation 0 is the exact one-step rotation."""
    n = 12
    ent_line = np.arange(n, dtype=np.float64)[:, None]
    rel = np.asarray([[1.0]])
    triples = np.asarray([(i, 0, i + 1) for i in range(n - 1)])
    m = kg_tail_ranking_metrics(ent_line, rel, triples, score="transe",
                                filter_triples=triples)
    assert m["mrr"] == 1.0
    assert m["hits@1"] == 1.0


def test_ranking_tie_collapse_not_rewarded():
    """A score-collapsed model (all-equal embeddings) must NOT look perfect:
    realistic tie-breaking ranks it ~(N+1)/2 (review finding: optimistic
    (s > s[t]) gave every constant model MRR 1.0)."""
    n = 10
    ent = np.ones((n, 4))
    rel = np.zeros((1, 4))
    triples = np.asarray([(0, 0, 1), (1, 0, 2)])
    m = kg_tail_ranking_metrics(ent, rel, triples, score="transe")
    expected_rank = 1 + (n - 1) / 2.0
    np.testing.assert_allclose(m["mrr"], 1.0 / expected_rank)
    assert m["hits@1"] == 0.0


def test_from_arrays_subset_id_spaces():
    """Train-split graphs keep the FULL id space when told to (review
    finding: holdout splits dropped max-id entities/relations from the
    tables)."""
    full = np.asarray([(0, 0, 1), (1, 1, 2), (2, 2, 3)])
    train = full[:1]  # only entities 0-1, relation 0
    g = trw.TriplesGraph.from_arrays(train, num_entities=4, num_relations=3)
    assert g.num_entities == 4 and g.num_relations == 3
    assert g.relation_tail_index.shape[0] == 4


def test_padding_idx_entity_collision_rejected():
    g = chain_graph(24)  # entities 0..23, relations 0..1
    with pytest.raises(ValueError, match="entity"):
        KGEmbedding(g, KGEmbeddingConfig(padding_idx=10))


class TestSparsePairAdam:
    """Touched-rows lazy Adam for the pair objectives (KGEModel.pair_train_
    step_sparse): rows touched every step must update exactly like
    optax.adam, and the fused trainer must converge under it."""

    def test_sparse_pair_step_matches_dense(self):
        m = KGEModel(4, 2, dim=8, objective="transe", learning_rate=3e-2)
        params_d, opt_d = m.init(0)
        params_s = {k: v.copy() for k, v in params_d.items()}
        opt_s = m.init_sparse_opt_state(params_s)
        # Every entity (0-3) and relation (0-1) touched each step.
        pos = jnp.asarray([[0, 0, 1], [2, 1, 3]], jnp.int32)
        neg = jnp.asarray([[[0, 0, 2], [3, 0, 1]],
                           [[2, 1, 0], [1, 1, 3]]], jnp.int32)
        pad = 9
        for _ in range(5):
            params_d, opt_d, loss_d = m.pair_train_step(
                params_d, opt_d, pos, neg, pad)
            params_s, opt_s, loss_s = m.pair_train_step_sparse(
                params_s, opt_s, pos, neg, pad)
            np.testing.assert_allclose(float(loss_d), float(loss_s),
                                       rtol=1e-6)
        for k in params_d:
            np.testing.assert_allclose(np.asarray(params_d[k]),
                                       np.asarray(params_s[k]),
                                       rtol=2e-5, atol=2e-6)

    def test_sparse_untouched_rows_stay_put(self):
        m = KGEModel(10, 3, dim=4, objective="distmult")
        params, _ = m.init(1)
        opt = m.init_sparse_opt_state(params)
        before_ent = np.asarray(params["ent"]).copy()
        pos = jnp.asarray([[0, 0, 1]], jnp.int32)
        neg = jnp.asarray([[[0, 0, 2]]], jnp.int32)
        params, opt, _ = m.pair_train_step_sparse(params, opt, pos, neg, 11)
        after_ent = np.asarray(params["ent"])
        touched = {0, 1, 2}
        for i in range(10):
            if i in touched:
                assert not np.allclose(after_ent[i], before_ent[i])
            else:
                np.testing.assert_array_equal(after_ent[i], before_ent[i])

    def test_sparse_end_to_end_chain_quality(self):
        g = chain_graph(24)
        cfg = KGEmbeddingConfig(dim=16, walk_length=8, objective="transe",
                                num_negatives=4, learning_rate=1e-1, seed=1,
                                update_mode="sparse")
        tr = KGEmbedding(g, cfg)
        params, losses = tr.train(200)
        assert losses[-1] < losses[0]
        metrics = kg_tail_ranking_metrics(
            tr.model.entity_embeddings(params),
            tr.model.relation_embeddings(params),
            np.asarray(g.triples), score="transe")
        assert metrics["mrr"] > 0.8, metrics

    def test_sparse_rejected_for_cooccurrence_objectives(self):
        g = chain_graph(8)
        with pytest.raises(ValueError, match="pair objective"):
            KGEmbedding(g, KGEmbeddingConfig(objective="skipgram",
                                             update_mode="sparse"))

    def test_sparse_rejected_with_custom_optimizer(self):
        import optax

        m = KGEModel(4, 2, dim=4, objective="transe",
                     optimizer=optax.sgd(1e-2))
        params, _ = m.init(0)
        opt = m.init_sparse_opt_state(params)
        pos = jnp.asarray([[0, 0, 1]], jnp.int32)
        neg = jnp.asarray([[[0, 0, 2]]], jnp.int32)
        with pytest.raises(ValueError, match="custom optax"):
            m.pair_train_step_sparse(params, opt, pos, neg, 9)


class TestRotatE:
    """RotatE (complex-rotation) objective: the model family whose
    relations COMPOSE around cycles — the exact case where TransE is
    unrepresentable (see ring_graph docstring)."""

    def test_ring_link_prediction(self):
        g = ring_graph(24)
        cfg = KGEmbeddingConfig(dim=16, walk_length=8, objective="rotate",
                                num_negatives=4, learning_rate=1e-1, seed=1)
        tr = KGEmbedding(g, cfg)
        params, losses = tr.train(200)
        assert losses[-1] < losses[0]
        metrics = kg_tail_ranking_metrics(
            tr.model.entity_embeddings(params),
            tr.model.relation_embeddings(params),
            np.asarray(g.triples), score="rotate")
        # Measured: MRR 1.0 at these settings; TransE plateaus at 0.32.
        assert metrics["mrr"] > 0.9, metrics

    def test_relation_table_is_phases(self):
        from torch_random_walk_tpu.models.kge import KGEModel

        m = KGEModel(10, 3, dim=8, objective="rotate")
        params, _ = m.init(0)
        assert params["rel"].shape == (3, 4)  # D/2 phases per relation
        assert np.all(np.abs(np.asarray(params["rel"])) <= np.pi + 1e-6)

    def test_odd_dim_rejected(self):
        from torch_random_walk_tpu.models.kge import KGEModel

        with pytest.raises(ValueError, match="even dim"):
            KGEModel(10, 3, dim=7, objective="rotate")

    def test_sparse_step_supported(self):
        g = ring_graph(16)
        cfg = KGEmbeddingConfig(dim=8, walk_length=4, objective="rotate",
                                update_mode="sparse", seed=2)
        tr = KGEmbedding(g, cfg)
        params, opt = tr.init()
        targets = jnp.arange(16, dtype=jnp.int32)
        params, opt, loss = tr.epoch_step(params, opt, targets, 0)
        assert np.isfinite(float(loss))
