"""Downstream embedding-quality evaluation (link prediction, classification).

Mirrors BASELINE.md's quality configs on a synthetic two-community SBM graph
(Cora-class structure at test scale): node2vec embeddings must beat random
embeddings decisively on both tasks.
"""

import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.models.eval import (
    link_prediction_auc,
    node_classification_accuracy,
    sample_negative_edges,
)
from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig


def sbm_graph(n_per=60, p_in=0.25, p_out=0.01, seed=0):
    rng = np.random.default_rng(seed)
    n = 2 * n_per
    labels = np.repeat([0, 1], n_per)
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            pr = p_in if labels[i] == labels[j] else p_out
            if rng.random() < pr:
                src += [i, j]
                dst += [j, i]
    g = CSRGraph.from_edges(np.array(src), np.array(dst), num_nodes=n)
    return g, labels, np.stack([np.array(src), np.array(dst)], axis=1)


def test_node2vec_beats_random_on_sbm():
    g, labels, edges = sbm_graph()
    cfg = Node2VecConfig(dim=32, walk_length=12, window_size=5,
                         learning_rate=5e-2, seed=0)
    n2v = Node2Vec(g, cfg)
    params, _ = n2v.train(num_epochs=40)
    emb = np.asarray(n2v.embeddings(params))

    neg = sample_negative_edges(g.num_nodes, edges, len(edges) // 2, seed=1)
    pos = edges[: len(edges) // 2]
    auc = link_prediction_auc(emb, pos, neg, score="cosine")
    rng = np.random.default_rng(0)
    rand_emb = rng.normal(size=emb.shape)
    auc_rand = link_prediction_auc(rand_emb, pos, neg, score="cosine")
    assert auc > 0.85, f"link-pred AUC too low: {auc}"
    assert auc > auc_rand + 0.2

    acc = node_classification_accuracy(emb, labels, seed=0)
    assert acc > 0.9, f"classification accuracy too low: {acc}"


def test_auc_sanity():
    emb = np.array([[1.0, 0.0], [1.0, 0.1], [-1.0, 0.0], [-1.0, -0.1]])
    pos = np.array([[0, 1], [2, 3]])
    neg = np.array([[0, 2], [1, 3]])
    assert link_prediction_auc(emb, pos, neg) == 1.0


def _community_embeddings(n=200, dim=8, noise=0.05, seed=0):
    """Planted two-community embeddings: community k lives on basis axis k,
    so the Hadamard feature of a same-community pair is positive on that
    axis and a cross-community pair's is ~0."""
    rng = np.random.default_rng(seed)
    labels = np.repeat([0, 1], n // 2)
    emb = rng.normal(0.0, noise, (n, dim))
    emb[labels == 0, 0] += 1.0
    emb[labels == 1, 1] += 1.0
    return emb, labels, rng


def _pairs(rng, idx_a, idx_b, k):
    a = rng.choice(idx_a, size=k)
    b = rng.choice(idx_b, size=k)
    keep = a != b
    return np.stack([a[keep], b[keep]], axis=1)


def test_trained_readout_separable_near_one():
    """Hadamard-feature logistic readout (node2vec paper §4.3 protocol)
    recovers a planted community structure: same-community test edges vs
    cross-community non-edges must rank essentially perfectly."""
    from torch_random_walk_tpu.models.eval import link_prediction_auc_trained

    emb, labels, rng = _community_embeddings()
    lo, hi = np.where(labels == 0)[0], np.where(labels == 1)[0]
    train = np.concatenate([_pairs(rng, lo, lo, 120),
                            _pairs(rng, hi, hi, 120)])
    test_pos = np.concatenate([_pairs(rng, lo, lo, 40),
                               _pairs(rng, hi, hi, 40)])
    test_neg = _pairs(rng, lo, hi, 80)
    auc = link_prediction_auc_trained(emb, train, test_pos, test_neg,
                                      num_nodes=len(labels), seed=0)
    assert auc > 0.95, f"separable case should be ~1.0, got {auc}"


def test_trained_readout_label_free_near_half():
    """With no structure in the embeddings the trained readout must not
    hallucinate one: AUC stays near chance."""
    from torch_random_walk_tpu.models.eval import link_prediction_auc_trained

    rng = np.random.default_rng(3)
    n = 200
    emb = rng.normal(size=(n, 8))
    all_idx = np.arange(n)
    train = _pairs(rng, all_idx, all_idx, 240)
    test_pos = _pairs(rng, all_idx, all_idx, 80)
    test_neg = _pairs(rng, all_idx, all_idx, 80)
    auc = link_prediction_auc_trained(emb, train, test_pos, test_neg,
                                      num_nodes=n, seed=0)
    assert 0.3 < auc < 0.7, f"label-free case should be ~0.5, got {auc}"


def test_sbm_oracle_auc_exact_tie_handling():
    """The oracle is the same-block indicator with ties counting half:
    exact closed-form values on constructed pos/neg sets."""
    from torch_random_walk_tpu.models.eval import sbm_oracle_auc

    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    within = np.array([[0, 1], [2, 3], [4, 5], [6, 7]])
    cross = np.array([[0, 4], [1, 5], [2, 6], [3, 7]])
    # All positives within-block, all negatives cross-block: perfect.
    assert sbm_oracle_auc(labels, within, cross) == 1.0
    # Positives and negatives identically distributed: pure ties -> 0.5.
    assert sbm_oracle_auc(labels, within, within) == 0.5
    # Negatives half within / half cross: 0.5 win mass + 0.25 tie mass.
    half = np.concatenate([within[:2], cross[:2]])
    assert sbm_oracle_auc(labels, within, half) == 0.75
