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
