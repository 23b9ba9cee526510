"""End-to-end DeepWalk/node2vec on a two-community graph.

Demonstrates the full pipeline the reference leaves to the user
(SURVEY.md §3.5): graph build -> biased walks -> windows -> SGNS training ->
embedding evaluation (link prediction + node classification).

Run:  python examples/deepwalk_end_to_end.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

honor_jax_platforms_env()  # a JAX_PLATFORMS=cpu export wins over the tunnel

import torch_random_walk_tpu as trw
from torch_random_walk_tpu.models import (
    Node2Vec,
    Node2VecConfig,
    link_prediction_auc,
    node_classification_accuracy,
    sample_negative_edges,
)


def sbm(n_per=150, p_in=0.12, p_out=0.004, seed=0):
    rng = np.random.default_rng(seed)
    n = 2 * n_per
    labels = np.repeat([0, 1], n_per)
    i, j = np.triu_indices(n, k=1)
    pr = np.where(labels[i] == labels[j], p_in, p_out)
    keep = rng.random(i.shape[0]) < pr
    src = np.concatenate([i[keep], j[keep]])
    dst = np.concatenate([j[keep], i[keep]])
    return trw.CSRGraph.from_edges(src, dst, num_nodes=n), labels, \
        np.stack([i[keep], j[keep]], axis=1)


def main():
    graph, labels, edges = sbm()
    print(f"graph: {graph.num_nodes} nodes, {graph.num_edges} edges")

    cfg = Node2VecConfig(dim=64, walk_length=20, window_size=5,
                         p=1.0, q=0.5,       # BFS-flavoured (community) walks
                         learning_rate=2.5e-2, seed=0)
    n2v = Node2Vec(graph, cfg)
    params, losses = n2v.train(num_epochs=80, log_every=20)
    emb = np.asarray(n2v.embeddings(params))
    print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f}")

    pos = edges[: len(edges) // 2]
    neg = sample_negative_edges(graph.num_nodes, edges, len(pos), seed=1)
    auc = link_prediction_auc(emb, pos, neg, score="cosine")
    acc = node_classification_accuracy(emb, labels, seed=0)
    print(f"link-prediction AUC: {auc:.3f}")
    print(f"node-classification accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
