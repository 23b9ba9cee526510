"""End-to-end KG embedding on a grid-world knowledge graph.

Demonstrates the triples pipeline past the point where the reference stops
(it generates triples windows for an external trainer —
/root/reference/csrc/cpu/windows_cpu.cpp:161-475): relation-aware walks ->
fused TransE training with corrupted negatives -> filtered tail-ranking
link prediction (MRR / Hits@k), plus the RDF2Vec-style co-occurrence
objective on the same walks.

Run:  python examples/kg_embedding_end_to_end.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

honor_jax_platforms_env()  # a JAX_PLATFORMS=cpu export wins over the tunnel

from torch_random_walk_tpu.graph.datasets import synthetic_grid_kg
from torch_random_walk_tpu.models import (
    KGEmbedding,
    KGEmbeddingConfig,
    kg_tail_ranking_metrics,
)


def main():
    # 20x20 grid of entities; relations are exact translations (east,
    # north, east-2, north-east); 10% of triples held out for evaluation.
    graph, all_triples, test = synthetic_grid_kg(side=20, seed=0)
    print(f"grid KG: {graph.num_entities} entities, "
          f"{graph.num_relations} relations, {graph.num_triples} train + "
          f"{len(test)} held-out triples")

    # Link-prediction objective: walk-visited triples vs corrupted copies.
    cfg = KGEmbeddingConfig(dim=64, walk_length=20, objective="transe",
                            num_negatives=8, learning_rate=1e-1, seed=0)
    kge = KGEmbedding(graph, cfg)
    params, losses = kge.train(num_epochs=600, log_every=100)
    metrics = kg_tail_ranking_metrics(
        np.asarray(kge.model.entity_embeddings(params), np.float32),
        np.asarray(kge.model.relation_embeddings(params), np.float32),
        test, score="transe", filter_triples=all_triples)
    print(f"TransE filtered tail ranking on held-out triples: {metrics}")

    # Co-occurrence objective over the same walks (entity embeddings for
    # downstream tasks rather than triple scoring).
    cfg2 = KGEmbeddingConfig(dim=64, walk_length=20, window_size=2,
                             objective="skipgram", learning_rate=5e-2,
                             seed=0)
    kge2 = KGEmbedding(graph, cfg2)
    params2, _ = kge2.train(num_epochs=200, log_every=100)
    emb = np.asarray(kge2.embeddings(params2), np.float64)
    emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    side = 20
    near = np.mean([emb[i] @ emb[i + 1]
                    for i in range(0, graph.num_entities - 1)
                    if (i + 1) % side])  # north neighbor (h = x*side + y)
    far = np.mean([emb[i] @ emb[graph.num_entities - 1 - i]
                   for i in range(graph.num_entities // 4)])
    print(f"skipgram entity similarity: adjacent {near:.3f} vs "
          f"antipodal {far:.3f}")


if __name__ == "__main__":
    main()
