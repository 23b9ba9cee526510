from torch_random_walk_tpu.models.skipgram import SkipGramModel
from torch_random_walk_tpu.models.cbow import CBOWModel
from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
from torch_random_walk_tpu.models.kge import (
    KGEModel,
    KGEmbedding,
    KGEmbeddingConfig,
)
from torch_random_walk_tpu.models.eval import (
    link_prediction_auc,
    link_prediction_auc_trained,
    sbm_oracle_auc,
    node_classification_accuracy,
    sample_negative_edges,
    kg_tail_ranking_metrics,
)

__all__ = [
    "SkipGramModel",
    "CBOWModel",
    "Node2Vec",
    "Node2VecConfig",
    "KGEModel",
    "KGEmbedding",
    "KGEmbeddingConfig",
    "link_prediction_auc",
    "link_prediction_auc_trained",
    "sbm_oracle_auc",
    "node_classification_accuracy",
    "sample_negative_edges",
    "kg_tail_ranking_metrics",
]
