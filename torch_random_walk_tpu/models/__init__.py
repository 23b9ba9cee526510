from torch_random_walk_tpu.models.skipgram import SkipGramModel
from torch_random_walk_tpu.models.cbow import CBOWModel
from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
from torch_random_walk_tpu.models.eval import (
    link_prediction_auc,
    node_classification_accuracy,
    sample_negative_edges,
)

__all__ = [
    "SkipGramModel",
    "CBOWModel",
    "Node2Vec",
    "Node2VecConfig",
    "link_prediction_auc",
    "node_classification_accuracy",
    "sample_negative_edges",
]
