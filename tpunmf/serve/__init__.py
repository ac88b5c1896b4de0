from .topk import recall_at_k, topk_retrieval, topk_scores_dense

__all__ = ["topk_retrieval", "topk_scores_dense", "recall_at_k"]
