from .search import (  # noqa: F401
    lambda_aware_scores,
    batched_lambda_aware_topk,
    cosine_scores,
)
