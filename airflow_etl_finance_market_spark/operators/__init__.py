from .quality import expect_passed, quality_summary
from .scoring import minmax_scale, weighted_score
from .topk import top_k

__all__ = [
    "quality_summary",
    "expect_passed",
    "minmax_scale",
    "weighted_score",
    "top_k",
]
