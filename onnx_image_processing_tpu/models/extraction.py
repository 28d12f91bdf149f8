"""Match-extraction wrapper: matcher outputs → fixed-size matched pairs.

Re-design of `pytorch_model/feature_detection/match_extraction_wrapper.py:14-113`:
instead of a wrapper ``nn.Module``, a higher-order function that post-composes
any matcher pipeline with in-graph mutual-NN extraction, preserving static
shapes (output padded to ``max_matches``).
"""

from __future__ import annotations

from typing import Callable

from ..core.config import MatcherConfig
from ..ops import extract_mutual_matches


def with_match_extraction(matcher_fn: Callable) -> Callable:
    """Wrap a matcher pipeline with mutual-NN match extraction.

    ``matcher_fn(image1, image2, cfg)`` must return ``(kpts1, kpts2, P, ...)``;
    any extra outputs (e.g. WithFilters' valid mask) are passed through after
    the extraction outputs, mirroring the reference wrapper's contract.

    Returns a function with outputs:
        matched_kpts1 (B, M, 2), matched_kpts2 (B, M, 2),
        match_scores (B, M), match_valid (B, M) [, extras...]
    """

    def wrapped(*inputs, cfg: MatcherConfig | None = None):
        # Accept cfg positionally (registry convention) or by keyword; extra
        # positional inputs (e.g. the essential pipelines' k_inv) pass through.
        if cfg is None:
            *inputs, cfg = inputs
        out = matcher_fn(*inputs, cfg)
        kpts1, kpts2, probs, *extras = out
        mk1, mk2, scores, valid = extract_mutual_matches(
            probs, kpts1, kpts2, max_matches=cfg.max_matches,
            threshold=cfg.match_threshold)
        return (mk1, mk2, scores, valid, *extras)

    wrapped.__name__ = f"{getattr(matcher_fn, '__name__', 'matcher')}_extraction"
    return wrapped
