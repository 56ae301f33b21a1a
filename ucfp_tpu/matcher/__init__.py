"""Hybrid retrieval orchestration (layer 4)."""

from .rrf import rrf, rrf_with_sources
from .matcher import Matcher

__all__ = ["rrf", "rrf_with_sources", "Matcher"]
