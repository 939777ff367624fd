"""Registry contributions: LLM-data-pipeline extension operators (M7) —
dedup, similarity search, text analysis, multimodal plumbing over the
``documents`` / ``embeddings`` fixture tables."""

from __future__ import annotations


def contribute(register) -> None:  # filled in by M7
    return
