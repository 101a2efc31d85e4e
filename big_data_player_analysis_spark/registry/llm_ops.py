"""Registry tier C: LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) — the mandated extension surface
(SURVEY.md §2.4 last row). Filled in incrementally."""

from __future__ import annotations
