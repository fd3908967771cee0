"""Streaming document curation — the ingest-time half of the training-data
pipeline (SURVEY.md §2.11), composed from the same column logic as the
batch `curation_pipeline` query (plans/llm.py):

    quality gate -> content-digest exact dedup -> deterministic
    per-language stratified downsample (+ loss reweight)

The split of responsibilities is the one a real 100 TB ingest lands on:

- These three stages are STREAM-SAFE: the gate and the sampler are
  stateless column filters; dedup state is an 8-byte digest per distinct
  kept document (or watermark-bounded via
  streaming.dedup.stream_dedup_within_watermark when the key domain is
  unbounded).
- Benchmark DECONTAMINATION and NEAR-dup clustering stay in the batch
  compaction pass (plans/llm.py::curation_pipeline, decontamination_overlap,
  operators/dedup.py): they need corpus-wide posting/pair state that a
  stream cannot hold, and re-running them over the compacted store is one
  cheap scan. Stream-filter first, batch-compact second.

Stage semantics are shared with the adjudicated batch queries via the same
constants (_PIPE_MIN_TOKENS, _SAMPLE_RATES_BP); dedup keeps the FIRST
arrival (streaming has no "min doc_id" — the batch compaction pass
re-canonicalizes if a total order matters).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans.llm import _PIPE_MIN_TOKENS, _PIPE_MIN_TTR, _SAMPLE_MOD, _SAMPLE_RATES_BP
from .dedup import stream_dedup_exact, with_content_key


def quality_gate(docs: DataFrame) -> DataFrame:
    t = F.split(F.col("text"), " ")
    n_tokens = F.size(t)
    ttr = F.size(F.array_distinct(t)) * 1.0 / n_tokens
    return docs.filter(
        (n_tokens >= _PIPE_MIN_TOKENS) & (ttr >= _PIPE_MIN_TTR)
    ).withColumn("n_tokens", n_tokens)


def stratified_sample_filter(docs: DataFrame) -> DataFrame:
    """Deterministic Lehmer-mix keep decision + loss reweight — identical
    arithmetic to the batch stratified_sample/curation_pipeline stages."""
    rate = None
    for lang, bp in sorted(_SAMPLE_RATES_BP.items()):
        cond = F.col("lang") == lang
        rate = F.when(cond, bp) if rate is None else rate.when(cond, bp)
    rate = rate.otherwise(_SAMPLE_MOD)
    key = ((F.col("doc_id") + 1) * 48271) % 2_147_483_647 % _SAMPLE_MOD
    return docs.filter(key < rate).withColumn(
        "weight", F.round(float(_SAMPLE_MOD) / rate, 6)
    )


def stream_curation_pipeline(docs: DataFrame) -> DataFrame:
    """docs: streaming DataFrame with (doc_id long, text string, lang
    string, source string). Returns the kept, reweighted stream."""
    gated = quality_gate(docs)
    deduped = stream_dedup_exact(with_content_key(gated), ["content_key"])
    return stratified_sample_filter(deduped).select(
        "doc_id", "lang", "source", "n_tokens", "content_key", "weight"
    )
