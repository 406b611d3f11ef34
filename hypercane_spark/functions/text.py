"""Text-analysis scalar functions for training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting —
all Catalyst expressions (no Python in the hot path). These generalize the
reference's per-document text ops (language guess
/root/reference/hypercane/utils.py:309-353, boilerplate sizes
/root/reference/hypercane/score/document_size.py:7-81) to the operations a
large-scale corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from hypercane_spark.functions.hashes import tokens_ws


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# Minimal English stopword list used by the n-gram language heuristic and the
# quality score. Deliberately tiny + frozen: determinism beats coverage for a
# heuristic feature.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are",
    "from", "but", "not", "have", "had", "has",
)


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens_ws(text)).cast("int")


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword count: split on word/number/punct boundaries
    (regex approximating a byte-pair tokenizer's pre-tokenization)."""
    t = F.lower(_c(text))
    pieces = F.filter(
        F.split(t, r"(?=[^a-z0-9])|(?<=[^a-z0-9])"), lambda x: F.trim(x) != F.lit("")
    )
    # long alpha runs count as ~ceil(len/4) subwords
    return F.aggregate(
        pieces,
        F.lit(0).cast("int"),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("int"),
    )


def sentence_count(text: Column | str) -> Column:
    """Sentence count: non-empty '.', '!', '?' delimited spans
    (reference counts sentences via nltk in document_size.py:38; this is the
    deterministic expression equivalent)."""
    spans = F.filter(F.split(_c(text), r"[.!?]+"), lambda x: F.trim(x) != F.lit(""))
    return F.size(spans).cast("int")


def stopword_ratio(text: Column | str) -> Column:
    """fraction of tokens that are English stopwords; 0.0 for empty docs."""
    toks = tokens_ws(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n = F.size(toks)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    """fraction of characters that are punctuation; 0.0 for empty."""
    t = _c(text)
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def language_guess(text: Column | str, en_threshold: float = 0.08) -> Column:
    """n-gram-free language heuristic: 'en' when the stopword ratio clears the
    threshold, else 'other'. Stands in for the reference's guess-language
    dependency (/root/reference/hypercane/utils.py:309-353); pluggable —
    callers may substitute a model-backed pandas UDF."""
    return F.when(stopword_ratio(text) >= en_threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0,1]:
    0.4·length_score + 0.3·stopword_score + 0.3·(1 − punct_ratio·4 capped).
    length_score saturates at 200 tokens. Deterministic heuristic for
    training-data filtering."""
    n = token_count(text)
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) / F.lit(0.4), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - punct_ratio(text) * 4.0, F.lit(0.0))
    score = F.round(length_score * 0.4 + stop_score * 0.3 + punct_pen * 0.3, 6)
    # least()/greatest() skip nulls, which would score a NULL doc 0.7 —
    # propagate null instead.
    return F.when(_c(text).isNull(), F.lit(None).cast("double")).otherwise(score)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token sequence. Two docs with the same bag of words share a fingerprint
    (cheap shuffle-key for exact-ish dedup)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_ws(text))), " "))
