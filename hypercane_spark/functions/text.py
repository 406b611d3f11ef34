"""Text-analysis scalar functions for training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting —
all Catalyst expressions (no Python in the hot path). These generalize the
reference's per-document text ops (language guess
/root/reference/hypercane/utils.py:309-353, boilerplate sizes
/root/reference/hypercane/score/document_size.py:7-81) to the operations a
large-scale corpus pipeline needs.
"""

from __future__ import annotations

import functools
import operator

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
    callers may substitute a model-backed pandas UDF. Kept binary for
    oracle stability; the multiclass classifier is language_id()."""
    return F.when(stopword_ratio(text) >= en_threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


# Most-frequent-function-word profiles (Cavnar & Trenkle 1994's rank-profile
# idea reduced to its word-level form): the top ~20 function words of each
# language, from public frequency lists. Frozen — determinism beats coverage.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "with", "as", "be", "at", "by", "this", "have",
           "from"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las",
           "un", "por", "con", "una", "su", "para", "es", "al", "lo",
           "como"),
    "fr": ("le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
           "que", "dans", "qui", "pour", "sur", "au", "avec", "pas", "ce",
           "il"),
    "de": ("der", "die", "und", "den", "von", "zu", "das", "mit", "sich",
           "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine",
           "als", "auch"),
    "it": ("di", "e", "il", "che", "in", "un", "per", "una", "non", "sono",
           "con", "si", "da", "le", "dei", "del", "al", "più", "nel",
           "anche"),
    "pt": ("de", "a", "o", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
           "as"),
    "nl": ("de", "en", "van", "het", "een", "in", "is", "dat", "op", "te",
           "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "maar",
           "als"),
    "sv": ("och", "att", "det", "som", "en", "på", "är", "av", "för",
           "med", "den", "till", "inte", "har", "de", "om", "ett", "men",
           "var", "jag"),
    "da": ("og", "i", "at", "det", "er", "en", "den", "til", "af", "som",
           "på", "de", "med", "han", "for", "ikke", "der", "var", "et",
           "men"),
    "pl": ("nie", "to", "się", "w", "na", "i", "z", "co", "jest", "że",
           "do", "tak", "jak", "ale", "po", "za", "od", "dla", "tym",
           "być"),
    "tr": ("bir", "ve", "bu", "ne", "için", "de", "da", "çok", "ben",
           "mi", "sen", "o", "var", "ama", "gibi", "daha", "kadar", "ki",
           "her", "sonra"),
    "id": ("yang", "dan", "di", "itu", "dengan", "ini", "untuk", "dari",
           "dalam", "tidak", "akan", "pada", "juga", "saya", "ke", "bisa",
           "ada", "mereka", "kita", "sudah"),
    "ro": ("și", "de", "în", "la", "cu", "un", "pentru", "este", "mai",
           "ce", "nu", "din", "pe", "care", "sau", "dar", "fost", "dacă",
           "după", "când"),
    "fi": ("ja", "on", "ei", "että", "se", "en", "mitä", "mutta", "niin",
           "hän", "jos", "kun", "olen", "sen", "nyt", "vain", "joka",
           "kaikki", "oli", "mun"),
}


def language_id(
    text: Column | str,
    threshold: float = 0.05,
    unknown: str = "un",
) -> Column:
    """Multiclass language ID over LANG_PROFILES — the full replacement for
    the reference's guess_language call (utils.py:309-353), pure Catalyst.

    Per language: ratio of tokens that are in that language's
    function-word profile. Label = argmax ratio (declaration-order
    tiebreak, matching a chained CASE in SQL); all ratios below
    ``threshold`` → ``unknown``. One linear pass per profile over the
    token array — O(langs · tokens) JVM-side, no Python."""
    toks = tokens_ws(text)
    n = F.size(toks)
    def _in_profile(words):
        # closure (not a default arg: pyspark's higher-order filter treats
        # a 2-parameter lambda as (element, index))
        return lambda t: t.isin(*words)

    ratios = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, _in_profile(words)))
        ratios.append((lang, F.when(n > 0, hits / n).otherwise(F.lit(0.0))))
    best = F.greatest(*[r for _, r in ratios])
    out = F.lit(unknown)
    # build the CASE chain back-to-front so earlier languages win ties
    for lang, r in reversed(ratios):
        out = F.when(r == best, F.lit(lang)).otherwise(out)
    return F.when(best >= F.lit(threshold), out).otherwise(F.lit(unknown))


def language_id_model(
    df,
    text: str = "text",
    key: str = "doc_id",
    out: str = "lang",
    model_fn=None,
    threshold: float = 0.05,
    unknown: str = "un",
):
    """Model-backed multiclass language ID — the plug-point in front of the
    profile heuristic (``language_id``).

    ``model_fn(texts: list[str]) -> list[str]`` is a batch classifier (the
    fasttext lid.176 ``predict`` shape). Resolution order:

    1. explicit ``model_fn`` — wrapped in an Arrow-batched mapInPandas
       (one model call per batch, never per row);
    2. the ``fasttext`` package if importable (absent in this container —
       environment-gated like the NER/justext plug-points; loads
       ``LID_MODEL_PATH`` from the env);
    3. the deterministic profile fallback: EXACTLY ``language_id`` as a
       pure Catalyst expression — this path is the one the SQL oracle
       replays, so plugging a model in (or not) never silently changes
       the verified baseline semantics.

    Returns df with ``key`` and the ``out`` label column."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    if model_fn is None:
        try:  # environment-gated real model
            import fasttext  # noqa: F401
            import os

            path = os.environ.get("LID_MODEL_PATH")
            if path:
                _m = fasttext.load_model(path)

                def model_fn(texts: "list[str]") -> "list[str]":
                    labels, _ = _m.predict(
                        [t.replace("\n", " ") for t in texts]
                    )
                    return [l[0].replace("__label__", "") for l in labels]
        except Exception:
            model_fn = None
    if model_fn is None:
        # oracle-exact fallback: the declarative profile classifier
        return df.select(key, language_id(F.col(text), threshold, unknown).alias(out))

    from collections.abc import Iterator

    import pandas as pd

    fn = model_fn

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = ["" if t is None else str(t) for t in pdf[text]]
            labels = fn(texts) if texts else []
            yield pd.DataFrame({key: pdf[key], out: labels})

    ddl = f"{key} {df.schema[key].dataType.simpleString()}, {out} string"
    return df.select(key, text).mapInPandas(batches, schema=ddl)


# PII patterns — deliberately simple, RE2-compatible (so the DuckDB oracle
# replays them verbatim) and anchored on word boundaries where both engines
# agree. Scrub ORDER matters and is fixed: email → ipv4 → phone (the phone
# pattern would otherwise eat dotted IPs' digit runs).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def pii_scrub(text: Column | str) -> Column:
    """Scrub common PII from a text column — the standard LM-training-data
    redaction pass (emails, IPv4 addresses, phone-number-shaped digit
    runs → typed placeholders). Returns a struct:

        (clean string, n_email int, n_ipv4 int, n_phone int, n_pii int)

    Pure Catalyst (regexp_count + chained regexp_replace, one linear scan
    per pattern, no Python); counts are taken BEFORE each replacement in
    the fixed PII_PATTERNS order so the struct reports what was actually
    redacted. Patterns are intentionally conservative/simple — an
    auditable floor, not a DLP product; swap PII_PATTERNS for a model- or
    dictionary-backed pass via mapInPandas when the environment has one
    (same plug-point convention as language_id_model)."""
    t = _c(text)
    counts = []
    cur = t
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0)).alias(
                f"n_{name}"
            )
        )
        cur = F.regexp_replace(cur, pat, repl)
    # Sum generically so a pattern added to PII_PATTERNS is automatically
    # included in n_pii (a hardcoded 3-term sum would silently exclude it).
    total = functools.reduce(operator.add, counts)
    return F.struct(
        cur.alias("clean"),
        *counts,
        total.cast("int").alias("n_pii"),
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


def gopher_quality_flags(
    text: Column | str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """Gopher quality-filter rules (Rae et al. 2021, Appendix A1.1) as one
    struct column of booleans plus the conjunctive ``pass`` — the standard
    repetition-free document gate of large-scale LM data pipelines, pure
    Catalyst (one linear pass per rule, no Python).

    Fields: n_words_ok, mean_word_len_ok, symbol_ratio_ok, bullet_ok,
    ellipsis_ok, alpha_ok, stopwords_ok, pass.

    The token and line arrays are bound ONCE through the single-element
    transform-lambda idiom (html.card_flags, hashes.simhash64_md5):
    CollapseProject cannot inline a lambda variable, so the tokenization
    evaluates once per row instead of once per rule."""
    t = _c(text)

    def build(b: Column) -> Column:
        toks, lines = b["toks"], b["lines"]
        n = F.size(toks)
        nd = n.cast("double")
        total_len = F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        mean_len = F.when(n > 0, total_len / nd).otherwise(F.lit(0.0))
        symbols = (
            F.regexp_count(b["t"], F.lit(r"#"))
            + F.regexp_count(b["t"], F.lit(r"\.\.\."))
            + F.regexp_count(b["t"], F.lit(r"…"))
        ).cast("double")
        n_lines = F.size(lines).cast("double")
        bullet = F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"^[•\-\*]"))
        ).cast("double")
        ellipsis = F.size(
            F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        alpha = F.size(
            F.filter(toks, lambda w: w.rlike("[a-z]"))
        ).cast("double")
        stop_hits = F.size(
            F.array_intersect(
                F.array_distinct(toks),
                F.array(*[F.lit(w) for w in
                          ("the", "be", "to", "of", "and", "that", "have",
                           "with")]),
            )
        )
        flags = {
            "n_words_ok": (n >= min_words) & (n <= max_words),
            "mean_word_len_ok": (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len),
            "symbol_ratio_ok": F.when(
                n > 0, symbols / nd <= max_symbol_word_ratio
            ).otherwise(F.lit(False)),
            "bullet_ok": F.when(
                n_lines > 0, bullet / n_lines <= max_bullet_line_frac
            ).otherwise(F.lit(True)),
            "ellipsis_ok": F.when(
                n_lines > 0, ellipsis / n_lines <= max_ellipsis_line_frac
            ).otherwise(F.lit(True)),
            "alpha_ok": F.when(
                n > 0, alpha / nd >= min_alpha_word_frac
            ).otherwise(F.lit(False)),
            "stopwords_ok": stop_hits >= min_stopword_hits,
        }
        all_ok = None
        for c in flags.values():
            all_ok = c if all_ok is None else (all_ok & c)
        return F.struct(
            *[v.alias(k) for k, v in flags.items()], all_ok.alias("pass")
        )

    bound = F.struct(
        tokens_ws(t).alias("toks"),
        F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != F.lit("")).alias(
            "lines"
        ),
        t.alias("t"),
    )
    return F.element_at(F.transform(F.array(bound), build), 1)


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token sequence. Two docs with the same bag of words share a fingerprint
    (cheap shuffle-key for exact-ish dedup)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens_ws(text))), " "))
