"""HTML content functions: boilerplate removal + meta k/v extraction.

The reference shells out to content-extraction libraries — justext via
``get_boilerplate_free_content`` (/root/reference/hypercane/utils.py:
560-633) and BeautifulSoup meta scraping for the card score
(/root/reference/hypercane/utils.py:813-858). Those libraries are not in
this container, and at 100 TB a Python-per-row extractor is the wrong
shape anyway: these rebuilds are pure Catalyst ``regexp_replace`` /
``regexp_extract_all`` expressions (JVM-side, whole-stage codegen,
SQL-oracle-replayable). A real extractor (justext/trafilatura) plugs in as
an Arrow-batched mapInPandas at the fetch stage — same column contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# script/style blocks (with their content), then comments, then any tag.
# Two patterns instead of one backreferenced `</\1>`: RE2 engines (the
# DuckDB oracle) have no backreferences.
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)<[^>]*>"


def strip_boilerplate(html: Column | str) -> Column:
    """Boilerplate-free text: drop <script>/<style> blocks, comments, and
    all tags; decode the five predefined XML entities; collapse
    whitespace. A deterministic heuristic stand-in for the reference's
    justext call — the output column contract (``bpfree_text``) is what
    every downstream operator keys on."""
    t = _c(html)
    t = F.regexp_replace(t, _SCRIPT_RE, " ")
    t = F.regexp_replace(t, _STYLE_RE, " ")
    t = F.regexp_replace(t, _COMMENT_RE, " ")
    t = F.regexp_replace(t, _TAG_RE, " ")
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; doesn't double-decode
    ]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def meta_tags(html: Column | str) -> Column:
    """array<string> of raw ``<meta …>`` tags."""
    return F.regexp_extract_all(_c(html), F.lit(r"(?is)(<meta\b[^>]*>)"), 1)


def meta_kv(html: Column | str) -> Column:
    """map<string,string> of meta name/property → content (reference
    utils.py:813-858 walks soup.find_all('meta'); here: one
    regexp_extract_all for the tags, a transform for the k/v pair, and
    map_from_entries — all JVM-side). First occurrence wins on duplicate
    keys (map_from_entries keeps the first)."""
    tags = meta_tags(html)
    name_re = r'(?i)(?:name|property)\s*=\s*"([^"]*)"'
    content_re = r'(?i)content\s*=\s*"([^"]*)"'
    entries = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, name_re, 1)).alias("key"),
            F.regexp_extract(t, content_re, 1).alias("value"),
        ),
    )
    named = F.filter(entries, lambda e: e["key"] != F.lit(""))
    # fold instead of map_from_entries: the default mapKeyDedupPolicy
    # EXCEPTION would crash on pages repeating a meta name
    return F.aggregate(
        named,
        F.expr("cast(map() as map<string,string>)"),
        lambda acc, e: F.when(
            F.map_contains_key(acc, e["key"]), acc
        ).otherwise(F.map_concat(acc, F.create_map(e["key"], e["value"]))),
    )


def card_flags(html: Column | str) -> Column:
    """struct<card,card_title,card_desc,card_image boolean> — the presence
    flags score.card_score consumes (reference card_score.py:8-51 over the
    scraped meta k/v).

    The ``meta_kv`` fold (regexp_extract_all + per-tag aggregate) is bound
    ONCE through a single-element transform lambda — CollapseProject cannot
    inline a lambda variable, so the expensive subtree evaluates once per
    row instead of once per flag reference (up to 7×; same fix as
    hashes.simhash64_md5)."""

    def flags(kv: Column) -> Column:
        def has(*keys: str) -> Column:
            pred = F.lit(False)
            for k in keys:
                pred = pred | (
                    F.coalesce(F.element_at(kv, F.lit(k)), F.lit("")) != ""
                )
            return pred

        return F.struct(
            has("twitter:card").alias("card"),
            has("og:title", "twitter:title").alias("card_title"),
            has("og:description", "twitter:description").alias("card_desc"),
            has("og:image", "twitter:image").alias("card_image"),
        )

    return F.element_at(F.transform(F.array(meta_kv(html)), flags), 1)
