"""Text-analysis operators over the documents table: quality statistics,
language ID, token counting, and document fingerprinting — the
per-document half of a training-data pipeline (dedup is the pairwise
half, operators.dedup).

All native column expressions; each query has a DuckDB oracle twin
sharing the same regexes and hash primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.scalars import SQL_STABLE_HASH64
from ..functions.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    lang_scores,
    quality_stats,
    token_count,
)

# ---------------------------------------------------------------------------
# quality / counting statistics
# ---------------------------------------------------------------------------


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    qs = quality_stats(F.col("text"))
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_subwords"),
        qs["n_chars"].alias("n_chars"),
        qs["punct_ratio"].alias("punct_ratio"),
        qs["digit_ratio"].alias("digit_ratio"),
        qs["stopword_ratio"].alias("stopword_ratio"),
        qs["mean_token_len"].alias("mean_token_len"),
    )


_SQL_TOKS = (
    "CASE WHEN trim(text) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim(text), '\\s+') END"
)
_SQL_EN = "['the','and','of','to','is','in','that','with']"

_STATS_SQL = f"""
WITH d AS (
  SELECT doc_id, text, {_SQL_TOKS} AS toks, length(text)::BIGINT AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id, text, toks, n_chars,
    len(toks)::BIGINT AS n_tokens,
    CASE WHEN n_chars = 0 THEN 1 ELSE n_chars END AS safe_chars,
    CASE WHEN len(toks) = 0 THEN 1 ELSE len(toks) END AS safe_toks
  FROM d
)
SELECT doc_id,
  n_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'))::BIGINT
    AS n_subwords,
  n_chars,
  len(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE / safe_chars AS punct_ratio,
  len(regexp_extract_all(text, '[0-9]'))::DOUBLE / safe_chars AS digit_ratio,
  len(list_filter(toks, t -> list_contains({_SQL_EN}, lower(t))))::DOUBLE
    / safe_toks AS stopword_ratio,
  COALESCE(list_sum(list_transform(toks, t -> length(t)))::BIGINT, 0)::DOUBLE
    / safe_toks AS mean_token_len
FROM m
"""

# ---------------------------------------------------------------------------
# language ID (stopword-marker heuristic)
# ---------------------------------------------------------------------------


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    scores = lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        lang_id(F.col("text")).alias("detected_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
    )


def _langid_sql() -> str:
    score_exprs, markers_sql = [], {}
    for lang, markers in LANG_MARKERS.items():
        arr = "[" + ",".join(f"'{m}'" for m in markers) + "]"
        markers_sql[lang] = arr
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains({arr}, lower(t))))::BIGINT"
            f" AS score_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    # mirror functions.text.lang_id: alphabetical-first tie-break, 0 -> und
    pick = "CASE WHEN " + best + " = 0 THEN 'und' "
    for lang in langs:
        pick += f"WHEN score_{lang} = {best} THEN '{lang}' "
    pick += "END"
    return f"""
WITH d AS (
  SELECT doc_id, lang AS labeled_lang, {_SQL_TOKS} AS toks FROM documents
),
s AS (
  SELECT doc_id, labeled_lang, {", ".join(score_exprs)} FROM d
)
SELECT doc_id, labeled_lang, {pick} AS detected_lang,
  {", ".join(f"score_{lang}" for lang in langs)}
FROM s
"""


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        F.length("text").cast("long").alias("n_chars"),
    )


_SQL_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_FP_SQL = f"""
SELECT doc_id,
  {SQL_STABLE_HASH64.format(x=_SQL_NORM)} AS fp,
  length(text)::BIGINT AS n_chars
FROM documents
"""


QUERIES = {
    "text_stats": text_stats,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
}

ORACLE = {
    "text_stats": _STATS_SQL,
    "text_langid": _langid_sql(),
    "text_fingerprint": _FP_SQL,
}
