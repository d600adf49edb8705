"""Text analysis operators for training-data pipelines.

Everything is JVM-side column expressions (regexp, split,
array_intersect) — whole-stage-codegen friendly, no Python in the hot
path. Operates on the ``documents`` table shape
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small embedded stopword lists — enough for a ratio-based n-gram
# heuristic; not a general language identifier.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "on", "are", "with", "as", "his", "they", "at", "be", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "von", "mit", "auf", "für", "im", "dem", "sich", "des"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "avec", "au"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
           "es", "del", "por", "con", "no", "para", "se", "su"],
}

# BPE-ish token regex: words, numbers, or single non-space symbols
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text_col):
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"[^\p{L}0-9']+"), lambda t: t != "")


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, ws_tokens, bpe_tokens): whitespace token count and a
    BPE-style regex token count (words / numbers / symbols)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(_BPE_RE)).alias("bpe_tokens"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang, confidence): stopword-ratio heuristic language ID.

    Scores each language by |tokens ∩ stopwords(lang)| / |tokens| with
    array_intersect on deduped tokens; argmax wins ('und' = undetermined
    when no stopwords hit)."""
    toks = F.array_distinct(_tokens(text_col))
    scored = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    for lang, words in _STOPWORDS.items():
        lit = F.array(*[F.lit(w) for w in words])
        scored = scored.withColumn(
            f"s_{lang}",
            F.size(F.array_intersect("toks", lit))
            / F.greatest(F.size("toks"), F.lit(1)),
        )
    langs = list(_STOPWORDS)
    pairs = F.array(*[F.struct(F.col(f"s_{l}").alias("s"), F.lit(l).alias("l")) for l in langs])
    best = F.array_max(pairs)
    return scored.select(
        "id",
        F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["s"].alias("confidence"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, alpha_ratio, punct_ratio, stopword_ratio,
    mean_word_len, quality): simple composable quality heuristics —
    the usual pre-training filters (length, symbol load, stopword
    density)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    alpha = F.length(F.regexp_replace(t, r"[^\p{L}]", ""))
    punct = F.length(F.regexp_replace(t, r"[^\p{P}]", ""))
    toks = _tokens(text_col)
    en = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    sw_ratio = F.size(F.array_intersect(F.array_distinct(toks), en)) / F.greatest(
        F.size(toks), F.lit(1)
    )
    mean_wl = alpha / F.greatest(F.size(toks), F.lit(1))
    quality = (
        F.when(n_chars < 50, 0.0).otherwise(1.0)
        * F.least(F.lit(1.0), alpha / F.greatest(n_chars.cast("double"), F.lit(1.0)) * 1.25)
        * (1.0 - F.least(F.lit(1.0), punct / F.greatest(n_chars.cast("double"), F.lit(1.0)) * 4.0))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        (alpha / F.greatest(n_chars.cast("double"), F.lit(1.0))).alias("alpha_ratio"),
        (punct / F.greatest(n_chars.cast("double"), F.lit(1.0))).alias("punct_ratio"),
        sw_ratio.alias("stopword_ratio"),
        mean_wl.alias("mean_word_len"),
        quality.alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp64, fp_prefix): rolling content fingerprint — xxhash64 of
    normalized text plus a prefix hash (first 256 normalized chars) for
    cheap near-prefix clustering."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("id"),
        F.xxhash64(norm).alias("fp64"),
        F.xxhash64(F.substring(norm, 1, 256)).alias("fp_prefix"),
    )
