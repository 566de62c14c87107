"""Text-analysis operators for large-scale corpus curation.

Language ID (marker-word heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex) and document
fingerprinting (min-hash over word shingles, a winnowing-style selector).
Everything is built from JVM-side SQL functions so the operators stay inside
whole-stage codegen and are verifiable against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# marker-word sets per language: high-frequency function words,
# ASCII-only (both engines lowercase them identically), deterministic and
# oracle-replicable (the DuckDB SQL is GENERATED from this table, see
# __spark_entry__.py, so the two sides cannot drift).  Cross-language
# collisions (e.g. nl/de "met"/"mit") are fine -- classification is the
# argmax of per-language hit counts, ties broken by language code.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "with", "that", "this", "from",
           "have", "are", "was", "which", "their", "about", "would"],
    "nl": ["de", "het", "een", "van", "met", "voor", "niet", "zijn",
           "aan", "ook", "maar", "naar", "wordt", "deze", "hebben"],
    "de": ["der", "und", "das", "ein", "mit", "nicht", "auch", "eine",
           "sich", "auf", "werden", "wurde", "dass", "durch", "wird"],
    "fr": ["le", "la", "les", "des", "avec", "pour", "dans", "est",
           "sont", "une", "qui", "pas", "plus", "sur", "cette"],
    "es": ["el", "los", "las", "una", "con", "para", "por", "como",
           "pero", "sus", "esta", "entre", "cuando", "sobre", "muy"],
    "it": ["il", "gli", "della", "delle", "che", "per", "sono", "come",
           "anche", "nella", "questo", "piu", "dal", "degli", "alla"],
    "pt": ["nao", "dos", "uma", "com", "mas", "seus", "tambem", "voce",
           "muito", "sao", "pelo", "pela", "isso", "mais", "quem"],
    "sv": ["och", "att", "det", "som", "av", "inte", "har", "till",
           "den", "ett", "om", "kan", "ska", "efter", "under"],
    "pl": ["nie", "jest", "sie", "przez", "oraz", "tym", "jak", "dla",
           "tego", "jego", "ktory", "byl", "czy", "juz", "tylko"],
    "tr": ["bir", "ve", "bu", "icin", "ile", "olarak", "daha", "cok",
           "ama", "gibi", "sonra", "kadar", "yeni", "olan", "ancak"],
}

# BPE-ish word/number/punctuation splitter (GPT-2-style simplified)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _marker_score(text_col, words):
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    score = F.lit(0)
    for w in words:
        score = score + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return score


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, lang_pred, lang_score): argmax of marker-word hits; ties
    break on language code order for determinism."""
    scores = [
        F.struct(_marker_score(F.col(text_col), ws).alias("s"),
                 F.lit(lang).alias("l"))
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    # greatest(struct) picks max score, then max lang code; to break ties on
    # *smallest* code, order by (score, reversed code) via negation trick:
    best = F.greatest(*[
        F.struct(s["s"].alias("s"), F.lit(-i).alias("pref"),
                 s["l"].alias("l"))
        for i, s in enumerate(scores)
    ])
    return df.select(
        F.col(id_col).alias("id"),
        best["l"].alias("lang_pred"),
        best["s"].alias("lang_score"),
    )


def _n_words(c):
    """Whitespace token count; 0 for empty/whitespace-only text (split on
    "" yields [""], which would otherwise count as one token)."""
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)) \
        .otherwise(F.size(F.split(F.trim(c), r"\s+")))


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, ws_tokens, bpe_tokens, n_chars)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        _n_words(c).alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).alias("bpe_tokens"),
        F.length(c).alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, n_chars, punct_ratio, stop_ratio, mean_word_len, quality).

    quality in [0,1]: length band + low punctuation + stopword presence +
    sane word length -- the standard cheap web-text filters.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_words = _n_words(c)
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    stop_hits = F.lit(0)
    for w in STOPWORDS:
        stop_hits = stop_hits + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.lit(len(STOPWORDS)), 6)
    mean_word_len = F.round(
        (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)), 6)
    quality = F.round(
        (F.when((n_chars >= 50) & (n_chars <= 10000), 0.25).otherwise(0.0))
        + F.when(punct_ratio <= 0.2, 0.25).otherwise(0.0)
        + F.when(stop_hits > 0, 0.25).otherwise(0.0)
        + F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), 0.25)
        .otherwise(0.0),
        2,
    )
    return df.select(
        F.col(id_col).alias("id"), n_chars.alias("n_chars"),
        punct_ratio.alias("punct_ratio"), stop_ratio.alias("stop_ratio"),
        mean_word_len.alias("mean_word_len"), quality.alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str,
                k: int = 3) -> DataFrame:
    """-> (id, fingerprint): min md5 over word k-shingles of the normalized
    text (winnowing-style content selector); falls back to md5 of the whole
    normalized text for documents shorter than k words."""
    from .dedup import normalized_words, word_shingles

    sh = word_shingles(df, id_col, text_col, k)
    fp = sh.groupBy("id").agg(F.min(F.md5("shingle")).alias("fingerprint"))
    short = (
        df.select(F.col(id_col).alias("id"),
                  F.concat_ws(" ", normalized_words(F.col(text_col)))
                  .alias("norm"))
        .join(fp, "id", "left_anti")
        .select("id", F.md5("norm").alias("fingerprint"))
    )
    return fp.unionByName(short)
