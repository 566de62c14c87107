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

# marker-word sets per language: high-frequency function words that are
# NATURALLY ASCII in that language's real orthography (round 3 dropped
# ascii-folded fakes like tr "icin"/için, pl "sie"/się, pt "nao"/não --
# those never occur in properly-written text, so they only ever matched
# pre-folded corpora).  Deterministic and oracle-replicable: the DuckDB
# SQL is GENERATED from this table (see __spark_entry__.py), so the two
# sides cannot drift.  Cross-language collisions (nl/de "met"/"mit",
# da/sv "det", es/it "come"/"como") are fine -- classification is the
# argmax of per-language hit counts, ties broken by language code.
LANG_MARKERS = {
    "cs": ["se", "na", "je", "ale", "jako", "jsou", "jsem", "byla",
           "nebo", "tak", "pro", "aby", "tento", "kdy", "toto"],
    "da": ["og", "er", "til", "det", "ikke", "jeg", "han", "hun",
           "der", "som", "med", "af", "for", "den", "har"],
    "de": ["der", "und", "das", "ein", "mit", "nicht", "auch", "eine",
           "sich", "auf", "werden", "wurde", "dass", "durch", "wird"],
    "en": ["the", "and", "of", "is", "with", "that", "this", "from",
           "have", "are", "was", "which", "their", "about", "would"],
    "es": ["el", "los", "las", "una", "con", "para", "por", "como",
           "pero", "sus", "esta", "entre", "cuando", "sobre", "muy"],
    "fi": ["ja", "on", "ei", "mutta", "joka", "kun", "ovat", "oli",
           "sen", "se", "ne", "tai", "jos", "vain", "kaikki"],
    "fr": ["le", "la", "les", "des", "avec", "pour", "dans", "est",
           "sont", "une", "qui", "pas", "plus", "sur", "cette"],
    "hu": ["hogy", "nem", "egy", "meg", "csak", "van", "volt", "mint",
           "azt", "arra", "ezt", "vagy", "mert", "lesz", "minden"],
    "id": ["yang", "dan", "di", "dengan", "untuk", "tidak", "dari",
           "ini", "itu", "pada", "adalah", "akan", "juga", "atau",
           "sudah"],
    "it": ["il", "gli", "della", "delle", "che", "per", "sono", "come",
           "anche", "nella", "questo", "ancora", "dal", "degli", "alla"],
    "nl": ["de", "het", "een", "van", "met", "voor", "niet", "zijn",
           "aan", "ook", "maar", "naar", "wordt", "deze", "hebben"],
    "pl": ["nie", "jest", "przez", "oraz", "tym", "jak", "dla", "tego",
           "jego", "czy", "tylko", "kiedy", "bardzo", "wszystko",
           "ponad"],
    "pt": ["dos", "das", "uma", "com", "mas", "seus", "muito", "pelo",
           "pela", "isso", "mais", "quem", "ele", "ela", "foi"],
    "ro": ["este", "sunt", "care", "din", "pentru", "dar", "fost",
           "sau", "acest", "acum", "doar", "chiar", "toate", "nostru",
           "unde"],
    "sv": ["och", "att", "det", "som", "av", "inte", "har", "till",
           "den", "ett", "om", "kan", "ska", "efter", "under"],
    "tr": ["bir", "ve", "bu", "ile", "olarak", "daha", "ama", "gibi",
           "sonra", "kadar", "yeni", "olan", "ancak", "var", "bunu"],
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


def lang_id_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (id, lang_pred, lang_score): occurrence-weighted language ID.

    Tokenizes to lowercase ASCII letter runs (``[a-z]+`` -- punctuation-
    adjacent markers count, unlike lang_id's space-delimited contains),
    joins the small (lang, word) marker table broadcast, sums occurrences
    per (doc, lang), and argmaxes per doc (count desc, lang asc).  More
    discriminative than presence bits on real text and the right plan at
    scale: explode -> broadcast equi-join -> partial agg -> per-doc
    window over <=n_langs rows.  Docs with zero marker hits get the
    alphabetically-first language with score 0 (lang_id's all-zero
    tie-break)."""
    from pyspark.sql import Window

    spark = df.sparkSession
    langs = sorted(LANG_MARKERS)
    markers = [(lang, w) for lang in langs for w in LANG_MARKERS[lang]]
    mtab = spark.createDataFrame(markers, "lang string, word string")

    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)).alias("word"))
    counts = (words.join(F.broadcast(mtab), "word")
              .groupBy("id", "lang").agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("id").orderBy(F.col("cnt").desc(),
                                         F.col("lang").asc())
    best = (counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1))
    return (df.select(F.col(id_col).alias("id"))
            .join(best, "id", "left")
            .select("id",
                    F.coalesce(F.col("lang"), F.lit(langs[0]))
                    .alias("lang_pred"),
                    F.coalesce(F.col("cnt"), F.lit(0)).cast("int")
                    .alias("lang_score")))


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
    normalized text for documents shorter than k words.

    The min ranges over each document's own shingles, so it is computed
    as array_min over the per-doc shingle array inside codegen -- the
    former explode + groupBy(id) aggregation shuffle is gone (same
    values: min over md5 of the same distinct-shingle set)."""
    from .dedup import doc_shingle_arrays, normalized_words

    fp = doc_shingle_arrays(df, id_col, text_col, k).select(
        "id",
        F.array_min(F.transform("sh", F.md5)).alias("fingerprint"))
    short = (
        df.select(F.col(id_col).alias("id"),
                  F.concat_ws(" ", normalized_words(F.col(text_col)))
                  .alias("norm"))
        .join(fp, "id", "left_anti")
        .select("id", F.md5("norm").alias("fingerprint"))
    )
    return fp.unionByName(short)
