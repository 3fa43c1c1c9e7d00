"""Text-analysis operators over document tables — JVM-side built-ins only.

Every operator here is expressed with pyspark.sql.functions (whole-stage
codegen, no Python in the hot path) and has an exact ANSI-SQL twin runnable
in DuckDB, so each is oracle-checkable by the driver harness. These are the
text primitives a web-scale training-data pipeline runs in front of the
sketch layer: token counting, quality scoring, marker-based language ID,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# stopword-ish marker tokens per language for the n-gram/marker heuristic
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
}

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "it"]


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + char count per document."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics (portable SQL).

    mean_word_len: chars-without-spaces / token count;
    stop_ratio: occurrences of common stopwords per token;
    punct_ratio: sentence punctuation per char.
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("double")
    no_space = F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")
    stop_hits = None
    for w in STOPWORDS:
        token = f" {w} "
        occ = (F.length("text") - F.length(F.regexp_replace(F.col("text"), token, ""))) \
            / F.lit(len(token))
        stop_hits = occ if stop_hits is None else stop_hits + occ
    punct = (F.length("text") -
             F.length(F.regexp_replace(F.col("text"), r"[.!?,;]", ""))).cast("double")
    return docs.select(
        "doc_id",
        F.round(no_space / n_tokens, 4).alias("mean_word_len"),
        F.round(stop_hits / n_tokens, 4).alias("stop_ratio"),
        F.round(punct / F.greatest(F.length("text").cast("double"), F.lit(1.0)), 4)
        .alias("punct_ratio"),
    )


def lang_id_scores(docs: DataFrame) -> DataFrame:
    """Marker-token language scores + argmax language guess.

    Counts marker occurrences per language with the portable
    (len(x) - len(replace(x, m, ''))) / len(m) trick — identical semantics in
    Spark and DuckDB, so the whole heuristic is oracle-checkable.
    """
    cols = [F.col("doc_id"), F.col("lang").alias("lang_true")]
    score_cols = []
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            occ = (F.length(padded) - F.length(F.regexp_replace(padded, m, ""))) \
                / F.lit(len(m))
            s = occ if s is None else s + occ
        c = F.round(s, 4).alias(f"score_{lang}")
        cols.append(c)
        score_cols.append((lang, s))
    # argmax with deterministic tie-break by language order
    guess = F.lit("und")
    best = F.lit(-1.0)
    for lang, s in score_cols:
        guess = F.when(s > best, F.lit(lang)).otherwise(guess)
        best = F.when(s > best, s).otherwise(best)
    cols.append(guess.alias("lang_guess"))
    return docs.select(*cols)


# GPT2-style pre-tokenizer shape: contractions | letter runs | digit runs |
# punctuation runs (space-prefixed) | whitespace. Portable subset that Java
# (Spark) and RE2-ish (DuckDB) regex dialects agree on.
BPE_TOKEN_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_counts(docs: DataFrame) -> DataFrame:
    """BPE-ish token count per document (the tokenizer-shape proxy a
    training-data pipeline uses for budget estimates before real BPE)."""
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
        .cast("long").alias("n_bpe_tokens"),
    )


def rolling_fingerprints(docs: DataFrame, window: int = 8) -> DataFrame:
    """Rolling polynomial (Rabin-Karp) fingerprints: min/max over all
    ``window``-word rolling hashes per doc — an order-SENSITIVE content
    fingerprint (vs the order-insensitive xor fingerprint), the winnowing
    primitive for near-dup detection of reordered documents.

    Arrow-batched numpy kernel (Horner over per-word FNV hashes, mod 2^61-1).
    """
    from typing import Iterator

    import pyarrow as pa

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        M = (1 << 61) - 1
        B = 1_000_003

        def word_hash(w: str) -> int:
            h = 0xCBF29CE484222325
            for byt in w.encode("utf-8"):
                h = ((h ^ byt) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            return h % M

        bw = pow(B, window, M)
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            mins = np.empty(len(texts), dtype=np.int64)
            maxs = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                words = t.split(" ") if t else []
                hs = [word_hash(w) for w in words]
                if not hs:
                    mins[i] = maxs[i] = 0
                    continue
                acc = 0
                lo, hi = None, None
                for j, wh in enumerate(hs):
                    acc = (acc * B + wh) % M
                    if j >= window:
                        acc = (acc - hs[j - window] * bw) % M
                    if j >= window - 1 or j == len(hs) - 1:
                        if lo is None or acc < lo:
                            lo = acc
                        if hi is None or acc > hi:
                            hi = acc
                mins[i], maxs[i] = lo, hi
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(mins, pa.int64()), pa.array(maxs, pa.int64())],
                names=["doc_id", "rolling_min", "rolling_max"],
            )

    return docs.select("doc_id", "text").mapInArrow(
        fn, "doc_id long, rolling_min long, rolling_max long"
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Order-insensitive 64-bit document fingerprint: bit_xor over per-word
    hashes (15 hex chars of md5 -> int64). A content fingerprint that is
    stable under word reordering — the cheap pre-filter before MinHash."""
    words = F.split(F.col("text"), " ")
    return (
        docs.select("doc_id", F.explode(words).alias("w"))
        .select("doc_id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10)
                .cast("long").alias("wh"))
        .groupBy("doc_id")
        .agg(F.bit_xor("wh").alias("fingerprint"))
    )
