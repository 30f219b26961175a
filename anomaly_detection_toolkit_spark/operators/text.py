"""Text-analysis operators for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token
counting (whitespace + BPE-ish regex), and document fingerprinting —
each a pure ``pyspark.sql.functions`` column expression (JVM-side,
whole-stage-codegen; zero Python in the hot path) so the operators
run at 10^12-document scale with no shuffle at all: every one is a
per-row projection.

Cross-engine determinism: fingerprints use ``md5`` (identical in
Spark and DuckDB); the numeric 60-bit variant is
``CAST(CONV(SUBSTR(md5(x),1,15),16,10) AS BIGINT)`` which DuckDB
reproduces as ``CAST('0x'||SUBSTRING(md5(x),1,15) AS BIGINT)`` —
15 hex digits = 60 bits, no sign/overflow ambiguity in either engine.
These hashes also seed the MinHash/SimHash operators in ``dedup.py``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language scorer.
# Real pipelines would plug in fastText-style models via a pandas UDF;
# the heuristic keeps the operator JVM-side and deterministic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie-break order

# A BPE-ish token regex: runs of word chars, or single non-space
# punctuation — approximates subword pre-tokenization (GPT-2 style
# splits on whitespace/punctuation boundaries before merges).
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def normalize(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to spaces, collapse runs.

    The canonical form used by fingerprints and shingles; single
    spaces guaranteed so arithmetic over lengths is exact.
    """
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return F.trim(t)


def tokens(text: Column) -> Column:
    """ARRAY<STRING> of whitespace tokens of the normalized text."""
    return F.split(normalize(text), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty text)."""
    n = normalize(text)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish regex tokens (word runs + punctuation marks)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def fingerprint(text: Column) -> Column:
    """md5 hex fingerprint of the normalized text (exact-dup key)."""
    return F.md5(normalize(text))


def hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash shared bit-for-bit with the
    DuckDB oracle (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring feature columns (all codegen'd exprs).

    Features mirror common pretraining-corpus filters (C4/Gopher
    rules): length, token count, mean word length, punctuation /
    digit / stopword ratios, and a [0,1] composite ``quality_score``.
    """
    t = F.col(text_col)
    norm = normalize(t)
    n_tok = token_count(t)
    # normalized text has single spaces: chars = sum(len) + (n-1)
    mean_wl = F.when(
        n_tok > 0, (F.length(norm) - (n_tok - F.lit(1))) / n_tok
    ).otherwise(F.lit(0.0))
    n_chars = F.length(t)
    punct = (n_chars - F.length(F.regexp_replace(t, r"[\p{Punct}]", ""))) / F.greatest(
        n_chars, F.lit(1)
    )
    digits = (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))) / F.greatest(
        n_chars, F.lit(1)
    )
    toks = F.split(norm, " ")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS["en"])))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    # composite: reward mid-length docs and prose-like ratios
    length_ok = (n_tok >= 10) & (n_tok <= 100000)
    word_ok = (mean_wl >= 2.0) & (mean_wl <= 12.0)
    score = (
        length_ok.cast("double") * 0.4
        + word_ok.cast("double") * 0.2
        + (F.lit(1.0) - F.least(punct * 5, F.lit(1.0))) * 0.2
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.2
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", bpe_token_count(t))
        .withColumn("mean_word_len", mean_wl)
        .withColumn("punct_ratio", punct)
        .withColumn("digit_ratio", digits)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword hit counts over the token array."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS[lang])))
        for lang in LANG_ORDER
    }


def lang_id(text: Column) -> Column:
    """Predicted language = argmax of stopword hits, ties broken by
    LANG_ORDER; 'und' (undetermined) when no list scores a hit."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-chain in reverse so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    out = df.withColumn("pred_lang", lang_id(t))
    for lang in LANG_ORDER:
        out = out.withColumn(f"hits_{lang}", lang_scores(t)[lang])
    return out


def add_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append md5 + 60-bit numeric fingerprints of normalized text."""
    t = F.col(text_col)
    return df.withColumn("fingerprint", fingerprint(t)).withColumn(
        "fingerprint60", hash60(fingerprint(t))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash)
# ---------------------------------------------------------------------------

WINNOW_BASE = np.uint64(1_000_003)  # polynomial base; mod 2^64 via wraparound


def _winnow_doc(norm_text: str, k: int, w: int) -> list[tuple[int, int]]:
    """(position, hash) fingerprints of one document via winnowing
    (Schleimer, Wilkerson & Aiken 2003, the MOSS algorithm — public):
    char k-gram polynomial rolling hashes (uint64 wraparound, fully
    vectorized), then the RIGHTMOST minimum of each window of w
    consecutive hashes. Guarantees: any match of length ≥ w+k−1 shares
    a fingerprint; fingerprint density ≈ 2/(w+1)."""
    c = np.frombuffer(norm_text.encode("utf-8"), dtype=np.uint8)
    if len(c) < k:
        return []
    sw = np.lib.stride_tricks.sliding_window_view(c, k).astype(np.uint64)
    powers = WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    hashes = (sw * powers).sum(axis=1)  # wraps mod 2^64 by design
    if len(hashes) < w:
        picks = np.array([int(np.argmin(hashes))])
    else:
        hw = np.lib.stride_tricks.sliding_window_view(hashes, w)
        # rightmost-min rule: argmin over the reversed window
        right_idx = w - 1 - np.argmin(hw[:, ::-1], axis=1)
        picks = np.unique(np.arange(len(hw)) + right_idx)
    # shift to signed int64 range IN PYTHON ints (numpy uint64 minus a
    # python int wraps back to uint64)
    return [(int(p), int(hashes[p]) - (1 << 63)) for p in picks]


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 4
) -> DataFrame:
    """(id, pos, fp) winnowing fingerprint rows per document — the
    rolling-hash fingerprinting operator of the training-data brief.
    Arrow-batched mapInPandas; the per-doc kernel is vectorized numpy
    (no per-char Python). Matching fingerprint VALUES across docs ⇒
    shared substrings of length ≥ w+k−1; positions localize them."""
    import pandas as _pd

    from pyspark.sql import functions as _F

    cols = df.select(_F.col(id_col).alias("id"), normalize(_F.col(text_col)).alias("norm"))

    def run(batches):
        for pdf in batches:
            ids, poss, fps = [], [], []
            for i, t in zip(pdf["id"], pdf["norm"]):
                for p, h in _winnow_doc(t or "", k, w):
                    ids.append(i)
                    poss.append(p)
                    fps.append(h)
            yield _pd.DataFrame({"id": ids, "pos": poss, "fp": fps})

    return cols.mapInPandas(run, schema="id long, pos int, fp long")
