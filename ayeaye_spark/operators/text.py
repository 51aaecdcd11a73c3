"""Text-analysis operators: language ID, quality scoring, token counting,
fingerprinting (north-star LLM-pipeline components, BASELINE.json).

Each is a thin DataFrame wrapper over ``functions.portable`` expressions —
pure Catalyst array/string expressions (no UDFs), bit-identical to their
DuckDB oracles, scan-parallel with no shuffle, so they cost one pass over
the corpus at any scale.  Tokenization is materialized ONCE per scan
(``_tokens`` projection) — the language scorer alone evaluates four
stopword lists, and neither engine CSEs repeated inline tokenizers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

SPARK = P.SPARK


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    if "_tokens" in df.columns:
        return df
    return df.withColumn("_tokens", F.expr(P.tokens(text_col, SPARK)))


def with_lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Stopword-profile language ID over {en, de, fr, es} + 'und'."""
    had = "_tokens" in df.columns
    out = _with_tokens(df, text_col).withColumn(
        out_col, F.expr(P.lang_id_from_tokens("_tokens", SPARK))
    )
    return out if had else out.drop("_tokens")


def with_quality_score(df: DataFrame, text_col: str, out_col: str = "quality_ppm") -> DataFrame:
    """Heuristic quality as exact integer parts-per-million (0..1e6):
    alpha ratio + en-stopword ratio + length cap, integer arithmetic only
    (float rounding is not cross-engine portable)."""
    had = "_tokens" in df.columns
    out = _with_tokens(df, text_col).withColumn(
        out_col, F.expr(P.quality_score_ppm_from_tokens(text_col, "_tokens", SPARK))
    )
    return out if had else out.drop("_tokens")


def with_token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish lexical token count."""
    had = "_tokens" in df.columns
    out = (
        _with_tokens(df, text_col)
        .withColumn("ws_tokens", F.expr(P.size("_tokens", SPARK)))
        .withColumn("lex_tokens", F.expr(P.size(P.regexp_tokens(text_col, SPARK), SPARK)))
    )
    return out if had else out.drop("_tokens")


def with_fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Rolling-hash fingerprint over normalized text."""
    return df.withColumn(out_col, F.expr(P.fingerprint(text_col, SPARK)))


def text_profile(df: DataFrame, text_col: str) -> DataFrame:
    """All text-analysis columns in one scan, tokenizing once."""
    out = _with_tokens(df, text_col)
    out = with_lang_id(out, text_col)
    out = with_quality_score(out, text_col)
    out = with_token_counts(out, text_col)
    return with_fingerprint(out, text_col).drop("_tokens")
