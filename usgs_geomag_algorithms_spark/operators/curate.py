"""Corpus curation: the composed training-data filter pipeline.

One declarative plan chaining the webtext primitives the way a 100 TB
pretraining-data build would: exact-dedup (first-doc-wins), language
gate, quality gate — emitting the surviving doc ids with their features.
Because each stage is a column-expression layer over the same documents
scan, Catalyst collapses the whole pipeline into a single pass + one
window for the dedup (keyed on the content hash); nothing is
materialized between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exact_dedup
from .textops import lang_id, quality_score


def curate(
    df: DataFrame,
    lang: str = "en",
    min_quality: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surviving docs after dedup + language + quality gates.

    Output: id, lang, quality_score, mean_token_len, stopword_ratio —
    the curation manifest a downstream tokenizer job would consume."""
    dedup = exact_dedup(df, text_col, id_col).where(~F.col("is_duplicate"))
    langs = lang_id(df, text_col, id_col).where(F.col("pred_lang") == lang)
    quality = quality_score(df, text_col, id_col).where(
        F.col("quality_score") >= min_quality
    )
    return (
        dedup.select(id_col)
        .join(langs.select(id_col, "pred_lang"), id_col)
        .join(
            quality.select(
                id_col, "quality_score", "mean_token_len", "stopword_ratio"
            ),
            id_col,
        )
    )
