"""PII detection / redaction for training-data curation.

A standard pre-training pipeline scrubs personally identifiable
information from web text before anything else touches it (the reference
engine has no analog — this is part of the webtext extension surface,
like ``operators/curate.py``).  Everything here is a pure column
expression: counting is ``size(regexp_extract_all(...))`` and redaction
is a fixed-order chain of ``regexp_replace`` — map-only, no shuffle, no
Python, so at 100 TB the scrub rides the corpus scan for free.

The patterns are deliberately dialect-neutral (no lookaround, no
backreferences) so the exact same strings run under Java regex (Spark)
and RE2 (DuckDB) — which is what makes the driver oracle exact,
including the redacted text itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: (name, pattern, replacement) in REDACTION ORDER.  Emails go first so
#: an address's digit runs can't be half-eaten by the phone/IP patterns;
#: SSN (3-2-4) before phone (3-3-4) keeps the two dash-digit shapes from
#: interacting; counts are always taken on the ORIGINAL text per pattern.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts (on the raw text, per pattern) plus the
    fully redacted text.

    Returns ``(id_col, n_email, n_ssn, n_phone, n_ipv4, clean_text)``.
    Counts are integers -> bit-exact across engines; ``clean_text`` is
    exact too because the replacement chain is order-deterministic.
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    return df.select(id_col, *counts, clean.alias("clean_text"))
