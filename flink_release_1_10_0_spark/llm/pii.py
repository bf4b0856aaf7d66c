"""PII scrubbing for training-data curation.

Redacts (and counts) personally-identifiable spans — emails, phone
numbers, IPv4 addresses — entirely with JVM-side ``regexp_extract_all``
/ ``regexp_replace`` expressions: one narrow projection per document,
no Python in the row path, no shuffle.  At 100 TB this is a map-only
pass that composes with any downstream filter/sample.

The synthetic corpus contains no PII, so correctness evidence lives in
unit tests over crafted rows (tests/test_llm_pii.py) rather than a
parquet-table oracle; the expressions themselves are engine-portable
POSIX-class regexes.

Flink parity: the reference has no PII operator — this is part of the
LLM-pipeline surface the brief adds beyond the reference (same tier as
dedup/quality in llm/).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately conservative patterns: high precision over recall, since
# at curation scale a false redaction is cheap but an unbounded regex
# (nested quantifiers, catastrophic backtracking) is not.  All are
# linear-time under Java's regex engine.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: leading + optional, 9-15 digits with
    # common separators, anchored on digits at both ends.  '.' is NOT a
    # separator here so dotted-quad IPs never read as phone numbers.
    "phone": r"\+?\d[\d ()-]{7,13}\d",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(text_col: str | Column) -> list[Column]:
    """One ``<kind>_count`` int column per PII kind (vectorized
    regexp_extract_all; no Python)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
            .alias(f"{kind}_count")
            for kind, pat in PII_PATTERNS.items()]


def scrub_pii(df: DataFrame, text_col: str = "text",
              kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
              out_col: str | None = None) -> DataFrame:
    """Replace each PII span with ``<KIND>`` and attach per-kind counts.

    Counts are computed on the ORIGINAL text (before any replacement) so
    overlapping kinds don't hide each other; replacements are applied in
    the order given, so earlier kinds win on overlaps (email before
    phone keeps the digits of a mailbox name from being re-redacted).
    """
    out = out_col or text_col
    scrubbed = F.col(text_col)
    for kind in kinds:
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[kind],
                                    f"<{kind.upper()}>")
    counts = [F.size(F.regexp_extract_all(F.col(text_col),
                                          F.lit(PII_PATTERNS[k]), F.lit(0)))
              .alias(f"{k}_count") for k in kinds]
    return df.select("*", *counts).withColumn(out, scrubbed)
