"""Deterministic PII scrubbing for training corpora.

Standard pre-training hygiene (the C4/RefinedWeb lineage scrubs or
drops documents with emails, IPs, phone-shaped and card-shaped
numbers); the reference has no analogue — its pages are public search
snippets. Pure ``regexp_replace`` column expressions, JVM-side.

Pattern dialect: the Java-regex ∩ RE2 common subset ONLY — character
classes, bounded quantifiers, ``\\b`` word boundaries; no lookaround,
no backreferences — so the DuckDB oracle states the identical pattern
and byte-identical output is contract-checkable. Replacement order is
fixed (email → ipv4 → phone-shaped → card-shaped): email local parts
may contain digit runs and IPs would otherwise be half-eaten by the
digit-run rules, so specific patterns run first; phone precedes card
because a +-prefixed international number is 13+ bare digits (the card
shape), while a bare digit run can never match either phone pattern.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) in application order
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b|\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
]


def redact_pii_expr(text: Column) -> Column:
    """Text with every PII rule applied in order."""
    out = text
    for _, pattern, repl in PII_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-rule match counts BEFORE redaction (corpus audit signal).
    Counted against the same staged text each rule would see, so counts
    agree with what redact_pii_expr replaces."""
    counts: dict[str, Column] = {}
    staged = text
    for name, pattern, repl in PII_RULES:
        counts[f"n_{name}"] = F.size(F.regexp_extract_all(staged, F.lit(pattern), 0))
        staged = F.regexp_replace(staged, pattern, repl)
    return counts
