"""Web-corpus cleaning operators for a training-data pipeline: PII
detection/redaction, benchmark-contamination checks, and URL/host
normalization. Pure Column expressions / native joins — JVM-side,
whole-stage-codegen friendly, and every regex is written in the common
Java-regex ∩ RE2 dialect (no lookarounds) so the DuckDB oracle runs the
IDENTICAL pattern.

Scale notes (100 TB):
- PII redaction is a per-row map — no shuffle, pipelined into the scan.
- Contamination is explode(n-grams) → broadcast semi-join against the
  benchmark-gram set (benchmarks are small — MMLU/GSM8K-class suites
  are <10^6 grams), then a map-side-combinable count per doc. No
  all-pairs, no skew: the join key is a hash of the gram.
- Host stats shuffle once on the normalized host (bounded cardinality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java/RE2 patterns (also inlined in the DuckDB oracle SQL)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class — the triage signal that decides
    whether a document needs the (more expensive) redaction map."""
    t = F.coalesce(text, F.lit(""))
    return {
        "n_emails": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))),
        "n_ipv4": F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))),
    }


def redact_pii(text: Column) -> Column:
    """Replace PII spans with typed placeholders. Order matters: emails
    first (an email contains no phone/ip match by construction of the
    patterns), then phones, then IPv4."""
    t = F.coalesce(text, F.lit(""))
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, PHONE_RE, "<PHONE>")
    t = F.regexp_replace(t, IPV4_RE, "<IP>")
    return t


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams over lowercase alnum tokens.

    Documents with fewer than n tokens yield an EMPTY array: Spark's
    sequence(0, size-n) auto-steps DOWN when size-n < 0 (producing
    [0, -1]) and F.slice then throws INVALID_PARAMETER_VALUE.START, so
    the index sequence must be guarded, not clamped."""
    toks = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != "")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def contamination(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Benchmark-contamination check: for each candidate document, how
    many distinct word n-grams it shares with a benchmark suite.

    Spark-first plan: explode n-grams on both sides, broadcast the
    (small) benchmark gram set, equi-join on the gram, count distinct
    hits per doc. Returns (doc_id, n_hits) for contaminated docs only.
    At 10^12-doc scale the candidate side streams; the benchmark side
    is a broadcast hash table."""
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    ).distinct()
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def normalize_url(url: Column) -> Column:
    """Canonical URL for dedup keys: lowercase, scheme and www.
    stripped, query string and fragment dropped, trailing slash
    trimmed."""
    u = F.lower(F.coalesce(url, F.lit("")))
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_host(url: Column) -> Column:
    """Registrable host of a normalized URL (everything before the
    first '/')."""
    return F.regexp_extract(normalize_url(url), r"^([^/]+)", 1)
