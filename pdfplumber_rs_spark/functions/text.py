"""Text-analysis columns for a large-scale training-data pipeline:
language ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. Pure Column expressions — JVM-side, fully
pushdown/codegen friendly, and reproducible in ANSI SQL for the
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword heuristic.
# Deliberately SQL-expressible: the language score is the count of
# marker-word hits, computed with the same expression in the oracle.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "de", "que"),
}


def _hits(text: Column, word: str) -> Column:
    """Occurrences of ' word ' in the padded, lowercased text."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_score(text: Column, lang: str) -> Column:
    score = F.lit(0)
    for w in LANG_MARKERS[lang]:
        score = score + _hits(text, w)
    return score


def lang_guess(text: Column) -> Column:
    """argmax over LANG_MARKERS scores; ties broken by language-code
    order; 'und' when all scores are zero."""
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        s = lang_score(text, lang)
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return best


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for blank text)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_tokens(text: Column) -> Column:
    """BPE-ish tokens: lowercase alphanumeric runs."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != ""
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation-ratio / stopword-ratio / mean-token-length —
    the classic boilerplate-vs-content signals."""
    n = F.length(text)
    n_alnum = F.length(F.regexp_replace(text, r"[^A-Za-z0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = token_count(text)
    stop = lang_score(text, "en")
    return {
        "n_chars": n,
        "n_tokens": toks,
        "alnum_ratio": F.round(n_alnum / F.greatest(n, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct / F.greatest(n, F.lit(1)), 6),
        "stopword_ratio": F.round(stop / F.greatest(toks, F.lit(1)), 6),
        "mean_token_len": F.round(n_alnum / F.greatest(toks, F.lit(1)), 6),
    }


def quality_score(text: Column) -> Column:
    """[0, 3]-ish composite: rewards mid-length docs with sane
    punctuation and English stopword presence."""
    f = quality_features(text)
    return F.round(
        F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
        + F.when(
            (f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 10), 1.0
        ).otherwise(0.0)
        + F.least(f["stopword_ratio"] * 10.0, F.lit(1.0)),
        6,
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercased, whitespace collapsed, trimmed)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)
