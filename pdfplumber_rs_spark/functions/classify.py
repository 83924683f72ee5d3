"""In-engine classifier training for quality filtering.

The GPT-3/CCNet pipeline stage "train a linear quality classifier and
score every page" — here as a Bernoulli Naive Bayes whose training IS
a pair of count aggregations, so the whole train+apply cycle is one
lazy DataFrame program with an exact SQL twin (no iterative solver, no
driver-side model object). At 10^12 docs: training = one (tok, label)
shuffle with map-side combine; the model is vocabulary-sized and
broadcasts; scoring = one distinct-token explode joined against the
broadcast model + per-doc sum. Two shuffles end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_tokens


def nb_quality_scores(df: DataFrame, label: Column,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Train Bernoulli NB on (distinct-token presence → label) over the
    corpus itself and score every document.

    label: boolean Column over df's columns (e.g. a heuristic teacher
    like quality_score >= 1.5 — the standard self-supervised setup
    where a cheap heuristic labels and a generalizing model smooths).

    Per-token likelihoods use Laplace smoothing:
    p(tok|c) = (docs_c_with_tok + 1) / (n_c + 2). This is FULL
    multivariate Bernoulli — absent tokens contribute
    log((1-p1)/(1-p0)) evidence too (without them the model degrades
    to the majority class whenever the prior dominates; measured).
    Algebraically: score = prior + Σ_vocab log((1-p1)/(1-p0))
    + Σ_{tok ∈ doc} [log(p1/p0) − log((1-p1)/(1-p0))], so the
    vocabulary-wide absence sum is ONE corpus constant (a 1-row
    broadcast) and scoring stays a present-token join + per-doc sum.
    Returns (doc_id, label, nb_score, predicted), nb_score at 6dp.

    Everything is counts → the exact same model falls out of the SQL
    oracle; no RNG, no iterative fitting, no driver state."""
    labeled = df.select(
        F.col(id_col).alias("doc_id"),
        label.cast("int").alias("label"),
        F.array_distinct(word_tokens(F.col(text_col))).alias("toks"),
    ).persist()  # referenced by training, scoring, and the empty-doc
    # branch — persist() computes the tokenization once (at cluster
    # depth: the between-stage Iceberg commit, as in bpe/pagerank)
    class_counts = labeled.groupBy().agg(
        F.sum("label").alias("n1"),
        F.sum(1 - F.col("label")).alias("n0"),
    )
    tok_counts = (
        labeled.select("label", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.sum("label").alias("c1"),
             F.sum(1 - F.col("label")).alias("c0"))
    )
    present = (F.log((F.col("c1") + 1.0) / (F.col("n1") + 2.0))
               - F.log((F.col("c0") + 1.0) / (F.col("n0") + 2.0)))
    absent = (F.log((F.col("n1") + 1.0 - F.col("c1"))
                    / (F.col("n1") + 2.0))
              - F.log((F.col("n0") + 1.0 - F.col("c0"))
                      / (F.col("n0") + 2.0)))
    model = tok_counts.crossJoin(F.broadcast(class_counts)).select(
        "tok", (present - absent).alias("adj_llr"), absent.alias("abs_llr"))
    absent_sum = model.agg(
        F.coalesce(F.sum("abs_llr"), F.lit(0.0)).alias("sabs"))
    base = class_counts.crossJoin(F.broadcast(absent_sum)).select(
        (F.col("sabs") + F.log(F.col("n1") + 1.0)
         - F.log(F.col("n0") + 1.0)).alias("base"))
    scored = (
        labeled.select("doc_id", "label", F.explode("toks").alias("tok"))
        .join(F.broadcast(model.select("tok", "adj_llr")), "tok")
        .groupBy("doc_id", "label")
        .agg(F.sum("adj_llr").alias("s"))
        .crossJoin(F.broadcast(base))
        .select("doc_id", "label",
                F.round(F.col("s") + F.col("base"), 6).alias("nb_score"),
                ((F.col("s") + F.col("base")) > 0).alias("predicted"))
    )
    # token-free documents never reach the explode: they carry the
    # prior plus every token's absence evidence — exactly `base`
    empties = (
        labeled.filter(F.size("toks") == 0)
        .crossJoin(F.broadcast(base))
        .select("doc_id", "label",
                F.round(F.col("base"), 6).alias("nb_score"),
                (F.col("base") > 0).alias("predicted"))
    )
    return scored.unionByName(empties)
