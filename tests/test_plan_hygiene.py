"""Scale-hygiene gate over the whole query battery: no physical plan
may contain a CartesianProduct, and BroadcastNestedLoopJoin is allowed
only where it is a deliberate 1-row-stats broadcast (or the documented
exact-baseline crossJoin). Catches quadratic plans the moment a query
regresses — the automated twin of PLANS.md's manual audit."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# these execute driver-side fixture work or streaming drains when the
# DataFrame is BUILT — their plan shape is asserted by their own tests
SKIP = {
    "store_dedup", "stream_dedup", "stream_windowed", "stream_sessionize",
    "stream_spikes",  # streaming drain runs when the DataFrame is built
    "warc_roundtrip",  # runs the sink action when the DataFrame is built
    "wet_roundtrip",   # same: WET sink action at build time
}

# deliberate BroadcastNestedLoopJoin users: 1-row corpus-stats
# crossJoins (bm25, unigram_logprob, stratified quotas, shard offsets,
# gopher corpus stats) or the documented exact-ANN baseline crossJoin
# (cosine_topk and the recall-oracle twins that embed it)
ALLOW_BNLJ = {
    "bm25", "unigram_logprob", "cosine_topk", "lsh_topk", "ivf_topk",
    "stratified_sample", "token_shards", "gopher_filter", "pipeline_e2e",
    "stream_windowed", "bpe", "bpe_encode", "nb_quality",
    # r4: 1-row stats crossJoins — vocabulary size (bigram model) and
    # the summed stratum mass (temperature rates); ccnet_buckets
    # composes bigram_logprob so it inherits the same 1-row V join
    "bigram_logprob", "temperature_sample", "ccnet_buckets",
    # r4b: HITS normalizes by a 1-row L1 mass each half-iteration
    "hits_hosts",
    # r4c: tf-idf idf derivation crossJoins the 1-row n_docs stats
    "tfidf_pairs",
    # r4d: semdedup reuses ivf_assign's n_cells-row centroid broadcast
    # crossJoin; dsir crossJoins the 1-row per-corpus token totals
    "semdedup", "dsir_weights",
    # r4f: kl_drift crossJoins the 1-row totals/vocab-size stats
    "kl_drift",
    # r4i: quantize broadcasts the 1-row per-dim min/max calibration
    "quantize",
    # r4j: datasheet's token_share divides by the 1-row corpus total;
    # bm25_batch inherits bm25's 1-row N/avgdl stats crossJoin
    "datasheet", "bm25_batch",
    # r4j: pmi crossJoins the 1-row token/bigram totals
    "pmi",
    # r5: skew report attaches the 1-row corpus max/mean stats
    "partition_skew",
}


@pytest.mark.parametrize("name", [n for n in entry.queries() if n not in SKIP])
def test_no_quadratic_plans(spark, name):
    df = entry.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in ALLOW_BNLJ:
        assert "BroadcastNestedLoopJoin" not in plan, \
            f"{name}: unexpected nested-loop broadcast join"
