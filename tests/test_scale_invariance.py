"""Scale-invariance proofs: the answer must not depend on HOW the
cluster happens to split the work.

A query whose result changes with `spark.sql.shuffle.partitions`,
`spark.sql.files.maxPartitionBytes`, or AQE on/off has a latent
nondeterminism (an unordered tie-break, a partition-local id, a
first-wins reduce) that a 1000-executor cluster WILL hit even though
local[32] with one fixed layout never does.  These tests re-run a
representative query per plan family under deliberately hostile
knob settings and require hash-identical results.
"""

from __future__ import annotations

from collections import Counter

import pytest

from old_original_java_little_horse_spark.registry import all_queries
from old_original_java_little_horse_spark.session import scoped_conf

from .conftest import SF_SMOKE
from .oracle_compare import row_multiset

Q = all_queries()

# One per plan family: scan-agg, broadcast join, window, top-k,
# shingle/LSH pair join, iterative CC, stratified sample (rank-based
# determinism), running-sum manifest, NTILE quantiles, salted join.
FAMILIES = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "w1_position_numbering",
    "sort_limit_topn",
    "d_minhash_lsh_pairs",
    "d_dup_clusters",
    "t_stratified_sample",
    "mm_shard_assign",
    "a11_rfm_segments",
    "j9_salted_skew_join",
    "idx_bm25_topk",
    # sketches: register construction must be layout-independent
    "sk_hll_registers",
    "sk_cms_point_queries",
    # iterative CC under O(log n) rounds; gap-fill calendar spine;
    # point-in-time SCD2 (union+window as-of); native pivot;
    # end-to-end curation decision table
    "g_cc_star_clusters",
    "w8_gap_fill",
    "j8_temporal_join",
    "agg_pivot_matrix",
    "t_curated_corpus",
    # the engine fold itself: partition-batched applyInPandas must
    # fold identical snapshots however runs land on partitions
    "engine_pipeline_fold",
    "engine_result_counts",
]

HOSTILE = {
    # 8x the default partition count: every shuffle splits differently,
    # so partition-local assumptions (monotonically_increasing_id,
    # unordered first()) produce different answers if present.
    "spark.sql.shuffle.partitions": "256",
    # 1 MiB scan splits: multi-split reads of every parquet file, so
    # scan-order assumptions break if present.
    "spark.sql.files.maxPartitionBytes": str(1 << 20),
    "spark.sql.adaptive.enabled": "false",
}


def _multiset(df) -> Counter:
    return row_multiset([tuple(r) for r in df.collect()], df.columns)


@pytest.mark.parametrize("name", FAMILIES)
def test_result_invariant_under_hostile_knobs(spark, name):
    base = _multiset(Q[name].fn(spark, SF_SMOKE))
    with scoped_conf(spark, HOSTILE):
        hostile = _multiset(Q[name].fn(spark, SF_SMOKE))
    assert base == hostile, (
        f"{name} answer depends on partition layout: "
        f"{list((base - hostile).items())[:3]} vs "
        f"{list((hostile - base).items())[:3]}")
