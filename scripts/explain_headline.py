"""Dev helper: print the formatted physical plans of the headline
queries — the ones whose plan shape carries the 100 TB argument
(broadcasts, semi/anti joins, bucket-key equi-joins, pushed filters,
single-shuffle assembly). Usage:

    python scripts/explain_headline.py [query ...]

With no args, prints the default headline set. The plan-quality
properties themselves are pinned by tests/test_plans.py; this script is
for eyeballing the full plans."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mobilityduck_spark import queries as Q
from mobilityduck_spark.plans import formatted_plan
from mobilityduck_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

HEADLINE = [
    "tpch_q18",          # fact-cardinality shuffle agg + semi-join back
    "tpch_q4",           # EXISTS → left-semi with non-equi residual
    "bm_q13",            # exact box clip over persisted trips + broadcast probes
    "doc_minhash_pairs", # LSH band-bucket equi-join (no cartesian)
    "doc_contamination", # broadcast benchmark grams, corpus side unshuffled
    "attime_duration",   # HOF restriction behind a strict join predicate
    "dq_audit",          # fold-per-scan conditional aggs + AQE FK joins
    "scd2_pit_join",     # key equi-join with residual interval filter
    "doc_chunk_dedup",   # min(struct) winner groupBy + ordered reassembly
    "events_rfm",        # two-level-rank NTILE, no global sort
    "graph_lpa_communities",  # persisted edges, per-round equi-joins
    # round-9 session representatives
    "orders_cdc_apply",  # one-exchange max_by argmax (no window, no join)
    "customer_snm_matches",   # prefix-partitioned lead() window, join-free
    "embed_ivfpq_recall",     # route → cell equi-join → codegen ADC
    "orders_incremental_join_view",  # 4 domain-sized partials, 1 merge
    "events_grouping_sets",   # one scan, one Expand, 4 grouping sets
    # round-9 second-session representatives
    "embed_binary_recall",    # bit_count(xor) codes scan + id-join rerank
    "part_skyline",           # two windows, zero joins
    "orders_bloom_semijoin",  # broadcast bitmap probes before the semi-join
    "graph_kcore",            # per-round degree agg + 2 semi joins
]


def main():
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("explain_headline")
    qs = Q.queries()
    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        print(formatted_plan(qs[name](spark, SF)))


if __name__ == "__main__":
    main()
