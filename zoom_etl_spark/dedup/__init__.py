"""Deduplication + similarity-search operators for training-data pipelines.

All candidate generation is expressed as equi-joins on hash buckets
(MinHash bands, SimHash prefixes, random-hyperplane LSH buckets) so Spark
executes them as shuffled hash joins that scale linearly — never an O(n²)
cross join. The per-row signature math is pure built-in higher-order
functions (transform/aggregate/xxhash64), JVM-side, codegen-friendly.
"""

from .exact import exact_dedup_keys, normalize_text
from .minhash import minhash_candidate_pairs, minhash_signature, shingles
from .simhash import hamming_distance, with_simhash
from .lsh import hyperplane_bucket, ann_topk_lsh

__all__ = [
    "normalize_text", "exact_dedup_keys",
    "shingles", "minhash_signature", "minhash_candidate_pairs",
    "with_simhash", "hamming_distance",
    "hyperplane_bucket", "ann_topk_lsh",
]
