from .dedup import (  # noqa: F401
    exact_duplicate_mapping,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_sets,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .ann import brute_force_knn, lsh_bucket_candidates  # noqa: F401
