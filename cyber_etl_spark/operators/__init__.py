from .dedup import (  # noqa: F401
    exact_duplicate_mapping,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_sets,
    simhash_fingerprints,
    simhash_neardup_pairs,
)
from .ann import (  # noqa: F401
    brute_force_knn,
    cosine_neardup_pairs,
    eps_neighbor_pairs,
    kmeans_fit,
    lsh_bucket_candidates,
    semantic_dedup,
    semantic_neardup_pairs,
)
