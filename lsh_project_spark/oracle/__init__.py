"""Single-threaded numpy oracle: the reference's semantics restated.

These functions are the *primary correctness oracle* (SURVEY.md §5): the
Spark pipeline's vectorized UDFs call the same kernels over Arrow batches,
and tests assert bit-exact integer-hash agreement between a full-DataFrame
run and a single-process numpy run on the same rows.
"""

from .lsh_core import cp_hash, cp_signatures, concat_hashes, brute_force_nn
from .minhash import minhash_signature, shingles, exact_jaccard
from .simhash import simhash64
from .cluster import union_find_clusters

__all__ = [
    "cp_hash",
    "cp_signatures",
    "concat_hashes",
    "brute_force_nn",
    "minhash_signature",
    "shingles",
    "exact_jaccard",
    "simhash64",
    "union_find_clusters",
]
