"""trinity_tpu — a TPU-native information-retrieval framework.

Brand-new JAX/XLA/Pallas re-architecture of the capabilities of
phaistos-networks/Trinity (a C++17 IR library; see /root/repo/SURVEY.md):
inverted indexing with bit-packed block postings, a boolean/phrase query
language with an AST compiler, dense tiled execution of
conjunction/disjunction/k-of-n/phrase retrieval, BM25/TF-IDF scoring with
exact top-k, deletion masking, segment merge, a percolator, and multi-chip
mesh serving.
"""

from trinity_tpu import limits

__version__ = "0.1.0"
__all__ = ["limits", "__version__"]
