"""semanticsearch_tpu — a TPU-native semantic-search framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the
Mineooo1405/SemanticSearch research pipeline (reference mounted read-only at
/root/reference; see SURVEY.md for the structural analysis):

- ``chunking``   semantic document chunking: contiguous splitting (C99 rank-matrix
                 divisive clustering + adjacent-similarity valley detection) and
                 non-contiguous grouping (RMT-filtered similarity + spectral
                 clustering), plus a naive character splitter baseline.
- ``index``      sharded exact-cosine retrieval over HBM-resident embeddings with
                 fused Pallas matmul+top-k, BM25 lexical scoring, reciprocal-rank
                 fusion, and percentile positive/negative labeling.
- ``models``     a Flax transformer sentence encoder and seven neural rerankers
                 (KNRM, Conv-KNRM, ArcII, ESIM, MatchLSTM, MatchPyramid, MVLSTM).
- ``train``      pair-sampling input pipeline, optax training loop, and IR metrics
                 (MAP, MRR, AP, P@k, NDCG@k, DCG@k).
- ``data``       TREC-style corpus integration, TSV validation/pairability, and
                 cross-validation fold construction.
- ``parallel``   device-mesh construction and sharded top-k merge collectives.
- ``ops``        Pallas TPU kernels for the hot paths (blockwise similarity,
                 fused matmul+top-k, kernel pooling, match matrices).

Unlike the reference — a CPU/GPU script pipeline over pandas, sentence-transformers
and MatchZoo — everything here is designed TPU-first: static shapes, bucketed
padding, `lax` control flow, bfloat16 matmuls on the MXU, and scaling via
`jax.sharding.Mesh` + `shard_map` with XLA collectives over ICI.
"""

__version__ = "0.1.0"
