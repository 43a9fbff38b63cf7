"""Typed configuration tree + named-config registry.

Replaces the reference's four overlapping config mechanisms (argparse wizards,
``input()`` prompts, hardcoded dicts, and env vars — see
``data_process/simple_chunk_controller.py:1443-1555`` / ``:196-250`` and
``MatchZoo_Tool/train_controller.py:46-188`` in the reference) with one
dataclass tree and a registry of named presets that mirrors the reference's
``RUN_CONFIGURATIONS`` idea.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional


def _replace_from_dict(obj, overrides: Dict[str, Any]):
    """Recursively apply a nested dict of overrides onto a dataclass tree."""
    updates = {}
    for key, val in overrides.items():
        if not hasattr(obj, key):
            raise KeyError(f"{type(obj).__name__} has no config field {key!r}")
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            updates[key] = _replace_from_dict(cur, val)
        else:
            updates[key] = val
    return dataclasses.replace(obj, **updates)


@dataclass(frozen=True)
class EncoderConfig:
    """Sentence-encoder model config (reference: sentence-transformers models
    selected in ``Tool/Sentence_Embedding.py:75`` and the model presets in
    ``data_process/simple_chunk_controller.py:1557-1572``)."""

    vocab_size: int = 30522
    hidden_dim: int = 384
    num_layers: int = 6
    num_heads: int = 12
    mlp_dim: int = 1536
    max_len: int = 256
    dropout_rate: float = 0.0
    dtype: str = "bfloat16"
    pooling: str = "mean"  # mean | cls
    normalize: bool = True  # L2-normalize sentence embeddings
    # attention implementation: "auto" = Pallas flash kernel on TPU, stock
    # XLA attention elsewhere; "flash" / "stock" force it. Flash requires
    # dropout_rate == 0 (attention-probability dropout is not fused).
    attention: str = "auto"


@dataclass(frozen=True)
class ChunkingConfig:
    """Chunking method config (reference: splitter kwargs
    ``Method/Semantic_Splitter_Optimized.py:371-479`` and grouping kwargs
    ``Method/Semantic_Grouping_Optimized.py:14-60``)."""

    method: str = "splitter"  # splitter | grouping | char
    # shared
    auto_params: bool = True
    collect_metadata: bool = False
    # splitter params
    min_boundary_spacing: int = 2
    min_first_boundary_index: int = 3
    smooth_adj_window: int = 3
    valley_tau: float = 0.12
    hybrid_mode: str = "union_weighted"  # union_weighted | union | intersection
    vote_thr: float = 0.75
    c99_stopping: str = "gain"  # gain | profile
    c99_min_gain: float = 0.01
    c99_knee_c: float = 1.2
    c99_use_local_rank: bool = False
    c99_mask_size: int = 11
    soft_cap: Optional[int] = None
    soft_cap_delta: int = 2
    # DP-optimal refinement over the candidate cuts (a WORKING version of the
    # reference's inert cross-encoder/DP config — SURVEY.md §7 defect 2)
    use_dp_refine: bool = False
    dp_penalty: Optional[float] = None  # None = derive from the signal
    # granularity lever for the DP refinement (r5 frontier sweep): scales
    # the AUTO-derived penalty — <1.0 admits more cuts (finer chunks) at
    # the same signal-adaptive calibration; ignored when dp_penalty is set
    dp_penalty_scale: float = 1.0
    # grouping params
    engine: str = "spectral"  # spectral | modularity (host-side)
    knn_k: Optional[int] = None
    edge_floor: float = 0.25
    spectral_kmax: Optional[int] = None
    rmt_keep_eigs: int = 3
    sigmoid_tau_group: float = 0.15
    cap_soft: Optional[int] = None
    small_group_min: int = 2
    tau_merge: float = 0.38
    reassign_delta: float = 0.02
    # char splitter params
    char_chunk_size: int = 1000
    char_overlap: int = 100
    # sentence bucketing for static shapes on TPU; 4096 covers the corpus
    # max (3,939 sentences/doc — reference document_length_summary.json)
    # without truncation
    max_sentences: int = 4096
    # route grouping similarity matrices for docs with >= this many
    # sentences through the ring-exchange sequence-parallel path when a
    # multi-device mesh is available (parallel/ring_similarity.py)
    sp_min_sentences: int = 2048


@dataclass(frozen=True)
class RankingConfig:
    """Hybrid cosine+BM25+RRF ranking config (reference:
    ``Tool/rank_chunks_optimized.py:201-257`` and ``RANKING_DEFAULTS``
    ``data_process/simple_chunk_controller.py:196-205``)."""

    upper_percentile: float = 80.0
    lower_percentile: float = 20.0
    rrf_k: int = 60
    # weighted-RRF mixing weight for the serve-path fusion: dense leg gets
    # 2*alpha, lexical 2*(1-alpha). None (default) = the reference's
    # unweighted fusion, bit-identical scores. Tune on a labeled validation
    # split with HybridQueryEngine.tune_fusion / `semsearch tune-fusion`
    # (train/fusion.py) — beyond-parity, the reference never tunes fusion
    fusion_alpha: Optional[float] = None
    # serve-time neural rerank blend: the reranked head order is a
    # rank-RRF mix of beta * reranker-rank + (1-beta) * fusion-rank.
    # 1.0 (default) = pure reranker reorder (the reference's rescoring
    # semantics, evaluate_models.py:341-350); 0.0 = reranker inert.
    # Measured (BASELINE.md): once the fusion is validation-tuned and the
    # encoder pretrained, the tuned fusion outranks a pure reranker
    # reorder — a partial blend keeps the reranker's wins without
    # surrendering the fusion order
    rerank_blend: float = 1.0
    bm25_k1: float = 1.5
    bm25_b: float = 0.75
    bm25_epsilon: float = 0.25
    min_group_size: int = 2
    bm25_threads: int = 0   # serve-time native top-k host threads; 0 = auto
    # (min(4, os.cpu_count()), resolved at query time). The default
    # (unpruned) kernel allocates ~5 bytes/doc of scratch PER THREAD
    # (~200MB at 4 threads on a 10M-chunk corpus) — auto avoids paying that
    # on single-core hosts; only the MaxScore kernel has O(k) scratch

    # Device-resident lexical leg (index/bm25_tpu.py): score the frequent
    # terms' dense int8 contribution matrix on the TPU MXU, keep rare-term
    # postings + exact certification on the host. False = host C++ kernels.
    lexical_device: bool = False
    lexical_dense_terms: int = 4096  # dense matrix budget B (HBM: B*D int8)
    lexical_topk_device: int = 64    # candidates fetched per query (K')
    # residual int8 pass: ~100x tighter certification bound -> near-zero
    # host-fallback rate, at 2x matrix HBM (index/bm25_tpu.py)
    lexical_residual: bool = True
    # query-weight MXU format in residual mode: "int8" (per-query-scaled
    # int8 split — int8 MXU rate, no operand conversion traffic, same
    # certified error class) or "bf16" (f32->bf16x2 split). Measured at 1M
    # docs on v5e: int8 3,700 QPS vs bf16 3,129 (device leg 0.76 s vs 0.96 s
    # per 4096 queries), identical 32/32 host parity and 0.07% fallback rate
    lexical_weights: str = "int8"
    # persist the built int8 matrix in the index dir: serve restarts memmap
    # it from disk (no CSR re-quantization, no host-RSS copy) at the cost
    # of matrix-sized disk (8 GB at 1M docs residual/B=4096)
    lexical_cache: bool = False

    def resolved_bm25_threads(self) -> int:
        if self.bm25_threads > 0:
            return self.bm25_threads
        import os as _os

        return min(4, _os.cpu_count() or 1)


@dataclass(frozen=True)
class IndexConfig:
    """Sharded retrieval-index config (TPU-native; no reference analog —
    the reference reranks per-query pandas groups)."""

    embed_dim: int = 384
    shard_axis: str = "data"
    top_k: int = 10
    query_batch: int = 128   # fused-kernel block_q (sharded path)
    block_rows: int = 16384  # corpus rows per kernel block (pass-A tile)
    seg_split: int = 4       # fine-segment factor: rows/segment =
    # block_rows/128/seg_split. 16384/4 measured 97-99k QPS/chip on v5e at
    # 1.25M rows; 32768/8 peaks at ~101k (bench.py default) but pads small
    # corpora harder. Exact at any setting.
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class TrainConfig:
    """Reranker training config (reference: ``MODEL_CONFIGS``
    ``MatchZoo_Tool/train_controller.py:46-188``)."""

    model: str = "knrm"
    epochs: int = 10
    batch_size: int = 32
    # None = the optimizer's conventional default (adadelta 1.0, adam 1e-3)
    # resolved in train.trainer.make_optimizer; an explicit value is always
    # honored verbatim — no magic-number remapping
    learning_rate: Optional[float] = None
    optimizer: str = "adadelta"  # adadelta | adam
    loss: str = "hinge"  # hinge | rank_xent
    num_dup: int = 1
    num_neg: int = 1
    fixed_length_left: int = 16
    fixed_length_right: int = 128
    filter_low_freq: int = 5
    embedding_dim: int = 100
    vocab_size: int = 30000
    seed: int = 42
    clip_norm: Optional[float] = None
    eval_metrics: tuple = ("ndcg@3", "ndcg@5", "map")
    # GloVe-format local file for embedding-table init (reference builds an
    # L2-normalized GloVe-100 matrix, train_controller.py:564-581); None =
    # learned from scratch. The "encoder:<ckpt_dir>" scheme instead
    # transfers the TRAINED sentence encoder's token table
    # (train/embeddings.py::encoder_token_embeddings — requires
    # subword_tokenizer_path so the id spaces match, and embedding_dim
    # equal to the encoder's hidden size)
    embedding_init_path: Optional[str] = None
    # Rerankers encode pair texts as BPE pieces of this trained
    # SubwordTokenizer (models/subword.py) instead of a corpus-fit word
    # vocab: unseen inflections decompose into trained stems + suffixes.
    # Measured (BASELINE.md subword_rr): with encoder-transfer init +
    # keep_best this lifts EVERY reranker above its candidate generator.
    subword_tokenizer_path: Optional[str] = None
    # Best-epoch selection: when fit() is given a validation dataset and
    # keep_best is set, the returned params are from the epoch with the
    # best primary metric (eval_metrics[0]) instead of the last epoch, and
    # training stops early after `patience` epochs without improvement
    # (0 = run every epoch). This is the reference's validate-every-epoch
    # loop (MatchZoo's trainer validates NDCG@3/5+MAP per epoch and keeps
    # the best state, train_controller.py:556-560).
    keep_best: bool = False
    patience: int = 0
    # Right-length buckets — the TPU analog of MatchZoo's per-batch dynamic
    # padding (reference train_controller.py:53-58): groups bin into the
    # smallest bucket that fits their true right length, each bucket is one
    # static compiled shape. () = always pad to fixed_length_right. Ignored
    # (with a warning) for models whose parameters depend on the right
    # length (ArcII).
    length_buckets: tuple = ()
    # Margin-MSE distillation from a stronger retrieval teacher (the trained
    # dual encoder): loss = (1-w)*rank_loss + w*mean((student_margin -
    # distill_scale*teacher_margin)^2) over each group's (pos, neg) pairs,
    # where margins are score differences. Requires the PairDataset to carry
    # per-row `teacher` scores. 0.0 = off (exact previous behavior). The
    # reference has no distillation — its rerankers lean on pretrained GloVe;
    # here the trained encoder is the strongest in-repo scorer, and
    # distilling its geometry into the interaction models is the zero-egress
    # analog of training against a pretrained cross-encoder teacher.
    distill_weight: float = 0.0
    distill_scale: float = 1.0


@dataclass(frozen=True)
class Config:
    """Top-level config tree."""

    name: str = "default"
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    chunking: ChunkingConfig = field(default_factory=ChunkingConfig)
    ranking: RankingConfig = field(default_factory=RankingConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    seed: int = 42

    def override(self, **nested: Any) -> "Config":
        return _replace_from_dict(self, nested)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)


# --- Named-config registry (mirrors RUN_CONFIGURATIONS,
#     simple_chunk_controller.py:1443-1555) -----------------------------------
NAMED_CONFIGS: Dict[str, Config] = {}


def register_config(name: str, cfg: Config) -> Config:
    NAMED_CONFIGS[name] = dataclasses.replace(cfg, name=name)
    return NAMED_CONFIGS[name]


def get_named_config(name: str) -> Config:
    if name not in NAMED_CONFIGS:
        raise KeyError(
            f"Unknown config {name!r}; available: {sorted(NAMED_CONFIGS)}"
        )
    return NAMED_CONFIGS[name]


_base = Config()
# The seven named run configurations of the reference controller, re-expressed.
register_config("semantic_splitter", _base.override(chunking={"method": "splitter"}))
register_config(
    "semantic_splitter_intersection",
    _base.override(chunking={"method": "splitter", "hybrid_mode": "intersection", "auto_params": False}),
)
register_config(
    "semantic_splitter_union",
    _base.override(chunking={"method": "splitter", "hybrid_mode": "union", "auto_params": False}),
)
register_config(
    "semantic_grouping", _base.override(chunking={"method": "grouping", "engine": "spectral"})
)
register_config(
    "semantic_grouping_modularity",
    _base.override(chunking={"method": "grouping", "engine": "modularity"}),
)
register_config(
    "text_splitter_char",
    _base.override(chunking={"method": "char", "char_chunk_size": 1000, "char_overlap": 100}),
)
register_config(
    "semantic_splitter_dp",
    _base.override(chunking={"method": "splitter", "use_dp_refine": True}),
)
register_config("default", _base)
# Production serving profile (round 3): every query-path leg on the chip —
# device-resident exact BM25 lexical scoring (index/bm25_tpu.py) next to
# the dense Pallas top-k; combine with `--tokenizer tokenizer.json` /
# `--encoder-ckpt` for trained-vocabulary encoding.
register_config(
    "serve_device",
    _base.override(ranking={"lexical_device": True}),
)
