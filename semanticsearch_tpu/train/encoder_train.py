"""Contrastive (InfoNCE) training for the sentence encoder.

The reference's semantics come from pretrained sentence-transformers weights
fetched from the HuggingFace hub (``Tool/Sentence_Embedding.py:75-150``).
This build runs zero-egress, so semantics are TRAINED in-repo: a dual-encoder
InfoNCE objective over (query, positive chunk) pairs produced by the data
layer (qrels labels or the hybrid ranker's percentile labels,
``Tool/rank_chunks_optimized.py:517-526``), with in-batch negatives and
optional explicit hard negatives.

TPU-first design:
- The whole step is ONE jitted function: two encoder forwards (static
  shapes), a (B, B[+B]) logit matmul on the MXU, and a bidirectional
  softmax NLL. No data-dependent Python control flow.
- Batch rows shard over the mesh ``data`` axis (queries and chunks alike);
  the (B, B) logit matrix makes every other row in the global batch an
  in-batch negative, so data parallelism INCREASES the effective negative
  pool — XLA inserts the all-gather for the cross-shard matmul.
- Trailing partial batches are padded by wrap-around (real pairs), matching
  the reranker dataloader discipline in ``train/pairs.py``.
"""
from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.checkpoint import save_checkpoint
from ..core.logging import get_logger
from ..models.encoder import SentenceEncoder

logger = get_logger("encoder_train")


@dataclass(frozen=True)
class ContrastiveConfig:
    """Hyperparameters for dual-encoder InfoNCE training."""

    epochs: int = 10
    batch_size: int = 64
    learning_rate: float = 3e-4
    warmup_frac: float = 0.05     # fraction of total steps spent warming up
    weight_decay: float = 0.01
    temperature: float = 0.05     # sentence-transformers MNRL default scale
    symmetric: bool = True        # add the chunk->query direction
    max_len_query: int = 64
    max_len_chunk: int = 256
    use_hard_negatives: bool = True
    seed: int = 0


def pairs_from_labeled_rows(
    rows: Sequence[Dict[str, str]],
) -> Tuple[List[Tuple[str, str]], List[Optional[str]]]:
    """Extract (query_text, positive_chunk) pairs + one hard negative each.

    ``rows`` are labeled TSV rows (query_id/query_text/chunk_text/label, the
    hybrid ranker's output contract). Every label>0 row becomes a pair; a
    label<=0 chunk of the SAME query (round-robin) becomes its hard negative,
    or None when the query has no negatives.
    """
    by_query: Dict[str, Dict[str, List[str]]] = {}
    qtext: Dict[str, str] = {}
    for r in rows:
        q = r.get("query_id") or r.get("query_text", "")
        qtext[q] = r.get("query_text") or q
        bucket = by_query.setdefault(q, {"pos": [], "neg": []})
        try:
            label = float(r.get("label", "0"))
        except ValueError:
            continue
        bucket["pos" if label > 0 else "neg"].append(
            r.get("chunk_text") or r.get("document", "")
        )
    pairs: List[Tuple[str, str]] = []
    hard: List[Optional[str]] = []
    for q, bucket in by_query.items():
        negs = bucket["neg"]
        for i, pos in enumerate(bucket["pos"]):
            pairs.append((qtext[q], pos))
            hard.append(negs[i % len(negs)] if negs else None)
    return pairs, hard


def mining_inputs_from_labeled_rows(
    rows: Sequence[Dict[str, str]],
    pairs: Sequence[Tuple[str, str]],
) -> Tuple[List[str], List[List[int]]]:
    """Mining corpus + per-pair relevant rows for :func:`fit_with_mining`.

    ``rows`` are the same labeled TSV rows given to
    :func:`pairs_from_labeled_rows` and ``pairs`` its output: the corpus is
    every distinct chunk text in the input (positives and negatives alike —
    the widest in-domain pool the data layer provides), and
    ``relevant_idx[i]`` lists the corpus rows labeled positive for pair
    ``i``'s query, so re-mining never picks a known positive as a negative.
    """
    corpus: List[str] = []
    idx: Dict[str, int] = {}
    pos_by_q: Dict[str, set] = {}
    for r in rows:
        text = r.get("chunk_text") or r.get("document", "")
        if not text:
            continue
        if text not in idx:
            idx[text] = len(corpus)
            corpus.append(text)
        try:
            label = float(r.get("label", "0"))
        except ValueError:
            continue
        if label > 0:
            # same query-string resolution as pairs_from_labeled_rows:
            # pairs carry query_text when present, else query_id
            q = r.get("query_text") or r.get("query_id") or ""
            pos_by_q.setdefault(q, set()).add(idx[text])
    relevant = [sorted(pos_by_q.get(q, ())) for q, _ in pairs]
    return corpus, relevant


class ContrastiveEncoderTrainer:
    """Train a SentenceEncoder's parameters with InfoNCE.

    Usage::

        enc = SentenceEncoder(cfg, mesh=mesh)
        trainer = ContrastiveEncoderTrainer(enc, ContrastiveConfig())
        history = trainer.fit(pairs, hard_negatives=negs)
        enc.save("/path/to/ckpt")          # enc.params now trained
    """

    def __init__(
        self,
        encoder: SentenceEncoder,
        cfg: ContrastiveConfig = ContrastiveConfig(),
        total_steps: Optional[int] = None,
    ) -> None:
        self.encoder = encoder
        self.cfg = cfg
        self._total_steps = total_steps  # resolved in fit() when None
        self._tx: Optional[optax.GradientTransformation] = None
        self._step_fn = None

    # ------------------------------------------------------------- internals
    def _build(self, total_steps: int) -> None:
        cfg = self.cfg
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=max(1, int(total_steps * cfg.warmup_frac)),
            decay_steps=max(2, total_steps),
            end_value=cfg.learning_rate * 0.1,
        )
        self._tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        model = self.encoder.model
        mesh = self.encoder.mesh
        temperature = cfg.temperature
        symmetric = cfg.symmetric

        def loss_fn(params, q_ids, q_mask, c_ids, c_mask, rng):
            rngs = {"dropout": rng}
            q = model.apply({"params": params}, q_ids, q_mask,
                            deterministic=False, rngs=rngs)
            # Chunk rows are [pos_0..pos_B-1] or, with hard negatives,
            # [pos_0..pos_B-1, neg_0..neg_B-1] — a (B, 2B) logit matrix where
            # column i is the true positive and every other column (other
            # positives AND all hard negatives) is a negative.
            c = model.apply({"params": params}, c_ids, c_mask,
                            deterministic=False, rngs=rngs)
            b = q_ids.shape[0]
            logits = (q @ c.T) / temperature  # (B, B) or (B, 2B)
            labels = jnp.arange(b)
            l_qc = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            if symmetric:
                l_cq = optax.softmax_cross_entropy_with_integer_labels(
                    logits[:, :b].T, labels
                ).mean()
                return 0.5 * (l_qc + l_cq)
            return l_qc

        @jax.jit
        def step(params, opt_state, q_ids, q_mask, c_ids, c_mask, rng):
            if mesh is not None:
                spec = NamedSharding(mesh, P("data", None))
                q_ids = jax.lax.with_sharding_constraint(q_ids, spec)
                q_mask = jax.lax.with_sharding_constraint(q_mask, spec)
                c_ids = jax.lax.with_sharding_constraint(c_ids, spec)
                c_mask = jax.lax.with_sharding_constraint(c_mask, spec)
            val, grads = jax.value_and_grad(loss_fn)(
                params, q_ids, q_mask, c_ids, c_mask, rng
            )
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, val

        self._step_fn = step

    def _tokenize(
        self, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self.encoder.tokenizer.encode_batch(texts, max_len=max_len)

    # ------------------------------------------------------------------ API
    def fit(
        self,
        pairs: Sequence[Tuple[str, str]],
        hard_negatives: Optional[Sequence[Optional[str]]] = None,
        eval_fn=None,
    ) -> List[Dict[str, float]]:
        """Train on (query, positive) pairs; mutates ``encoder.params``.

        ``hard_negatives[i]`` (optional) is an explicit negative chunk for
        pair i; pairs with None fall back to reusing their positive (which
        contributes ~0 extra signal but keeps shapes static). ``eval_fn``,
        when given, is called with the encoder after each epoch and its
        scalar result is recorded in the history.
        """
        cfg = self.cfg
        n = len(pairs)
        if n == 0:
            raise ValueError("no training pairs")
        use_hn = cfg.use_hard_negatives and hard_negatives is not None
        bsz = min(cfg.batch_size, n)
        steps_per_epoch = -(-n // bsz)
        total = self._total_steps or steps_per_epoch * cfg.epochs
        self._build(total)

        # Sequence lengths are capped by the encoder's positional table —
        # longer token windows would index pos_embed out of range (NaNs).
        model_cap = self.encoder.cfg.max_len
        len_q = min(cfg.max_len_query, model_cap)
        len_c = min(cfg.max_len_chunk, model_cap)
        q_ids, q_mask = self._tokenize([p[0] for p in pairs], len_q)
        c_ids, c_mask = self._tokenize([p[1] for p in pairs], len_c)
        if use_hn:
            hn_texts = [
                hn if hn is not None else pairs[i][1]
                for i, hn in enumerate(hard_negatives)
            ]
            n_ids, n_mask = self._tokenize(hn_texts, len_c)

        params = self.encoder.params
        opt_state = self._tx.init(params)
        history: List[Dict[str, float]] = []
        for epoch in range(cfg.epochs):
            t0 = time.perf_counter()
            rng_np = np.random.default_rng(cfg.seed + epoch)
            order = rng_np.permutation(n)
            epoch_rng = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed), epoch
            )
            losses = []
            for si, s in enumerate(range(0, n, bsz)):
                sel = order[s: s + bsz]
                if len(sel) < bsz:  # wrap-around flush, as in pairs.py
                    sel = np.concatenate([sel, np.resize(order, bsz - len(sel))])
                bq_ids, bq_mask = q_ids[sel], q_mask[sel]
                bc_ids, bc_mask = c_ids[sel], c_mask[sel]
                if use_hn:
                    # stack [positives; hard negatives] on the chunk side;
                    # the query forward stays at B rows
                    bc_ids = np.concatenate([bc_ids, n_ids[sel]], axis=0)
                    bc_mask = np.concatenate([bc_mask, n_mask[sel]], axis=0)
                sub = jax.random.fold_in(epoch_rng, si)
                params, opt_state, loss_val = self._step_fn(
                    params, opt_state,
                    jnp.asarray(bq_ids), jnp.asarray(bq_mask),
                    jnp.asarray(bc_ids), jnp.asarray(bc_mask), sub,
                )
                # keep the DEVICE scalar: fetching here would block a
                # tunnel round-trip per step (steps chain through params,
                # so compute never waits on the host)
                losses.append(loss_val)
            self.encoder.params = params
            row: Dict[str, float] = {
                "epoch": epoch,
                "loss": float(jnp.mean(jnp.stack(losses))),
                "time_s": time.perf_counter() - t0,
            }
            if eval_fn is not None:
                row["eval"] = float(eval_fn(self.encoder))
            history.append(row)
            logger.info("contrastive epoch %d: %s", epoch, row)
        return history


def mine_hard_negatives(
    encoder: SentenceEncoder,
    queries: Sequence[str],
    corpus_texts: Sequence[str],
    relevant_idx: Sequence[Sequence[int]],
    rank_floor: int = 0,
) -> List[str]:
    """Self-mined hard negatives: for each query, the highest-scoring
    NON-relevant corpus text under the CURRENT encoder.

    The static hard negatives the data layer provides (label<=0 rows) stop
    being hard once the encoder has learned them; re-mining against the
    model's own live ranking keeps the InfoNCE denominator adversarial —
    the ANCE-style refresh, zero-egress. ``relevant_idx[i]`` are corpus
    rows relevant to ``queries[i]`` (masked out so a true positive is
    never used as a negative). ``rank_floor`` skips the top-``rank_floor``
    non-relevant hits — useful when labels are incomplete and the very
    top hits may be unlabeled positives (false-negative guard).
    """
    if len(queries) != len(relevant_idx):
        raise ValueError(
            f"{len(queries)} queries vs {len(relevant_idx)} relevance rows")
    # queries arrive one-per-pair, so the same query text repeats once per
    # positive — encode each distinct text once and scatter back
    uniq, inverse = np.unique(np.asarray(queries, dtype=object),
                              return_inverse=True)
    qe = encoder.encode([str(q) for q in uniq])[inverse]
    de = encoder.encode(list(corpus_texts))
    scores = qe @ de.T
    out: List[str] = []
    for i, rel in enumerate(relevant_idx):
        row = scores[i].copy()
        rel_rows = np.asarray(list(rel), dtype=np.int64)
        if rel_rows.size:
            row[rel_rows] = -np.inf
        order = np.argsort(-row)
        pick = order[min(rank_floor, len(order) - 1)]
        out.append(corpus_texts[int(pick)])
    return out


def fit_with_mining(
    encoder: SentenceEncoder,
    cfg: ContrastiveConfig,
    pairs: Sequence[Tuple[str, str]],
    corpus_texts: Sequence[str],
    relevant_idx: Sequence[Sequence[int]],
    initial_negatives: Optional[Sequence[Optional[str]]] = None,
    rounds: int = 2,
    rank_floor: int = 0,
) -> List[Dict[str, float]]:
    """Contrastive training with periodic hard-negative re-mining.

    Runs ``rounds`` training stages of ``cfg.epochs`` each; stage 0 uses
    ``initial_negatives`` (the data layer's static negatives), every later
    stage re-mines each pair's negative from the CURRENT encoder via
    :func:`mine_hard_negatives`. Mutates ``encoder.params``; returns the
    concatenated history with a ``round`` field per row. Beyond-parity:
    the reference fine-tunes nothing (pretrained weights only,
    ``Tool/Sentence_Embedding.py:75-150``).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    history: List[Dict[str, float]] = []
    negs: Optional[Sequence[Optional[str]]] = initial_negatives
    queries = [p[0] for p in pairs]
    for r in range(rounds):
        if r > 0:
            negs = mine_hard_negatives(
                encoder, queries, corpus_texts, relevant_idx,
                rank_floor=rank_floor)
        stage_cfg = dataclasses.replace(cfg, seed=cfg.seed + 101 * r)
        hist = ContrastiveEncoderTrainer(encoder, stage_cfg).fit(
            pairs, hard_negatives=negs)
        for row in hist:
            row["round"] = r
        history.extend(hist)
    return history


def save_encoder(encoder: SentenceEncoder, path: str) -> str:
    """Persist encoder params + config (the local-pretrained-weights path the
    reference gets for free from the HF hub). A trained subword tokenizer
    travels WITH the weights (``tokenizer.json``) — ids must be produced by
    the exact vocabulary the embedding table was trained against, the same
    coupling sentence-transformers ships (``Tool/Sentence_Embedding.py:
    75-150``)."""
    out = save_checkpoint(
        path,
        {"params": encoder.params},
        metadata={"encoder_config": dataclasses.asdict(encoder.cfg),
                  "kind": "sentence_encoder"},
    )
    if hasattr(encoder.tokenizer, "save"):
        encoder.tokenizer.save(os.path.join(path, "tokenizer.json"))
    return out


def load_encoder(path: str, mesh=None) -> SentenceEncoder:
    """Load a SentenceEncoder saved by :func:`save_encoder` (including its
    persisted subword tokenizer, when one was trained)."""
    from ..core.checkpoint import load_metadata, restore_checkpoint
    from ..core.config import EncoderConfig

    meta = load_metadata(path) or {}
    cfg_dict = meta.get("encoder_config")
    if not cfg_dict:
        raise FileNotFoundError(f"no encoder metadata at {path}")
    cfg = EncoderConfig(**cfg_dict)
    tokenizer = None
    tok_path = os.path.join(path, "tokenizer.json")
    if os.path.exists(tok_path):
        from ..models.subword import SubwordTokenizer

        tokenizer = SubwordTokenizer.load(tok_path)
    template = SentenceEncoder(cfg, seed=0, tokenizer=tokenizer)
    params = restore_checkpoint(path, {"params": template.params})["params"]
    return SentenceEncoder(cfg, mesh=mesh, params=params,
                           tokenizer=tokenizer)
