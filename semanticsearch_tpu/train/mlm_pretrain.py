"""Masked-language-model pretraining for the sentence encoder.

The reference's encoder quality rides on hub-downloaded MiniLM weights that
were MLM-pretrained on billions of tokens (``Tool/Sentence_Embedding.py:
75-150``). This build is zero-egress, so the analog is pretraining on the
user's OWN corpus: an unsupervised denoising pass over raw chunk/document
text BEFORE the supervised contrastive stage (``train/encoder_train.py``).
Labels cover a sliver of the corpus; pretraining reads all of it.

Objective — random-token corruption with a TIED decoder:
- 15% of real-token positions per sequence are replaced with uniformly
  random vocabulary ids; the model predicts the ORIGINAL id at exactly
  those positions. No ``[MASK]`` sentinel is needed (works unchanged for
  the hashing and the BPE tokenizer, neither of which reserves one), and
  there is no pretrain/encode input mismatch — corrupted tokens are just
  unusual words.
- Logits decode against the transpose of the token embedding table
  (weight tying), so the parameter tree is IDENTICAL to the encoder's:
  no head params to strip, every checkpoint stays loadable by
  ``load_encoder`` and trainable by ``ContrastiveEncoderTrainer``.

TPU-first: one jitted step (forward on corrupted ids -> gather the M
corrupted positions -> (B, M, H) x (V, H)^T logit matmul on the MXU ->
weighted xent). M is static per batch shape; rows shard over the mesh
``data`` axis like every other trainer here.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.logging import get_logger
from ..models.encoder import SentenceEncoder

logger = get_logger("mlm_pretrain")


@dataclass(frozen=True)
class MLMConfig:
    """Hyperparameters for corpus MLM pretraining."""

    epochs: int = 3
    batch_size: int = 64
    learning_rate: float = 3e-4
    warmup_frac: float = 0.05
    weight_decay: float = 0.01
    mask_prob: float = 0.15
    max_len: int = 128
    seed: int = 0


class MLMPretrainer:
    """Pretrain a SentenceEncoder's parameters on raw corpus text.

    Usage::

        enc = SentenceEncoder(cfg, mesh=mesh)
        MLMPretrainer(enc, MLMConfig(epochs=3)).fit(corpus_texts)
        ContrastiveEncoderTrainer(enc, ...).fit(pairs)   # then fine-tune
    """

    def __init__(self, encoder: SentenceEncoder,
                 cfg: MLMConfig = MLMConfig()) -> None:
        self.encoder = encoder
        self.cfg = cfg
        self._tx: Optional[optax.GradientTransformation] = None
        self._step_fn = None

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

        def loss_fn(params, ids, mask, pos, tgt, w, rng):
            h = model.apply({"params": params}, ids, mask,
                            deterministic=False, rngs={"dropout": rng},
                            return_tokens=True)          # (B, T, H) f32
            hs = jnp.take_along_axis(
                h, pos[..., None].astype(jnp.int32), axis=1)  # (B, M, H)
            emb = params["token_embed"]["embedding"].astype(jnp.float32)
            logits = jnp.einsum("bmh,vh->bmv", hs, emb)   # tied decoder
            nll = optax.softmax_cross_entropy_with_integer_labels(logits, tgt)
            return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)

        @jax.jit
        def step(params, opt_state, ids, mask, pos, tgt, w, rng):
            if mesh is not None:
                row = NamedSharding(mesh, P("data", None))
                ids = jax.lax.with_sharding_constraint(ids, row)
                mask = jax.lax.with_sharding_constraint(mask, row)
                pos = jax.lax.with_sharding_constraint(pos, row)
                tgt = jax.lax.with_sharding_constraint(tgt, row)
                w = jax.lax.with_sharding_constraint(w, row)
            val, grads = jax.value_and_grad(loss_fn)(
                params, ids, mask, pos, tgt, w, rng)
            updates, opt_state = self._tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, val

        self._step_fn = step

    def _corrupt(self, rng: np.random.Generator, ids: np.ndarray,
                 mask: np.ndarray, n_mask: int):
        """Host-side corruption for one batch: returns (corrupt_ids, pos,
        targets, weights) with a STATIC n_mask positions per row (rows with
        fewer real tokens get zero-weight padding slots)."""
        b, t = ids.shape
        vocab = self.encoder.cfg.vocab_size
        corrupt = ids.copy()
        pos = np.zeros((b, n_mask), np.int32)
        tgt = np.zeros((b, n_mask), np.int32)
        w = np.zeros((b, n_mask), np.float32)
        for r in range(b):
            real = np.nonzero(mask[r])[0]
            if real.size == 0:
                continue
            k = min(n_mask, real.size)
            sel = rng.choice(real, size=k, replace=False)
            pos[r, :k] = sel
            tgt[r, :k] = ids[r, sel]
            w[r, :k] = 1.0
            corrupt[r, sel] = rng.integers(0, vocab, size=k)
        return corrupt, pos, tgt, w

    def fit(self, texts: Sequence[str]) -> List[Dict[str, float]]:
        """Pretrain on raw texts; mutates ``encoder.params``."""
        cfg = self.cfg
        texts = [t for t in texts if t]
        if not texts:
            raise ValueError("no pretraining texts")
        max_len = min(cfg.max_len, self.encoder.cfg.max_len)
        ids_full, mask_full = self.encoder.tokenizer.encode_batch(
            texts, max_len=max_len)
        n = len(texts)
        bsz = min(cfg.batch_size, n)
        steps_per_epoch = -(-n // bsz)
        self._build(steps_per_epoch * cfg.epochs)
        n_mask = max(1, int(round(cfg.mask_prob * max_len)))

        params = self.encoder.params
        opt_state = self._tx.init(params)
        history: List[Dict[str, float]] = []
        for epoch in range(cfg.epochs):
            t0 = time.perf_counter()
            rng_np = np.random.default_rng(cfg.seed + 7919 * (epoch + 1))
            order = rng_np.permutation(n)
            epoch_rng = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed), epoch)
            losses = []
            for si, s in enumerate(range(0, n, bsz)):
                sel = order[s: s + bsz]
                if len(sel) < bsz:  # wrap-around flush, as in pairs.py
                    sel = np.concatenate(
                        [sel, np.resize(order, bsz - len(sel))])
                corrupt, pos, tgt, w = self._corrupt(
                    rng_np, ids_full[sel], mask_full[sel], n_mask)
                sub = jax.random.fold_in(epoch_rng, si)
                params, opt_state, loss_val = self._step_fn(
                    params, opt_state,
                    jnp.asarray(corrupt), jnp.asarray(mask_full[sel]),
                    jnp.asarray(pos), jnp.asarray(tgt), jnp.asarray(w), sub)
                # device scalar — one fetch per epoch, not per step
                losses.append(loss_val)
            self.encoder.params = params
            row = {"epoch": epoch,
                   "loss": float(jnp.mean(jnp.stack(losses))),
                   "time_s": time.perf_counter() - t0}
            history.append(row)
            logger.info("mlm epoch %d: %s", epoch, row)
        return history
