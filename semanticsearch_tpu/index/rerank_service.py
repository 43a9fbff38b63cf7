"""Serve-time neural reranking: load a trained reranker, score candidates.

The reference trains and evaluates its seven rerankers offline
(``MatchZoo_Tool/train_controller.py``, ``evaluate_models.py:122-350``) but has
no serving path that puts them behind retrieval; this module closes the loop
the reference's architecture implies (rank_chunks -> matchzoo rerank): the
hybrid engine's top-N RRF candidates are rescored on-device by a trained
reranker checkpoint and reordered.

TPU shape discipline: a THREE-RUNG ladder of jitted predict signatures
(SCORE_BATCH / SCORE_BATCH_MID / SCORE_BATCH_LARGE rows) — all (query,
chunk) pairs for a whole query batch are packed into fixed-size (rows, L)
id blocks, padded with PAD rows whose scores are discarded, so serving
never triggers a recompile regardless of query count or candidate depth.
Large blocks exist because per-dispatch latency, not compute, bounds serve
rerank through a remote device link: a 1024-query x top-20 rescore is
20,480 pairs = 3 large dispatches instead of 80 small ones; the mid rung
bounds pad waste to ~2.7x for leftover counts between the rungs. All
blocks are dispatched before any score is fetched (JAX dispatch is async),
so block i+1's host packing and upload overlap block i's compute.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..core.checkpoint import load_metadata, restore_checkpoint
from ..core.config import TrainConfig
from ..core.logging import get_logger
from ..train.vocab import Preprocessor

logger = get_logger("rerank")

SCORE_BATCH = 256
SCORE_BATCH_MID = 2048
SCORE_BATCH_LARGE = 8192
# beyond 3x the next-smaller rung of leftover pairs, one padded bigger
# block beats a train of small dispatches (pad-row compute is cheaper than
# the round trips); the mid rung bounds worst-case padding waste to ~2.7x
# (a two-rung ladder wasted up to 10.7x just above the small threshold)
_LARGE_THRESHOLD = 3 * SCORE_BATCH_MID
_MID_THRESHOLD = 3 * SCORE_BATCH


def _block_size(remaining: int) -> int:
    if remaining > _LARGE_THRESHOLD:
        return SCORE_BATCH_LARGE
    if remaining > _MID_THRESHOLD:
        return SCORE_BATCH_MID
    return SCORE_BATCH


class RerankService:
    """A trained reranker checkpoint + preprocessor, ready to score pairs."""

    def __init__(
        self,
        model_name: str,
        params,
        preprocessor: Preprocessor,
        cfg: Optional[TrainConfig] = None,
        model_kwargs: Optional[dict] = None,
    ) -> None:
        import jax
        import jax.numpy as jnp

        from ..models.rerankers import make_model

        self.model_name = model_name
        self.pp = preprocessor
        self.cfg = cfg or TrainConfig(model=model_name)
        # model_kwargs must match the checkpoint's architecture overrides
        # (e.g. a preset's kernel_num) or apply() walks a different tree
        # than the restored params
        self.model_kwargs = dict(model_kwargs or {})
        self.model = make_model(
            model_name, vocab_size=preprocessor.vocab_size,
            embed_dim=self.cfg.embedding_dim, **self.model_kwargs,
        )
        self.params = params

        @jax.jit
        def predict(params, left, right):
            # ids may arrive int16 (halved upload over a remote link —
            # serve-path transfers are the pipeline bound there); the
            # embedding gather wants int32
            return self.model.apply(
                {"params": params}, left.astype(jnp.int32),
                right.astype(jnp.int32), deterministic=True)

        self._predict = predict
        self._jnp = jnp
        # token-id wire format: int16 halves the per-batch rerank upload
        # (~2 MB/1024-query batch at 3x8192 pairs) when the vocab fits
        self._wire_dtype = np.int16 if preprocessor.vocab_size < 2**15 \
            else np.int32

    # ---------------------------------------------------------------- loading
    @classmethod
    def load(cls, checkpoint_dir: str) -> "RerankService":
        """Restore model name/config from checkpoint metadata, the vocab from
        ``preprocessor.json``, and the trained params (the artifact layout
        ``CVEvaluator.run_model`` writes; the reference reloads the analogous
        model.pt + preprocessor pair, ``evaluate_models.py:157-210``)."""
        import jax

        meta = load_metadata(checkpoint_dir) or {}
        cfg_dict = dict(meta.get("config", {}))
        if "eval_metrics" in cfg_dict:
            cfg_dict["eval_metrics"] = tuple(cfg_dict["eval_metrics"])
        cfg = TrainConfig(**cfg_dict) if cfg_dict else TrainConfig()
        pp = Preprocessor.load(os.path.join(checkpoint_dir, "preprocessor.json"))
        from ..models.rerankers import make_model

        # rebuild the SAME architecture the checkpoint was trained with —
        # the trainer persists its model_kwargs (e.g. Conv-KNRM's
        # kernel_num/filters preset) exactly so loaders don't fall back to
        # the model class defaults (the reference infers this from tensor
        # shapes instead, evaluate_models.py:277-322)
        model_kwargs = dict(meta.get("model_kwargs") or {})
        model = make_model(cfg.model, vocab_size=pp.vocab_size,
                           embed_dim=cfg.embedding_dim, **model_kwargs)
        dummy_l = np.zeros((2, pp.fixed_length_left), np.int32)
        dummy_r = np.zeros((2, pp.fixed_length_right), np.int32)
        template = {
            "params": model.init(jax.random.PRNGKey(0), dummy_l, dummy_r)[
                "params"
            ]
        }
        params = restore_checkpoint(checkpoint_dir, template)["params"]
        logger.info("loaded %s reranker from %s (vocab %d)",
                    cfg.model, checkpoint_dir, pp.vocab_size)
        return cls(cfg.model, params, pp, cfg=cfg, model_kwargs=model_kwargs)

    # ---------------------------------------------------------------- scoring
    def score_pairs(
        self,
        query_texts: Sequence[str],
        chunk_texts: Sequence[str],
    ) -> np.ndarray:
        """Score aligned (query, chunk) text pairs: (N,) float32.

        Pairs are packed into fixed-shape blocks (_block_size picks the
        ladder rung from the remaining count; pad rows' scores are
        discarded) so every call reuses one of three compiled predict
        signatures. Every block is dispatched before any block's scores
        are fetched.
        """
        n = len(query_texts)
        assert len(chunk_texts) == n
        if n == 0:
            return np.zeros(0, np.float32)
        enc = self.pp.transform_pair(list(query_texts), list(chunk_texts))
        left, right = enc["left"], enc["right"]
        blocks = []  # (start, end, device handle)
        s = 0
        while s < n:
            bs = _block_size(n - s)
            e = min(s + bs, n)
            lb = np.zeros((bs, left.shape[1]), self._wire_dtype)
            rb = np.zeros((bs, right.shape[1]), self._wire_dtype)
            lb[: e - s] = left[s:e]
            rb[: e - s] = right[s:e]
            blocks.append((s, e, self._predict(
                self.params, self._jnp.asarray(lb), self._jnp.asarray(rb))))
            s = e
        out = np.zeros(n, np.float32)
        for s, e, handle in blocks:
            out[s:e] = np.asarray(handle)[: e - s]
        return out

