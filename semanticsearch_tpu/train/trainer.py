"""Reranker training loop: optax optimizers, pairwise losses, eval, ckpt.

Rebuilds the reference's ``ModelTrainer`` (``MatchZoo_Tool/train_controller.py:
261-761``) TPU-first: one jitted train step (pairwise groups in a static-shape
batch), optax adadelta/adam matching the per-model optimizer choices
(``:89-93,:109-120``), RankHinge / RankCrossEntropy losses matching MatchZoo's
(hinge margin 1.0 default; rank-xent over (1+num_neg) groups, ``:132-138``),
optional grad clipping (Conv-KNRM clip_norm=10, ``:117``), per-epoch IR-metric
eval (NDCG@3/5 + MAP, ``:556-560``), checkpoint via core.checkpoint.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.checkpoint import save_checkpoint
from ..core.config import TrainConfig
from ..core.logging import get_logger
from ..models.rerankers import make_model
from .metrics import evaluate_ranking
from .pairs import PairDataset

logger = get_logger("train")


# --------------------------------------------------------------------- losses

def rank_hinge_loss(scores: jnp.ndarray, group_size: int, margin: float = 1.0):
    """Pairwise hinge over groups: rows are [pos, neg_1..neg_k] repeated.

    MatchZoo's RankHingeLoss with num_neg=k: mean over all (pos, neg) pairs of
    max(0, margin - (s_pos - s_neg)).
    """
    g = scores.reshape(-1, group_size)
    pos = g[:, :1]
    neg = g[:, 1:]
    return jnp.mean(jnp.maximum(0.0, margin - (pos - neg)))


def rank_xent_loss(scores: jnp.ndarray, group_size: int):
    """RankCrossEntropy: softmax over each group, NLL of the positive."""
    g = scores.reshape(-1, group_size)
    logp = jax.nn.log_softmax(g, axis=-1)
    return -jnp.mean(logp[:, 0])


def margin_mse_loss(scores: jnp.ndarray, teacher: jnp.ndarray,
                    group_size: int, scale: float = 1.0):
    """Margin-MSE distillation (Hofstätter et al. 2020) over pairwise groups:
    the student's (pos - neg) score margin regresses onto the teacher's,
    mean((s_pos - s_neg) - scale*(t_pos - t_neg))^2. Preserves the teacher's
    score GEOMETRY (how much better the positive is), not just its order —
    the signal a binary hinge discards."""
    g = scores.reshape(-1, group_size)
    t = teacher.reshape(-1, group_size)
    s_margin = g[:, :1] - g[:, 1:]
    t_margin = (t[:, :1] - t[:, 1:]) * scale
    return jnp.mean((s_margin - t_margin) ** 2)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # learning_rate=None -> the optimizer's conventional default; an
    # explicit value is honored verbatim (an earlier magic-number guard
    # remapped adam lr=1.0 to 1e-3, silently ignoring a deliberate 1.0)
    lr = cfg.learning_rate
    if cfg.optimizer == "adam":
        tx = optax.adam(1e-3 if lr is None else lr)
    elif cfg.optimizer == "adadelta":
        tx = optax.adadelta(1.0 if lr is None else lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
    return tx


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


@dataclass
class TrainResult:
    params: Any
    history: List[Dict[str, float]] = field(default_factory=list)
    best_metrics: Dict[str, float] = field(default_factory=dict)


class RerankTrainer:
    """Train one reranker on a PairDataset; evaluate point-mode with IR metrics."""

    def __init__(
        self,
        model_name: str,
        vocab_size: int,
        cfg: TrainConfig = TrainConfig(),
        model_kwargs: Optional[Dict] = None,
        embedding_matrix=None,
        warm_start_fn=None,
    ) -> None:
        """``embedding_matrix`` (vocab_size, embed_dim) overrides the random
        embedding-table init — the pretrained-GloVe slot of the reference
        (``train_controller.py:564-581``); build it with
        ``train.embeddings.load_word_embeddings``. ``warm_start_fn``
        (params -> params) runs LAST in init_params — e.g.
        ``models.rerankers.transfer_from_encoder`` warm-starting a
        cross-encoder's whole block stack from a trained sentence encoder."""
        self.cfg = cfg
        self._embedding_matrix = embedding_matrix
        self._warm_start_fn = warm_start_fn
        # kept for checkpoint metadata: evaluate_saved_model must rebuild
        # the SAME architecture, not the model's defaults
        self._model_kwargs = dict(model_kwargs or {})
        self.model = make_model(
            model_name, vocab_size=vocab_size,
            embed_dim=cfg.embedding_dim, **self._model_kwargs,
        )
        self.tx = make_optimizer(cfg)
        self._loss_fn = (
            rank_xent_loss if cfg.loss == "rank_xent" else rank_hinge_loss
        )

        self._distill = cfg.distill_weight > 0.0

        @functools.partial(jax.jit, static_argnames=("group_size",))
        def train_step(params, opt_state, left, right, group_size, rng,
                       teacher=None):
            def loss(p):
                scores = self.model.apply(
                    {"params": p}, left, right, deterministic=False,
                    rngs={"dropout": rng},
                )
                base = self._loss_fn(scores, group_size)
                if teacher is None:
                    return base
                mse = margin_mse_loss(scores, teacher, group_size,
                                      cfg.distill_scale)
                w = cfg.distill_weight
                return (1.0 - w) * base + w * mse

            val, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, val

        @jax.jit
        def predict_step(params, left, right):
            return self.model.apply({"params": params}, left, right,
                                    deterministic=True)

        self._train_step = train_step
        self._predict_step = predict_step

    def init_params(self, dataset: PairDataset, seed: Optional[int] = None):
        rng = jax.random.PRNGKey(self.cfg.seed if seed is None else seed)
        left = jnp.asarray(dataset.left[:2])
        right = jnp.asarray(dataset.right[:2])
        params = self.model.init(rng, left, right)["params"]
        if self._embedding_matrix is not None:
            from .embeddings import apply_embedding_init

            params = apply_embedding_init(params, self._embedding_matrix)
        if self._warm_start_fn is not None:
            params = self._warm_start_fn(params)
        return params

    def predict(self, params, dataset: PairDataset, batch_size: int = 128
                ) -> np.ndarray:
        out = np.zeros(dataset.left.shape[0], np.float32)
        for batch in dataset.iter_point_batches(batch_size):
            scores = np.asarray(
                self._predict_step(params, jnp.asarray(batch["left"]),
                                   jnp.asarray(batch["right"]))
            )
            valid = batch["valid"]
            out[batch["row_ids"][valid]] = scores[valid]
        return out

    def evaluate(self, params, dataset: PairDataset,
                 metrics=None) -> Dict[str, float]:
        scores = self.predict(params, dataset)
        return evaluate_ranking(
            dataset.query_ids, dataset.labels, scores,
            metrics=metrics or self.cfg.eval_metrics,
        )

    def fit(
        self,
        train_ds: PairDataset,
        test_ds: Optional[PairDataset] = None,
        checkpoint_dir: Optional[str] = None,
        resume_from: Optional[str] = None,
        checkpoint_every: Optional[int] = None,
        checkpoint_every_steps: Optional[int] = None,
    ) -> TrainResult:
        """Train; optionally checkpoint every N epochs (or every N steps with
        ``checkpoint_every_steps``) and resume mid-run.

        Unlike the reference (final-artifact-only checkpoints,
        ``train_controller.py:497-498``), resume restores params + optimizer
        state + the DATA-ITERATOR CURSOR (epoch, step-in-epoch): the pair
        sampler is deterministic in (seed, epoch), so the cursor alone
        reproduces the exact remaining batch stream — step checkpoints land
        mid-epoch and resume continues from the next batch. Periodic saves
        are async (orbax background write) so the loop overlaps I/O with the
        next steps; the final save blocks until everything is committed.
        """
        cfg = self.cfg
        if self._distill and train_ds.teacher is None:
            raise ValueError(
                "distill_weight > 0 but the training PairDataset carries no "
                "`teacher` scores — attach per-row teacher scores (e.g. the "
                "trained encoder's cosine for each (query, doc) row) or set "
                "distill_weight=0. Refusing to silently train undistilled."
            )
        params = self.init_params(train_ds)
        opt_state = self.tx.init(params)
        start_epoch = 0
        resume_step_in_epoch = -1  # last completed step of start_epoch
        step = 0
        batch_size = cfg.batch_size
        if resume_from:
            from ..core.checkpoint import load_metadata, restore_checkpoint

            meta = load_metadata(resume_from) or {}
            has_cursor = "step_in_epoch" in meta
            target = {"params": params, "opt_state": opt_state, "epoch": 0}
            if has_cursor:
                target["step_in_epoch"] = 0
            state = restore_checkpoint(resume_from, target)
            params = state["params"]
            opt_state = jax.tree.unflatten(
                jax.tree.structure(opt_state), jax.tree.leaves(state["opt_state"])
            )
            if has_cursor:
                # mid-epoch cursor: continue the SAME epoch after this step
                start_epoch = int(np.asarray(state["epoch"]))
                resume_step_in_epoch = int(np.asarray(state["step_in_epoch"]))
            else:
                start_epoch = int(np.asarray(state["epoch"])) + 1
            # Restore the global step counter so post-resume periodic saves
            # continue the step_N numbering instead of overwriting the
            # original run's checkpoints, and the effective batch size (it
            # may have been OOM-halved mid-run — the step-in-epoch cursor is
            # only meaningful at the batch size that produced it).
            step = int(meta.get("global_step", 0))
            saved_bs = meta.get("batch_size")
            if saved_bs is not None and int(saved_bs) != batch_size:
                logger.warning(
                    "resume: checkpoint was written at batch_size=%d "
                    "(config says %d); using the checkpoint's so the "
                    "step-in-epoch cursor skips the right batches",
                    int(saved_bs), batch_size,
                )
                batch_size = int(saved_bs)
        length_buckets = tuple(cfg.length_buckets or ())
        if length_buckets and not getattr(self.model, "length_bucketable",
                                          True):
            logger.warning(
                "%s has length-dependent parameters; ignoring "
                "length_buckets=%s", type(self.model).__name__, length_buckets,
            )
            length_buckets = ()
        history: List[Dict[str, float]] = []
        best: Dict[str, float] = {}
        # best-epoch selection (cfg.keep_best): params are immutable jax
        # trees, so snapshotting the best epoch is a reference, not a copy
        best_params = params
        epochs_since_best = 0
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.perf_counter()
            losses = []
            # Dropout rng is derived from (seed, epoch, step-in-epoch) so a
            # resumed run replays the identical stream an uninterrupted run
            # would have used from this epoch on.
            epoch_rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            # OOM batch-halving retry (reference: train_controller.py:429-494);
            # on TPU a smaller batch is a new static shape -> recompile once.
            skip_through = (
                resume_step_in_epoch if epoch == start_epoch else -1
            )
            while True:
                try:
                    for step_in_epoch, batch in enumerate(
                        train_ds.iter_pair_batches(
                            batch_size=batch_size,
                            num_dup=cfg.num_dup,
                            num_neg=cfg.num_neg,
                            seed=cfg.seed,
                            epoch=epoch,
                            resample=True,
                            length_buckets=length_buckets,
                        )
                    ):
                        if step_in_epoch <= skip_through:
                            continue  # already trained before the resume
                        sub = jax.random.fold_in(epoch_rng, step_in_epoch)
                        teacher = (
                            jnp.asarray(batch["teacher"])
                            if self._distill and "teacher" in batch else None
                        )
                        params, opt_state, loss_val = self._train_step(
                            params, opt_state,
                            jnp.asarray(batch["left"]),
                            jnp.asarray(batch["right"]),
                            batch["group_size"], sub, teacher,
                        )
                        # device scalar: a float() here would block one
                        # tunnel round-trip per step; the epoch's losses
                        # are flushed in ONE fetch below, still inside the
                        # try so an async OOM surfaces to the retry path
                        losses.append(loss_val)
                        step += 1
                        if checkpoint_dir and checkpoint_every_steps and (
                            step % checkpoint_every_steps == 0
                        ):
                            save_checkpoint(
                                os.path.join(checkpoint_dir, f"step_{step}"),
                                {"params": params, "opt_state": opt_state,
                                 "epoch": epoch,
                                 "step_in_epoch": step_in_epoch},
                                metadata={
                                    "model": type(self.model).__name__,
                                    "epoch": epoch,
                                    "step_in_epoch": step_in_epoch,
                                    "global_step": step,
                                    "batch_size": batch_size,
                                },
                                async_save=True,
                            )
                    if losses:
                        # one blocking fetch per epoch (not per step)
                        losses = np.asarray(jnp.stack(losses)).tolist()
                    break
                except Exception as exc:
                    msg = str(exc).lower()
                    oom = "resource_exhausted" in msg or "out of memory" in msg
                    if oom and batch_size > 1:
                        batch_size = max(1, batch_size // 2)
                        losses = []
                        if skip_through >= 0:
                            # the resume cursor counts steps AT THE BATCH
                            # SIZE THAT PRODUCED IT, and the batch plan
                            # (chunking, wrap-around padding, bucket
                            # interleave) is not a prefix-stable function
                            # of batch size — rescaling the cursor would
                            # silently skip the wrong groups. Drop it and
                            # retrain this epoch from step 0 (the same
                            # semantics the non-resumed OOM retry has).
                            logger.warning(
                                "OOM halved batch_size under a resume "
                                "cursor; restarting epoch %d from step 0 "
                                "(cursor units don't survive a batch-size "
                                "change)", epoch,
                            )
                            skip_through = -1
                        logger.warning(
                            "OOM at epoch %d; retrying with batch_size=%d",
                            epoch, batch_size,
                        )
                        continue
                    raise
            if not losses:
                if skip_through >= 0:
                    # resumed exactly at this epoch's end: nothing left to do
                    continue
                raise RuntimeError(
                    "epoch ran 0 training steps: the dataset has no pairable "
                    "queries (every query needs at least one positive and one "
                    "negative example). Refusing to continue silently."
                )
            row: Dict[str, float] = {
                "epoch": epoch,
                "loss": float(np.mean(losses)),
                "time_s": time.perf_counter() - t0,
            }
            if not np.isfinite(row["loss"]):
                # loud, like the zero-step-epoch failure above: a NaN/inf
                # loss means every parameter is already poisoned and any
                # eval metric this epoch ranks garbage
                logger.warning(
                    "epoch %d: NON-FINITE loss %s — training diverged "
                    "(check embedding init / learning rate); metrics from "
                    "this epoch are meaningless", epoch, row["loss"],
                )
            if test_ds is not None:
                row.update(self.evaluate(params, test_ds))
                key = cfg.eval_metrics[0] if cfg.eval_metrics else "map"
                cur = row.get(key, 0.0)
                prev = best.get(key, -1.0) if best else -1.0
                if cur >= prev:
                    # ties keep the LATER epoch's params but do NOT reset
                    # the patience counter (a plateau at the max should
                    # still stop early)
                    best = {m: row[m] for m in cfg.eval_metrics if m in row}
                    best_params = params
                    epochs_since_best = (
                        0 if cur > prev else epochs_since_best + 1
                    )
                else:
                    epochs_since_best += 1
            history.append(row)
            logger.info("epoch %d: %s", epoch, row)
            if checkpoint_dir and checkpoint_every and (
                (epoch + 1) % checkpoint_every == 0
            ):
                save_checkpoint(
                    os.path.join(checkpoint_dir, f"epoch_{epoch}"),
                    {"params": params, "opt_state": opt_state, "epoch": epoch},
                    metadata={"model": type(self.model).__name__,
                              "epoch": epoch, "global_step": step,
                              "batch_size": batch_size},
                    async_save=True,
                )
            # early-stop AFTER the periodic save so the stopping epoch's
            # opt_state/epoch cursor stays resumable like any other epoch
            if (cfg.keep_best and cfg.patience
                    and epochs_since_best >= cfg.patience):
                logger.info(
                    "early stop at epoch %d: no %s improvement for %d epochs",
                    epoch, cfg.eval_metrics[0] if cfg.eval_metrics else "map",
                    cfg.patience,
                )
                break
        if cfg.keep_best and test_ds is not None:
            params = best_params
        if checkpoint_dir:
            save_checkpoint(
                checkpoint_dir,
                {"params": params},
                metadata={"model": type(self.model).__name__,
                          "config": cfg.__dict__ | {"eval_metrics": list(cfg.eval_metrics)},
                          # architecture overrides (e.g. kernel_num):
                          # without these, evaluate_saved_model would
                          # rebuild the DEFAULT architecture and fail (or
                          # silently mis-evaluate) on the saved params
                          "model_kwargs": self._model_kwargs},
            )
            from ..core.checkpoint import wait_for_checkpoints

            wait_for_checkpoints()  # async epoch/step saves are durable now
        return TrainResult(params=params, history=history, best_metrics=best)
