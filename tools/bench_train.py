"""Reranker training-throughput benchmark: train steps/s on device.

Steps chain naturally through the params, so timing N dispatches + one final
fetch measures true device throughput (no per-step tunnel round-trip).
"""
from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np


def bench_bucketed_epoch(args) -> None:
    """Measure the length-bucketing uplift: one epoch over a corpus with a
    REALISTIC right-length mix (most chunks far below the preset max),
    unbucketed vs bucketed (train/pairs.py ``length_buckets``). Same groups,
    same pairs — only the padding width per batch changes."""
    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.train.pairs import PairDataset
    from semanticsearch_tpu.train.presets import get_preset
    from semanticsearch_tpu.train.trainer import RerankTrainer

    cfg, kwargs = get_preset(args.model)
    trainer = RerankTrainer(args.model, vocab_size=args.vocab, cfg=cfg,
                            model_kwargs=kwargs)
    rng = np.random.default_rng(0)
    n_queries, per_q = args.queries, 8
    n = n_queries * per_q
    L, R = cfg.fixed_length_left, cfg.fixed_length_right
    # reference-corpus-like skew (BASELINE.md: words/doc median 256 vs mean
    # 1009): lognormal lengths clipped to the preset max — most rows short
    rlen = np.clip(rng.lognormal(np.log(R / 4), 0.7, size=n).astype(int),
                   4, R)
    right = np.zeros((n, R), np.int32)
    for i, ln in enumerate(rlen):
        right[i, :ln] = rng.integers(2, args.vocab, size=ln)
    left = rng.integers(2, args.vocab, size=(n, L)).astype(np.int32)
    left[:, L // 2:] = 0
    labels = np.tile([1.0] + [0.0] * (per_q - 1), n_queries)
    qids = np.repeat(np.arange(n_queries), per_q)
    ds = PairDataset(left=left, right=right, labels=labels, query_ids=qids)

    buckets = tuple(int(b) for b in args.buckets.split(",")) if args.buckets \
        else (R // 4, R // 2)
    results = {}
    for name, lb in (("unbucketed", ()), ("bucketed", buckets)):
        params = trainer.init_params(ds)
        opt_state = trainer.tx.init(params)
        key = jax.random.PRNGKey(1)
        # warmup epoch compiles every bucket signature
        for _pass in ("warmup", "timed"):
            t0 = time.perf_counter()
            steps = 0
            for batch in ds.iter_pair_batches(
                cfg.batch_size, num_dup=cfg.num_dup, num_neg=cfg.num_neg,
                seed=cfg.seed, epoch=0, length_buckets=lb,
            ):
                params, opt_state, loss = trainer._train_step(
                    params, opt_state, jnp.asarray(batch["left"]),
                    jnp.asarray(batch["right"]), batch["group_size"], key)
                steps += 1
            _ = float(loss)
            dt = time.perf_counter() - t0
        results[name] = {"epoch_s": round(dt, 3),
                         "steps_per_s": round(steps / dt, 2),
                         "steps": steps, "final_loss": float(loss)}
    import jax as _jax

    results["speedup"] = round(
        results["unbucketed"]["epoch_s"] / results["bucketed"]["epoch_s"], 3)
    results["model"] = args.model
    results["buckets"] = list(buckets)
    results["backend"] = _jax.default_backend()
    print(json.dumps(results))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="knrm")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=30000)
    ap.add_argument("--bucket-bench", action="store_true",
                    help="epoch-level unbucketed-vs-bucketed comparison")
    ap.add_argument("--buckets", default="",
                    help="comma right-length buckets (default R/4,R/2)")
    ap.add_argument("--queries", type=int, default=256,
                    help="bucket-bench synthetic query count")
    args = ap.parse_args()

    if args.bucket_bench:
        bench_bucketed_epoch(args)
        return

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.train.presets import get_preset
    from semanticsearch_tpu.train.trainer import RerankTrainer

    cfg, kwargs = get_preset(args.model)
    trainer = RerankTrainer(args.model, vocab_size=args.vocab, cfg=cfg,
                            model_kwargs=kwargs)

    rng = np.random.default_rng(0)
    group = 1 + cfg.num_neg
    rows = cfg.batch_size * group
    left = jnp.asarray(
        rng.integers(2, args.vocab, size=(rows, cfg.fixed_length_left)),
        jnp.int32)
    right = jnp.asarray(
        rng.integers(2, args.vocab, size=(rows, cfg.fixed_length_right)),
        jnp.int32)

    params = trainer.model.init(jax.random.PRNGKey(0), left[:2], right[:2])["params"]
    opt_state = trainer.tx.init(params)
    key = jax.random.PRNGKey(1)

    # compile + warmup
    params, opt_state, loss = trainer._train_step(
        params, opt_state, left, right, group, key)
    _ = float(loss)

    t0 = time.perf_counter()
    for s in range(args.steps):
        params, opt_state, loss = trainer._train_step(
            params, opt_state, left, right, group, key)
    _ = float(loss)
    dt = time.perf_counter() - t0

    print(json.dumps({
        "model": args.model,
        "steps_per_s": round(args.steps / dt, 2),
        "pairs_per_s": round(args.steps * cfg.batch_size / dt, 1),
        "batch_size": cfg.batch_size,
        "group_size": group,
        "loss": float(loss),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
