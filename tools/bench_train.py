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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="knrm")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--vocab", type=int, default=30000)
    args = ap.parse_args()

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
