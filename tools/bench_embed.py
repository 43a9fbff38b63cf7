"""Embedding-throughput benchmark: docs/sec for the sentence encoder.

Measures host tokenization (C++ fast path) and device forward separately,
then end-to-end SentenceEncoder.encode docs/sec. BASELINE.md records the
result ("large-batch encode, docs/sec, measured, reported").
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
    ap.add_argument("--docs", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--words", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder

    cfg = EncoderConfig(max_len=128)
    enc = SentenceEncoder(cfg, seed=0)

    rng = np.random.default_rng(0)
    vocab = [f"word{i}" for i in range(5000)]
    docs = [
        " ".join(rng.choice(vocab, size=args.words))
        for _ in range(args.docs)
    ]

    # --- tokenization throughput (host) ---
    t0 = time.perf_counter()
    ids, mask = enc.tokenizer.encode_batch(docs, max_len=cfg.max_len)
    tok_dt = time.perf_counter() - t0

    # --- device forward throughput (per bucket batch) ---
    b = args.batch
    ids_j = jnp.asarray(ids[:b])
    mask_j = jnp.asarray(mask[:b])
    out = enc._forward(enc.params, ids_j, mask_j)
    _ = float(out[0, 0])  # compile + sync
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = enc._forward(enc.params, ids_j, mask_j)
        _ = float(out[0, 0])
        times.append(time.perf_counter() - t0)
    fwd_dt = min(times)

    # --- end to end ---
    t0 = time.perf_counter()
    embs = enc.encode(docs, batch_size=args.batch)
    e2e_dt = time.perf_counter() - t0

    print(json.dumps({
        "tokenize_docs_per_s": round(args.docs / tok_dt, 1),
        "forward_docs_per_s": round(b / fwd_dt, 1),
        "e2e_docs_per_s": round(args.docs / e2e_dt, 1),
        "docs": args.docs,
        "batch": args.batch,
        "max_len": cfg.max_len,
        "backend": jax.default_backend(),
        "emb_shape": list(embs.shape),
    }))


if __name__ == "__main__":
    main()
