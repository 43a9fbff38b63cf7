"""Stage-by-stage timing diagnostic for the TPU tunnel.

Times each phase of the bench separately to find where wall-clock goes:
corpus gen (per slab), concatenate, kernel compile, kernel exec, ref exec.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_compile_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:8.2f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.ops.topk import topk_scores_pallas

    rows, dim = 2_000_000, 384
    slab = 1_000_000

    @jax.jit
    def make_slab(key):
        x = jax.random.normal(key, (slab, dim), jnp.float32)
        return (x / jnp.linalg.norm(x, axis=1, keepdims=True)).astype(jnp.bfloat16)

    keys = jax.random.split(jax.random.PRNGKey(0), rows // slab)
    s0 = t("slab 0 (compile+exec+sync)", lambda: jax.block_until_ready(make_slab(keys[0])))
    _ = t("slab 0 scalar fetch", lambda: float(s0[0, 0]))
    s1 = t("slab 1 (exec)", lambda: make_slab(keys[1]))
    _ = t("slab 1 scalar fetch", lambda: float(s1[0, 0]))
    corpus = t("concatenate", lambda: jnp.concatenate([s0, s1], axis=0))
    _ = t("concat scalar fetch", lambda: float(corpus[0, 0]))

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((256, dim)), jnp.bfloat16)

    v, i = t("pallas kernel compile+exec", lambda: topk_scores_pallas(
        q, corpus, k=10, block_q=256, block_n=8192))
    _ = t("kernel scalar fetch", lambda: float(v[0, 0]))

    def run_once():
        vv, ii = topk_scores_pallas(q, corpus, k=10, block_q=256, block_n=8192)
        return float(vv[0, 0])

    for n in range(3):
        t(f"kernel exec+fetch #{n}", run_once)

    @jax.jit
    def direct_ref(qs):
        scores = jnp.einsum("qd,nd->qn", qs, corpus,
                            preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, 10)[1]

    r = t("direct ref compile+exec", lambda: direct_ref(q[:64]))
    _ = t("direct ref fetch", lambda: np.asarray(r).sum())


if __name__ == "__main__":
    main()
