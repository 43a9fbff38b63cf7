"""Cross-encoder reranker: full query-document attention in one transformer.

The reference SHIPS a cross-encoder scorer but never executes it: dead code
at ``Method/Semantic_Splitter_Optimized.py:14-61`` loads a HuggingFace
cross-encoder for pair scoring, gated behind config params the controller
silently drops (``simple_chunk_controller.py:1524-1530`` -> ``**_legacy_kwargs``,
SURVEY §7 defect 2). Its seven production rerankers are all interaction
models over frozen per-token embeddings — none lets the query attend into
the document. This module builds the real thing, TPU-first:

- ``[CLS] + query + document`` packed into ONE static-shape sequence (the
  PairDataset's fixed (left, right) lengths keep every batch a single jit
  signature; length buckets shrink the packed width for short pairs).
- The SAME ``TransformerBlock`` stack as the sentence encoder
  (``models/encoder.py``) — bf16-able matmuls on the MXU, pre-LN residual
  blocks — so a TRAINED encoder checkpoint warm-starts every layer
  (:func:`transfer_from_encoder`). That is the zero-egress analog of
  initializing a cross-encoder from a pretrained LM, which is how
  production cross-encoders (monoBERT-style) are always trained; training
  one from scratch on rank labels alone underfits exactly like the
  from-scratch rerankers in BASELINE.md's capstone table.
- Score = Dense head over the CLS state; segment embeddings distinguish
  query from document tokens.

Registered as ``cross_encoder`` in the reranker registry: the trainer,
evaluator, serve-time RerankService, and the quality harness all accept it
wherever the seven parity models go.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..encoder import TransformerBlock
from .base import pad_mask, register_model


@register_model("cross_encoder")
class CrossEncoder(nn.Module):
    """(left_ids, right_ids) -> (B,) relevance scores via joint attention.

    ``embed_dim`` doubles as the transformer hidden size. Defaults mirror
    the in-repo sentence encoder's production config shape (layers/heads/
    mlp ratio) so :func:`transfer_from_encoder` is a plain tree copy.
    """

    vocab_size: int
    embed_dim: int = 128
    num_layers: int = 2
    num_heads: int = 4
    mlp_dim: int = 256
    dropout_rate: float = 0.1
    max_positions: int = 512
    dtype: str = "float32"

    # packed width varies with the (left, right) bucket lengths only — the
    # position table covers max_positions, so shorter buckets just slice it
    length_bucketable = True

    @nn.compact
    def __call__(self, left_ids, right_ids, deterministic: bool = True):
        dtype = jnp.dtype(self.dtype)
        b = left_ids.shape[0]
        lm, rm = pad_mask(left_ids), pad_mask(right_ids)
        ids = jnp.concatenate([left_ids, right_ids], axis=1)
        seg = jnp.concatenate(
            [jnp.zeros_like(left_ids), jnp.ones_like(right_ids)], axis=1
        )
        # "embedding" is the registry-wide name for the token table
        # (train/embeddings.py::apply_embedding_init keys on it)
        x = nn.Embed(self.vocab_size, self.embed_dim, dtype=dtype,
                     name="embedding")(ids)
        # segment embeddings start near zero so a warm-started stack sees
        # (almost) the token geometry the encoder was trained on
        x = x + nn.Embed(2, self.embed_dim, dtype=dtype,
                         embedding_init=nn.initializers.normal(0.02),
                         name="seg_embed")(seg)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.embed_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, self.embed_dim)), x],
            axis=1,
        )
        t = x.shape[1]
        if t > self.max_positions:
            raise ValueError(
                f"packed sequence {t} > max_positions {self.max_positions}"
            )
        pos = jnp.arange(t)[None, :]
        x = x + nn.Embed(self.max_positions, self.embed_dim, dtype=dtype,
                         name="pos_embed")(pos)
        x = nn.LayerNorm(dtype=dtype)(x)  # LayerNorm_0, as in the encoder
        mask = jnp.concatenate(
            [jnp.ones((b, 1), lm.dtype), lm, rm], axis=1
        )
        for i in range(self.num_layers):
            x = TransformerBlock(
                hidden_dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout_rate=self.dropout_rate,
                dtype=dtype,
                name=f"layer_{i}",
            )(x, mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dtype)(x)  # LayerNorm_1, as in the encoder
        h = x[:, 0].astype(jnp.float32)
        h = nn.tanh(nn.Dense(self.embed_dim, name="pool_dense")(h))
        return nn.Dense(1, name="score")(h)[..., 0]


def transfer_from_encoder(params: Dict[str, Any],
                          encoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Warm-start a CrossEncoder parameter tree from a trained sentence
    encoder's (``models/encoder.py::SentenceTransformerModel``).

    Copies the token table, both LayerNorms, and every transformer block the
    two stacks share; encoder position rows land at packed positions 1..N
    (position 0 is the CLS slot, which the encoder never had). The CLS
    vector, segment table, and scoring head keep their fresh init — they
    have no encoder analog. Shape mismatches raise: a silently partial
    transfer would train, converge worse, and point the blame at the idea
    instead of the wiring.

    This is the zero-egress analog of initializing a monoBERT-style
    cross-encoder from a pretrained checkpoint; the reference's pretrained
    leverage arrives the same way (hub weights,
    ``Tool/Sentence_Embedding.py:75-150``).
    """
    import jax
    import numpy as np

    out = dict(params)
    enc_table = np.asarray(encoder_params["token_embed"]["embedding"])
    my_table = np.asarray(params["embedding"]["embedding"])
    if enc_table.shape != my_table.shape:
        raise ValueError(
            f"encoder token table {enc_table.shape} != cross-encoder "
            f"{my_table.shape} — vocab or hidden size mismatch"
        )
    out["embedding"] = {"embedding": jnp.asarray(enc_table)}

    for ln in ("LayerNorm_0", "LayerNorm_1"):
        if ln not in encoder_params or ln not in params:
            raise ValueError(f"missing {ln} in one of the trees")
        out[ln] = encoder_params[ln]

    n_layers = 0
    while f"layer_{n_layers}" in params:
        n_layers += 1
    for i in range(n_layers):
        key = f"layer_{i}"
        if key not in encoder_params:
            raise ValueError(
                f"cross-encoder has {n_layers} layers but the encoder "
                f"checkpoint stops before {key} — match num_layers to the "
                "encoder's"
            )
        enc_leaves = jax.tree.leaves(encoder_params[key])
        my_leaves = jax.tree.leaves(params[key])
        if [x.shape for x in enc_leaves] != [x.shape for x in my_leaves]:
            raise ValueError(
                f"{key}: encoder block shapes do not match the "
                "cross-encoder's (heads/mlp_dim/hidden mismatch)"
            )
        out[key] = encoder_params[key]

    enc_pos = np.asarray(encoder_params["pos_embed"]["embedding"])
    my_pos = np.array(params["pos_embed"]["embedding"], copy=True)
    if enc_pos.shape[1] != my_pos.shape[1]:
        raise ValueError("pos_embed width mismatch")
    n = min(enc_pos.shape[0], my_pos.shape[0] - 1)
    my_pos[1: 1 + n] = enc_pos[:n]
    out["pos_embed"] = {"embedding": jnp.asarray(my_pos)}
    return out
