"""Flax transformer sentence encoder — the TPU replacement for
sentence-transformers (reference: ``Tool/Sentence_Embedding.py:75-150``,
``Method/semantic_common.py:84-141``).

Design notes (TPU-first):
- bfloat16 activations / f32 params; all matmuls land on the MXU.
- Static shapes: inputs are padded to a fixed ``max_len`` per bucket; the
  wrapper buckets texts by length (64/128/256) to avoid wasting FLOPs on
  short sentences without introducing dynamic shapes.
- Mean pooling over the attention mask + L2 normalization, matching the
  sentence-transformers contract the reference relies on (unit vectors so
  dot == cosine, ``Semantic_Splitter_Optimized.py:140-152``).
- Batch-sharded over the mesh ``data`` axis with `jax.jit` + sharding
  constraints; one process feeds all devices (vs the reference's
  one-model-per-worker-process, ``simple_chunk_controller.py:462-500``).
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig
from .tokenizer import HashingTokenizer, load_tokenizer


def _make_flash_attention_fn(interpret: bool):
    """Adapter: flax's attention_fn contract -> the Pallas flash kernel.

    flax hands (B, T, H, Dh) tensors and a broadcastable boolean mask; the
    encoder's mask is key-padding only, so its (B, 1, 1, T) form reduces to
    the (B, T) key mask the kernel wants. Same parameter tree as the stock
    path (the hook only swaps the attention math), so checkpoints are
    portable between implementations.
    """
    from ..ops.flash_attention import flash_attention

    def attention_fn(query, key, value, bias=None, mask=None, **_kw):
        kmask = (
            mask.reshape(mask.shape[0], -1, mask.shape[-1])[:, 0, :]
            if mask is not None
            else jnp.ones((key.shape[0], key.shape[1]), jnp.float32)
        )
        q = jnp.transpose(query, (0, 2, 1, 3))
        k = jnp.transpose(key, (0, 2, 1, 3))
        v = jnp.transpose(value, (0, 2, 1, 3))
        out = flash_attention(q, k, v, kmask.astype(jnp.float32),
                              interpret=interpret)
        return jnp.transpose(out, (0, 2, 1, 3)).astype(query.dtype)

    return attention_fn


class TransformerBlock(nn.Module):
    hidden_dim: int
    num_heads: int
    mlp_dim: int
    dropout_rate: float
    dtype: jnp.dtype
    use_flash: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # Pre-LN attention
        h = nn.LayerNorm(dtype=self.dtype)(x)
        attn_mask = mask[:, None, None, :].astype(bool)
        attn_kwargs = {}
        if self.use_flash:
            attn_kwargs["attention_fn"] = _make_flash_attention_fn(
                interpret=jax.default_backend() != "tpu"
            )
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout_rate,
            deterministic=deterministic,
            **attn_kwargs,
        )(h, h, mask=attn_mask)
        x = x + h
        # Pre-LN MLP
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype)(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=deterministic)(h)
        return x + h


class SentenceTransformerModel(nn.Module):
    """Token+position embed -> N transformer blocks -> masked mean pool -> L2.

    ``return_tokens=True`` skips the pooling head and returns the final
    (B, T, H) token states in f32 — the MLM pretraining objective
    (``train/mlm_pretrain.py``) decodes these against the tied token
    embedding, so the parameter tree is identical either way and
    checkpoints stay portable between pretraining and encoding."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, ids, mask, deterministic: bool = True,
                 return_tokens: bool = False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        x = nn.Embed(c.vocab_size, c.hidden_dim, dtype=dtype,
                     name="token_embed")(ids)
        pos = jnp.arange(ids.shape[1])[None, :]
        x = x + nn.Embed(c.max_len, c.hidden_dim, dtype=dtype,
                         name="pos_embed")(pos)
        x = nn.LayerNorm(dtype=dtype)(x)
        attention = getattr(c, "attention", "auto")
        # "auto" engages the Pallas flash kernel only for long sequences:
        # at max_len 128 the stock XLA attention measured FASTER (17.6k vs
        # 10.1k docs/s device-forward on v5e — Dh=32 underutilizes the MXU
        # in the kernel); flash wins only where the O(T^2) attention matrix
        # starts to dominate. Force with attention="flash".
        use_flash = attention == "flash" or (
            attention == "auto"
            and jax.default_backend() == "tpu"
            and c.dropout_rate == 0.0
            and c.max_len >= 1024
        )
        for i in range(c.num_layers):
            x = TransformerBlock(
                hidden_dim=c.hidden_dim,
                num_heads=c.num_heads,
                mlp_dim=c.mlp_dim,
                dropout_rate=c.dropout_rate,
                dtype=dtype,
                use_flash=use_flash,
                name=f"layer_{i}",
            )(x, mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=dtype)(x)

        if return_tokens:
            return x.astype(jnp.float32)
        if c.pooling == "cls":
            pooled = x[:, 0, :]
        else:
            m = mask[..., None].astype(x.dtype)
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0
            )
        pooled = pooled.astype(jnp.float32)
        if c.normalize:
            # rsqrt of the clamped SQUARED norm: linalg.norm has a NaN
            # gradient at an exactly-zero vector and maximum() does not
            # block it (see ops/matching.py::cosine_match_matrix)
            sq = jnp.sum(pooled * pooled, axis=-1, keepdims=True)
            pooled = pooled * jax.lax.rsqrt(jnp.maximum(sq, 1e-18))
        return pooled


# Module-level encoder cache, mirroring the reference's per-process model
# singleton (`Tool/Sentence_Embedding.py:32` ``loaded_models``).
_ENCODER_CACHE: dict = {}

_BUCKETS = (64, 128, 256)


class SentenceEncoder:
    """Batched sentence encoding service on the device mesh.

    encode(texts) pads each text into the smallest length bucket, runs the
    jitted forward per bucket with batch sharding over the ``data`` axis, and
    reassembles results in input order.
    """

    def __init__(
        self,
        cfg: EncoderConfig = EncoderConfig(),
        mesh: Optional[Mesh] = None,
        seed: int = 0,
        tokenizer=None,
        params=None,
    ) -> None:
        from ..parallel.tensor import mesh_tp_size, tp_compatible

        self.cfg = cfg
        self.mesh = mesh
        self.tokenizer = tokenizer or HashingTokenizer(
            vocab_size=cfg.vocab_size, max_len=cfg.max_len
        )
        self._tp = mesh_tp_size(mesh) if (
            mesh is not None and tp_compatible(cfg, mesh_tp_size(mesh))
        ) else 1
        if self._tp > 1:
            # Tensor-parallel runs use stock XLA attention: the Pallas flash
            # kernel is not SPMD-partitionable over the sharded head axis,
            # and TP targets exactly the large-model regime where per-head
            # width stays MXU-friendly anyway (parallel/tensor.py).
            import dataclasses

            self.model = SentenceTransformerModel(
                dataclasses.replace(cfg, attention="stock")
            )
        else:
            self.model = SentenceTransformerModel(cfg)
        if params is None:
            # Initialize on the HOST CPU: parameter init is dominated by
            # large threefry RNG kernels (the embedding table alone is
            # vocab_size x hidden_dim), which execute pathologically slowly
            # through remote-device links (~minutes per encoder). The
            # one-time device_put of the finished params is cheap.
            # Init uses a STOCK-attention twin of the model: the flash
            # attention_fn hook does not change the parameter tree (tested),
            # and the Pallas kernel cannot execute compiled on the CPU
            # device this init is pinned to.
            import dataclasses

            init_model = SentenceTransformerModel(
                dataclasses.replace(cfg, attention="stock")
            )
            rng = jax.random.PRNGKey(seed)
            dummy_ids = jnp.zeros((1, cfg.max_len), jnp.int32)
            dummy_mask = jnp.ones((1, cfg.max_len), jnp.int32)
            with jax.default_device(jax.devices("cpu")[0]):
                params = jax.tree.map(
                    np.asarray,
                    init_model.init(rng, dummy_ids, dummy_mask)["params"],
                )
        if mesh is not None and self._tp > 1:
            # Megatron-style parameter layout over the ``model`` axis; the
            # SPMD partitioner derives all activation shardings + collectives
            # from it (parallel/tensor.py)
            from ..parallel.tensor import shard_encoder_params

            params = shard_encoder_params(params, mesh, cfg)
        elif mesh is not None:
            params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            # pin to the default device ONCE — host-resident params would
            # re-upload the whole tree on every forward call
            params = jax.device_put(params)
        self.params = params

        def _forward_body(params, ids, mask):
            if self.mesh is not None:
                ids = jax.lax.with_sharding_constraint(
                    ids, NamedSharding(self.mesh, P("data", None))
                )
                mask = jax.lax.with_sharding_constraint(
                    mask, NamedSharding(self.mesh, P("data", None))
                )
            return self.model.apply({"params": params}, ids, mask)

        self._forward = jax.jit(_forward_body)
        # packed (2, B, L) int32 [ids; mask] variant: each host->device
        # transfer is a blocking round trip through a remote device link,
        # so the encode loop ships ONE array per batch instead of two
        self._forward_packed = jax.jit(
            lambda params, packed: _forward_body(
                params, packed[0], packed[1]))

    def _bucket_for(self, n_tokens: int) -> int:
        for b in _BUCKETS:
            if n_tokens <= b and b <= self.cfg.max_len:
                return b
        return self.cfg.max_len

    def encode(
        self, texts: Sequence[str], batch_size: int = 256
    ) -> np.ndarray:
        """Encode texts to (N, hidden_dim) f32 unit vectors, in input order."""
        if not len(texts):
            return np.zeros((0, self.cfg.hidden_dim), np.float32)
        ids_full, mask_full = self.tokenizer.encode_batch(
            texts, max_len=self.cfg.max_len
        )
        lengths = mask_full.sum(axis=1)
        out = np.zeros((len(texts), self.cfg.hidden_dim), np.float32)

        # Group indices by bucket to keep shapes static per jit cache entry.
        buckets: dict = {}
        for i, ln in enumerate(lengths):
            buckets.setdefault(self._bucket_for(int(ln)), []).append(i)

        n_dev = self.mesh.shape["data"] if self.mesh is not None else 1
        # Double-buffered dispatch: the device computes batch i while the
        # host converts batch i-1's result (JAX dispatch is async; only the
        # np.asarray fetch blocks). Round 1 fetched synchronously per batch,
        # leaving the device idle during every host<->device transfer —
        # 12x below device-forward rate through a remote link (BASELINE.md).
        pending: Optional[tuple] = None  # (device_emb, sel, b, start_offset)

        def _drain():
            nonlocal pending
            if pending is not None:
                emb_dev, p_sel, p_b, _ = pending
                out[p_sel] = np.asarray(emb_dev[:p_b])
                pending = None

        for L, idxs in buckets.items():
            eff_batch = batch_size
            s = 0
            # loop continues until the last in-flight batch is FETCHED too:
            # with async dispatch, a device OOM surfaces at the blocking
            # fetch, which must also hit the batch-halving retry below
            while s < len(idxs) or pending is not None:
                if s >= len(idxs):
                    try:
                        _drain()
                    except Exception as exc:
                        msg = str(exc).lower()
                        if ("resource_exhausted" in msg
                                or "out of memory" in msg) and eff_batch > n_dev:
                            s = pending[3]
                            pending = None
                            eff_batch = max(n_dev, eff_batch // 2)
                            continue
                        raise
                    continue
                sel = idxs[s: s + eff_batch]
                b = len(sel)
                # pad the batch so it divides the data axis; ids+mask ship
                # as ONE packed (2, b, L) upload (see _forward_packed)
                b_pad = -(-b // n_dev) * n_dev
                packed = np.zeros((2, b_pad, L), np.int32)
                packed[0, :b] = ids_full[sel, :L]
                packed[1, :b] = mask_full[sel, :L]
                try:
                    emb = self._forward_packed(
                        self.params, jnp.asarray(packed)
                    )
                    _drain()  # fetch the PREVIOUS batch while this one runs
                    pending = (emb, sel, b, s)
                except Exception as exc:  # OOM sub-batch halving, like the
                    # reference's embed retry (semantic_common.py:116-129).
                    # Match only genuine OOM signatures; anything else (e.g.
                    # compiler diagnostics that merely mention memory) must
                    # surface immediately.
                    msg = str(exc).lower()
                    if ("resource_exhausted" in msg or "out of memory" in msg
                            ) and eff_batch > n_dev:
                        if pending is not None:
                            # the in-flight previous batch may be the one
                            # that failed on-device; recompute it too
                            s = pending[3]
                            pending = None
                        eff_batch = max(n_dev, eff_batch // 2)
                        continue
                    raise
                s += b
        return out

    def encode_device(self, texts: Sequence[str], batch_size: int = 256):
        """Encode to a DEVICE-RESIDENT (N, hidden_dim) f32 array, in input
        order, with NO host fetch.

        The serve path feeds these embeddings straight into the dense
        top-k kernel — ``encode()`` would download them to the host only
        for ``index.search`` to upload them again (two transfers + two
        round-trips per batch through a remote link). Buckets/chunks are
        reassembled with one on-device gather. No OOM-halving retry here
        (serve batches are fixed-size); callers needing the retry ladder
        use :meth:`encode`.
        """
        if not len(texts):
            return jnp.zeros((0, self.cfg.hidden_dim), jnp.float32)
        ids_full, mask_full = self.tokenizer.encode_batch(
            texts, max_len=self.cfg.max_len
        )
        lengths = mask_full.sum(axis=1)
        buckets: dict = {}
        for i, ln in enumerate(lengths):
            buckets.setdefault(self._bucket_for(int(ln)), []).append(i)
        n_dev = self.mesh.shape["data"] if self.mesh is not None else 1
        order_parts = []
        emb_parts = []
        for L, idxs in buckets.items():
            for s in range(0, len(idxs), batch_size):
                sel = idxs[s: s + batch_size]
                b = len(sel)
                b_pad = -(-b // n_dev) * n_dev
                packed = np.zeros((2, b_pad, L), np.int32)
                packed[0, :b] = ids_full[sel, :L]
                packed[1, :b] = mask_full[sel, :L]
                emb = self._forward_packed(self.params, jnp.asarray(packed))
                order_parts.append(np.asarray(sel, np.int64))
                emb_parts.append(emb[:b])
        order = np.concatenate(order_parts)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.size)
        embs = emb_parts[0] if len(emb_parts) == 1 else jnp.concatenate(
            emb_parts, axis=0)
        if np.array_equal(inv, np.arange(order.size)):
            return embs  # single bucket, sequential chunks: already ordered
        return jnp.take(embs, jnp.asarray(inv), axis=0)


def get_encoder(
    cfg: EncoderConfig = EncoderConfig(),
    mesh: Optional[Mesh] = None,
    seed: int = 0,
) -> SentenceEncoder:
    """Cached encoder lookup (one instance per config), like the reference's
    ``loaded_models`` cache."""
    # key on the Mesh OBJECT, not id(mesh): a garbage-collected mesh whose
    # address CPython reuses for a new Mesh would alias the cache entry and
    # hand back an encoder sharded over the dead mesh. Holding the mesh in
    # the key pins it alive for the cache's (process) lifetime — the right
    # trade for a handful of long-lived meshes. jax Mesh is hashable.
    key = (cfg, mesh, seed)
    if key not in _ENCODER_CACHE:
        _ENCODER_CACHE[key] = SentenceEncoder(cfg, mesh=mesh, seed=seed)
    return _ENCODER_CACHE[key]
