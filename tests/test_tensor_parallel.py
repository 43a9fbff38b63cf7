"""Tensor-parallel encoder: parameter layout, numerical parity, training.

Runs on the 8-virtual-device CPU platform (conftest.py) with a 2x4
(data x model) mesh — the SPMD-partitioner path is identical on real TPUs.
"""
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from semanticsearch_tpu.core.config import EncoderConfig
from semanticsearch_tpu.core.mesh import MeshSpec, make_mesh
from semanticsearch_tpu.models.encoder import SentenceEncoder

CFG = EncoderConfig(
    vocab_size=512, hidden_dim=64, num_layers=2, num_heads=4,
    mlp_dim=128, max_len=32, dtype="float32",
)
TEXTS = [f"alpha beta gamma delta token {i} epsilon" for i in range(8)]


@pytest.fixture(scope="module")
def tp_mesh():
    return make_mesh(MeshSpec(data=2, model=4))


def test_tp_params_are_sharded(tp_mesh):
    enc = SentenceEncoder(CFG, mesh=tp_mesh, seed=0)
    attn = enc.params["layer_0"]["MultiHeadDotProductAttention_0"]
    # Q/K/V: heads axis sharded 4-ways
    assert attn["query"]["kernel"].sharding.spec == P(None, "model", None)
    assert attn["query"]["kernel"].addressable_shards[0].data.shape == \
        (64, 1, 16)
    # out projection: contracting (head) axis sharded
    assert attn["out"]["kernel"].sharding.spec == P("model", None, None)
    # MLP up/down: column- then row-sharded
    up = enc.params["layer_0"]["Dense_0"]["kernel"]
    down = enc.params["layer_0"]["Dense_1"]["kernel"]
    assert up.sharding.spec == P(None, "model")
    assert up.addressable_shards[0].data.shape == (64, 32)
    assert down.sharding.spec == P("model", None)
    # embeddings replicated
    assert enc.params["token_embed"]["embedding"].sharding.spec == P()


def test_tp_encode_matches_single_device(tp_mesh):
    ref = SentenceEncoder(CFG, seed=0).encode(TEXTS)
    tp = SentenceEncoder(CFG, mesh=tp_mesh, seed=0).encode(TEXTS)
    assert ref.shape == tp.shape == (8, 64)
    np.testing.assert_allclose(ref, tp, atol=2e-5)


def test_tp_indivisible_config_falls_back_to_replication(tp_mesh):
    cfg = EncoderConfig(vocab_size=128, hidden_dim=48, num_layers=1,
                        num_heads=3, mlp_dim=96, max_len=16, dtype="float32")
    enc = SentenceEncoder(cfg, mesh=tp_mesh, seed=0)
    k = enc.params["layer_0"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P()  # replicated, not raggedly sharded
    out = enc.encode(TEXTS[:4])
    assert np.isfinite(out).all()


def test_tp_contrastive_training_step(tp_mesh):
    from semanticsearch_tpu.train.encoder_train import (
        ContrastiveConfig,
        ContrastiveEncoderTrainer,
    )

    # 3 epochs x 1 step: the first step burns the LR warmup (lr=0), so the
    # first possible loss drop is epoch 2 vs epoch 0
    ccfg = ContrastiveConfig(epochs=3, batch_size=8, max_len_query=16,
                             max_len_chunk=32, use_hard_negatives=False,
                             seed=0)
    pairs = [(f"query number {i}", f"chunk body text {i} {i}")
             for i in range(8)]

    enc_tp = SentenceEncoder(CFG, mesh=tp_mesh, seed=0)
    hist_tp = ContrastiveEncoderTrainer(enc_tp, ccfg).fit(list(pairs))
    assert np.isfinite(hist_tp[0]["loss"])
    assert hist_tp[2]["loss"] < hist_tp[0]["loss"]
    # updated params keep the TP layout (no silent gather-to-replicated)
    assert enc_tp.params["layer_0"]["Dense_0"]["kernel"].sharding.spec == \
        P(None, "model")

    # TP training is bit-compatible with single-device training: identical
    # seeds/batches must give the same loss trajectory (float tolerance)
    enc_1 = SentenceEncoder(CFG, seed=0)
    hist_1 = ContrastiveEncoderTrainer(enc_1, ccfg).fit(list(pairs))
    np.testing.assert_allclose(
        [h["loss"] for h in hist_tp], [h["loss"] for h in hist_1], atol=1e-4
    )
