"""Metrics correctness, preprocessor, pair sampling, and a learnability smoke
test per reranker on a tiny synthetic task."""
import numpy as np
import pytest

from semanticsearch_tpu.core.config import TrainConfig
from semanticsearch_tpu.train.metrics import (
    average_precision,
    dcg_at_k,
    evaluate_ranking,
    ndcg_at_k,
    precision_at_k,
    reciprocal_rank,
)
from semanticsearch_tpu.train.pairs import PairDataset
from semanticsearch_tpu.train.trainer import (
    RerankTrainer,
    rank_hinge_loss,
    rank_xent_loss,
)
from semanticsearch_tpu.train.vocab import Preprocessor


# ----------------------------------------------------------------- metrics

def test_metrics_hand_computed():
    y_true = [1, 0, 0, 1]
    y_score = [0.9, 0.8, 0.3, 0.5]  # ranking: d0(1), d1(0), d3(1), d2(0)
    assert average_precision(y_true, y_score) == pytest.approx((1.0 + 2 / 3) / 2)
    assert reciprocal_rank(y_true, y_score) == 1.0
    assert precision_at_k(y_true, y_score, 2) == 0.5
    # MatchZoo's DiscountedCumulativeGain: natural-log discount, gain gated
    # on label > 0. DCG@2 = (2^1-1)/ln(2) + 0 = 1/ln 2.
    assert dcg_at_k(y_true, y_score, 2) == pytest.approx(1.0 / np.log(2))
    # ideal ranking @2 = both positives: 1/ln2 + 1/ln3; actual = 1/ln2
    assert ndcg_at_k(y_true, y_score, 2) == pytest.approx(
        (1 / np.log(2)) / (1 / np.log(2) + 1 / np.log(3))
    )


def test_dcg_negative_labels_gated():
    # MatchZoo only adds gain when label > threshold: a negative label must
    # contribute 0, not a negative gain.
    assert dcg_at_k([-2.0, 1.0], [0.9, 0.1], 2) == pytest.approx(
        (2.0 ** 1 - 1) / np.log(3)
    )


def test_evaluate_ranking_groups_by_query():
    out = evaluate_ranking(
        query_ids=["a", "a", "b", "b"],
        y_true=[1, 0, 0, 1],
        y_score=[0.9, 0.1, 0.9, 0.1],
        metrics=("map", "p@1"),
    )
    assert out["map"] == pytest.approx((1.0 + 0.5) / 2)
    assert out["p@1"] == pytest.approx(0.5)


# ------------------------------------------------------------- preprocessor

def test_preprocessor_vocab_and_shapes(tmp_path):
    texts = ["common words appear here"] * 5 + ["rare token xyzzy"]
    pp = Preprocessor(fixed_length_left=4, fixed_length_right=6,
                      filter_low_freq=2).fit(texts)
    assert "common" in pp.vocab and "xyzzy" not in pp.vocab
    out = pp.transform_pair(["common words"], ["xyzzy appear"])
    assert out["left"].shape == (1, 4) and out["right"].shape == (1, 6)
    assert out["right"][0, 0] == 1  # UNK for filtered token
    p = tmp_path / "pp.json"
    pp.save(str(p))
    pp2 = Preprocessor.load(str(p))
    assert pp2.vocab == pp.vocab


# ------------------------------------------------------------ pair sampling

def _toy_dataset(n_queries=6, per_q=6, seed=0):
    rng = np.random.default_rng(seed)
    rows_left, rows_right, labels, qids = [], [], [], []
    for q in range(n_queries):
        for d in range(per_q):
            rows_left.append(rng.integers(2, 50, size=4))
            rows_right.append(rng.integers(2, 50, size=8))
            labels.append(1.0 if d < 2 else 0.0)
            qids.append(f"q{q}")
    return PairDataset(
        left=np.asarray(rows_left, np.int32),
        right=np.asarray(rows_right, np.int32),
        labels=np.asarray(labels, np.float32),
        query_ids=np.asarray(qids),
    )


def test_pair_batches_structure():
    ds = _toy_dataset()
    batches = list(ds.iter_pair_batches(batch_size=4, num_dup=2, num_neg=3))
    assert batches
    b = batches[0]
    assert b["left"].shape[0] == 4 * 4  # batch * (1 + num_neg)
    labs = b["labels"].reshape(-1, 4)
    assert (labs[:, 0] > 0).all()       # positive first in every group
    assert (labs[:, 1:] <= 0).all()


def test_pair_trailing_batch_flushed():
    """The final partial batch must be padded and yielded, not dropped —
    otherwise datasets with fewer groups than batch_size train ZERO steps
    (round-1 e2e demo bug)."""
    ds = _toy_dataset(n_queries=3, per_q=4)  # 3 queries * 2 pos = 6 groups
    # batch_size larger than the number of groups: still one (padded) batch
    batches = list(ds.iter_pair_batches(batch_size=64, num_dup=1, num_neg=1))
    assert len(batches) == 1
    assert batches[0]["left"].shape[0] == 64 * 2
    labs = batches[0]["labels"].reshape(-1, 2)
    assert (labs[:, 0] > 0).all() and (labs[:, 1] <= 0).all()
    # non-divisible group count: ceil coverage, every batch full-shape
    batches = list(ds.iter_pair_batches(batch_size=4, num_dup=1, num_neg=1))
    assert len(batches) == 2  # ceil(6 / 4)
    assert all(b["left"].shape[0] == 4 * 2 for b in batches)


def test_pair_resample_changes_negatives():
    ds = _toy_dataset()
    b0 = next(ds.iter_pair_batches(4, num_neg=2, seed=1, epoch=0))
    b1 = next(ds.iter_pair_batches(4, num_neg=2, seed=1, epoch=1))
    assert not np.array_equal(b0["right"], b1["right"])


def test_unpairable_queries_excluded():
    ds = _toy_dataset()
    # make one query all-positive -> not pairable
    ds2 = PairDataset(
        left=ds.left, right=ds.right,
        labels=np.ones_like(ds.labels), query_ids=ds.query_ids,
    )
    assert ds2.pairable_queries == []
    assert list(ds2.iter_pair_batches(2)) == []


# ----------------------------------------------------------------- losses

def test_losses_directional():
    import jax.numpy as jnp

    good = jnp.asarray([5.0, -5.0, 4.0, -4.0])  # pos >> neg
    bad = jnp.asarray([-5.0, 5.0, -4.0, 4.0])
    assert float(rank_hinge_loss(good, 2)) < float(rank_hinge_loss(bad, 2))
    assert float(rank_xent_loss(good, 2)) < float(rank_xent_loss(bad, 2))


# ------------------------------------------------ learnability per reranker

def _learnable_dataset(pp_len=(4, 8), n_queries=12, seed=0):
    """Positives share a token with the query; negatives don't."""
    rng = np.random.default_rng(seed)
    L, R = pp_len
    rows_left, rows_right, labels, qids = [], [], [], []
    for q in range(n_queries):
        q_tok = 2 + q  # one distinct token per query
        left = np.full(L, 0, np.int32)
        left[0] = q_tok
        for d in range(4):
            right = rng.integers(30, 60, size=R).astype(np.int32)
            lab = 1.0 if d < 2 else 0.0
            if lab:
                right[: 3] = q_tok  # strong lexical overlap
            rows_left.append(left)
            rows_right.append(right)
            labels.append(lab)
            qids.append(f"q{q}")
    return PairDataset(
        left=np.asarray(rows_left), right=np.asarray(rows_right),
        labels=np.asarray(labels, np.float32), query_ids=np.asarray(qids),
    )


ALL_MODELS = ["knrm", "conv_knrm", "match_pyramid", "arcii", "esim",
              "match_lstm", "mvlstm", "cross_encoder"]


@pytest.mark.parametrize("model_name", ALL_MODELS)
def test_reranker_learns_lexical_overlap(model_name):
    ds = _learnable_dataset()
    cfg = TrainConfig(
        model=model_name, epochs=3, batch_size=4, num_neg=1,
        optimizer="adam", learning_rate=0.01,
        loss="rank_xent" if model_name in ("esim", "match_lstm", "mvlstm",
                                           "cross_encoder")
        else "hinge",
        embedding_dim=16, eval_metrics=("map", "ndcg@3"),
    )
    kwargs = {}
    if model_name in ("esim", "match_lstm", "mvlstm"):
        kwargs = {"hidden_size": 16}
    if model_name == "conv_knrm":
        kwargs = {"filters": 8}
    if model_name == "arcii":
        # tiny 4x8 inputs: shrink the two pooling stages so dims stay >= 1
        kwargs = {"kernel_2d_count": (8, 8), "pool_2d_size": ((2, 2), (2, 2))}
    if model_name == "mvlstm":
        kwargs = {"hidden_size": 16, "top_k": 5}
    if model_name == "cross_encoder":
        kwargs = {"num_layers": 1, "num_heads": 2, "mlp_dim": 32}
    trainer = RerankTrainer(model_name, vocab_size=64, cfg=cfg,
                            model_kwargs=kwargs)
    result = trainer.fit(ds, test_ds=ds)
    final_map = result.history[-1]["map"]
    assert final_map > 0.75, f"{model_name} failed to learn: MAP={final_map}"


def test_margin_mse_loss_directional():
    import jax.numpy as jnp

    from semanticsearch_tpu.train.trainer import margin_mse_loss

    teacher = jnp.asarray([0.8, 0.2, 0.9, 0.1])  # margins 0.6, 0.8
    matched = jnp.asarray([1.6, 1.0, 1.9, 1.1])  # same margins, shifted
    assert float(margin_mse_loss(matched, teacher, 2)) == pytest.approx(0.0)
    flipped = jnp.asarray([0.2, 0.8, 0.1, 0.9])
    assert float(margin_mse_loss(flipped, teacher, 2)) > 0.5
    # scale applies to the TEACHER margin
    scaled = jnp.asarray([1.2, 0.0, 1.6, 0.0])  # margins 1.2, 1.6 = 2x
    assert float(margin_mse_loss(scaled, teacher, 2, scale=2.0)) == \
        pytest.approx(0.0)


def test_distill_requires_teacher():
    ds = _learnable_dataset()
    cfg = TrainConfig(model="knrm", epochs=1, batch_size=4, num_neg=1,
                      optimizer="adam", embedding_dim=8,
                      distill_weight=0.5, eval_metrics=("map",))
    trainer = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    with pytest.raises(ValueError, match="teacher"):
        trainer.fit(ds)


def test_teacher_scores_ride_pair_batches():
    ds = _learnable_dataset()
    # teacher keyed to each row's first left token: alignment is checkable
    # inside any batch without knowing the sampled row order
    ds.teacher = ds.left[:, 0].astype(np.float32) + 100.0 * ds.labels
    for batch in ds.iter_pair_batches(batch_size=4, num_neg=1, seed=0):
        expect = batch["left"][:, 0].astype(np.float32) + 100.0 * batch["labels"]
        assert np.array_equal(batch["teacher"], expect)


def test_distill_trains_and_tracks_teacher_margins():
    ds = _learnable_dataset()
    # teacher agrees with the labels but carries score GEOMETRY: margin 1.0
    ds.teacher = ds.labels.astype(np.float32)
    cfg = TrainConfig(model="knrm", epochs=6, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01, loss="hinge",
                      embedding_dim=16, distill_weight=1.0,  # PURE distill
                      eval_metrics=("map",))
    trainer = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    result = trainer.fit(ds, test_ds=ds)
    # pure margin-MSE still learns the ordering the teacher encodes...
    assert result.history[-1]["map"] > 0.75
    # ...and the loss (pure MSE to the 1.0 teacher margin) collapses from
    # its ~1.0 start
    assert result.history[-1]["loss"] < 0.5 * result.history[0]["loss"]


def test_distill_weight_zero_is_exact_previous_behavior():
    ds = _learnable_dataset()
    cfg = TrainConfig(model="knrm", epochs=2, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01,
                      embedding_dim=16, eval_metrics=("map",))
    base = RerankTrainer("knrm", vocab_size=64, cfg=cfg).fit(ds, test_ds=ds)
    ds2 = _learnable_dataset()
    ds2.teacher = ds2.labels.astype(np.float32)  # present but w=0: unused
    again = RerankTrainer("knrm", vocab_size=64, cfg=cfg).fit(ds2, test_ds=ds2)
    assert base.history[-1]["loss"] == pytest.approx(
        again.history[-1]["loss"])


def test_length_bucketed_pair_batches():
    """Bucketing: every batch's right width is a declared bucket, slicing
    drops only padding, and the same pairs train as unbucketed."""
    rng = np.random.default_rng(0)
    n_q, per_q, R = 12, 6, 64
    n = n_q * per_q
    rlen = rng.integers(4, R + 1, size=n)
    right = np.zeros((n, R), np.int32)
    for i, ln in enumerate(rlen):
        right[i, :ln] = rng.integers(2, 100, size=ln)
    left = rng.integers(2, 100, size=(n, 8)).astype(np.int32)
    labels = np.tile([1.0, 1.0] + [0.0] * (per_q - 2), n_q)
    qids = np.repeat(np.arange(n_q), per_q)
    ds = PairDataset(left=left, right=right, labels=labels, query_ids=qids)

    buckets = (16, 32)
    widths_seen = set()
    rows_bucketed = []
    for batch in ds.iter_pair_batches(4, num_neg=1, seed=7, epoch=0,
                                      length_buckets=buckets):
        w = batch["right"].shape[1]
        widths_seen.add(w)
        assert w in {16, 32, 64}
        # nothing real was cut: each row's true length fits the width
        assert ((batch["right"] != 0).sum(1) <= w).all()
        rows_bucketed.append(batch)
    assert len(widths_seen) > 1  # the length mix actually split

    # same (seed, epoch) unbucketed epoch trains the same number of groups
    n_groups_plain = sum(
        batch["left"].shape[0]
        for batch in ds.iter_pair_batches(4, num_neg=1, seed=7, epoch=0)
    )
    n_groups_bucket = sum(b["left"].shape[0] for b in rows_bucketed)
    # wrap-around padding differs per bucket, so totals may differ by < one
    # batch per bucket
    assert abs(n_groups_bucket - n_groups_plain) <= 4 * 2 * len(buckets)


def test_bucketed_scores_match_unbucketed():
    """For a length-independent model (KNRM) the sliced right batch scores
    identically: the dropped columns are pure masked padding."""
    import jax
    import jax.numpy as jnp

    from semanticsearch_tpu.models.rerankers import make_model

    rng = np.random.default_rng(1)
    model = make_model("knrm", vocab_size=50, embed_dim=8)
    B, R = 4, 32
    right = np.zeros((B, R), np.int32)
    for i in range(B):
        right[i, : 6 + i] = rng.integers(2, 50, size=6 + i)
    left = rng.integers(2, 50, size=(B, 8)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(left),
                        jnp.asarray(right))["params"]
    full = model.apply({"params": params}, jnp.asarray(left),
                       jnp.asarray(right))
    sliced = model.apply({"params": params}, jnp.asarray(left),
                         jnp.asarray(right[:, :16]))
    np.testing.assert_allclose(np.asarray(full), np.asarray(sliced),
                               rtol=1e-5, atol=1e-6)


def test_trainer_with_length_buckets_learns(tmp_path):
    """End-to-end: bucketed training runs and the loss drops; ArcII ignores
    buckets with a warning instead of crashing on mismatched params."""
    ds = _toy_dataset(seed=3)
    cfg = TrainConfig(model="knrm", epochs=3, batch_size=4, num_neg=1,
                      embedding_dim=16, length_buckets=(8, 16))
    trainer = RerankTrainer("knrm", vocab_size=120, cfg=cfg)
    res = trainer.fit(ds)
    assert res.history[-1]["loss"] < res.history[0]["loss"]

    # ArcII (length-dependent params): buckets must be IGNORED, not applied
    # (a sliced batch would shape-mismatch its flatten->Dense head). Needs
    # lengths that survive its two 3x3 pools.
    rng = np.random.default_rng(5)
    n_q, per_q = 4, 4
    n = n_q * per_q
    ds2 = PairDataset(
        left=rng.integers(2, 120, size=(n, 12)).astype(np.int32),
        right=rng.integers(2, 120, size=(n, 36)).astype(np.int32),
        labels=np.tile([1.0, 1.0, 0.0, 0.0], n_q).astype(np.float32),
        query_ids=np.repeat(np.arange(n_q), per_q),
    )
    cfg2 = TrainConfig(model="arcii", epochs=1, batch_size=4, num_neg=1,
                       embedding_dim=16, length_buckets=(9, 18))
    trainer2 = RerankTrainer("arcii", vocab_size=120, cfg=cfg2)
    res2 = trainer2.fit(ds2)  # must not crash: buckets ignored for ArcII
    assert np.isfinite(res2.history[-1]["loss"])


def test_keep_best_returns_best_epoch_params():
    """cfg.keep_best: fit() returns the params of the best-validation epoch
    (not the last), and patience stops a saturated run early. The
    reference's trainer validates every epoch and keeps the best state
    (train_controller.py:556-560)."""
    ds = _learnable_dataset()
    cfg = TrainConfig(model="knrm", epochs=12, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01,
                      embedding_dim=16, eval_metrics=("map",),
                      keep_best=True, patience=2)
    trainer = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    res = trainer.fit(ds, test_ds=ds)
    # the learnable set saturates at MAP 1.0 within a few epochs, so the
    # patience window must fire before the epoch budget
    assert len(res.history) < cfg.epochs
    best_hist = max(r["map"] for r in res.history)
    returned = trainer.evaluate(res.params, ds)["map"]
    assert abs(returned - best_hist) < 1e-9


def test_preprocessor_subword_mode(tmp_path):
    """Subword mode: ids live in the tokenizer's id space (no CLS, no
    word-level UNK collapse), fit() is a no-op, save/load keeps the mode."""
    from semanticsearch_tpu.models.subword import train_bpe

    corpus = ["the running dogs jumped over fences",
              "dogs run and jump while runners watch",
              "fences keep running dogs from jumping"] * 4
    tok = train_bpe(corpus, vocab_size=160, max_len=16)
    pp = Preprocessor(fixed_length_left=8, fixed_length_right=12,
                      subword=tok)
    pp.fit(["completely ignored"])  # vocabulary comes from the tokenizer
    assert pp.vocab_size == tok.vocab_size
    enc = pp.transform_pair(["running dogs"], ["the dogs jumped quickly"])
    want = []
    for w in tok.tokenize("running dogs"):
        want.extend(tok.encode_word(w))
    want = want[:8]
    assert enc["left"][0][: len(want)].tolist() == want
    assert 1 not in enc["left"][0]  # no CLS in reranker inputs
    # an unseen inflection decomposes into pieces instead of one UNK:
    # more non-pad ids than words
    enc2 = pp.transform_pair(["jumpings"], ["x"])
    assert (enc2["left"][0] != 0).sum() >= 2
    pp.save(str(tmp_path / "pp.json"))
    pp2 = Preprocessor.load(str(tmp_path / "pp.json"))
    assert pp2.subword is not None
    enc3 = pp2.transform_pair(["running dogs"], ["the dogs jumped quickly"])
    np.testing.assert_array_equal(enc["left"], enc3["left"])
    np.testing.assert_array_equal(enc["right"], enc3["right"])


def test_encoder_embedding_transfer_init():
    """embedding_matrix=encoder_token_embeddings(enc): the reranker's table
    starts as the encoder's L2-normalized token rows (the zero-egress
    analog of the reference's GloVe init, train_controller.py:564-581)."""
    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.train.embeddings import encoder_token_embeddings

    enc = SentenceEncoder(EncoderConfig(
        vocab_size=64, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=16, dtype="float32"))
    mat = encoder_token_embeddings(enc)
    assert mat.shape == (64, 16)
    assert np.abs(mat[0]).max() == 0.0  # pad row zeroed
    np.testing.assert_allclose(
        np.linalg.norm(mat[1:], axis=1), 1.0, rtol=1e-5)
    cfg = TrainConfig(model="knrm", embedding_dim=16, epochs=1,
                      batch_size=4, num_neg=1)
    trainer = RerankTrainer("knrm", vocab_size=64, cfg=cfg,
                            embedding_matrix=mat)
    params = trainer.init_params(_learnable_dataset())
    np.testing.assert_allclose(
        np.asarray(params["embedding"]["embedding"]), mat, rtol=1e-6)


def test_cross_encoder_warm_start_transfer():
    """transfer_from_encoder warm-starts the cross-encoder's whole stack
    from a trained sentence encoder: the token table, both LayerNorms, and
    every transformer block are bit-copied; the CLS/segment/head params
    keep their fresh init; encoder position rows land at packed positions
    1.. (0 is the CLS slot). The warm-started model must train finite, and
    an architecture mismatch must raise instead of partially transferring."""
    import jax

    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.models.rerankers import transfer_from_encoder

    enc = SentenceEncoder(EncoderConfig(
        vocab_size=64, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=16, dtype="float32"))
    cfg = TrainConfig(model="cross_encoder", embedding_dim=16, epochs=2,
                      batch_size=4, num_neg=1, loss="rank_xent",
                      optimizer="adam", learning_rate=1e-3)
    kwargs = {"num_layers": 1, "num_heads": 2, "mlp_dim": 32}
    trainer = RerankTrainer(
        "cross_encoder", vocab_size=64, cfg=cfg, model_kwargs=kwargs,
        warm_start_fn=lambda p: transfer_from_encoder(p, enc.params))
    ds = _learnable_dataset()
    params = trainer.init_params(ds)
    np.testing.assert_array_equal(
        np.asarray(params["embedding"]["embedding"]),
        np.asarray(enc.params["token_embed"]["embedding"]))
    for leaf_mine, leaf_enc in zip(
            jax.tree.leaves(params["layer_0"]),
            jax.tree.leaves(enc.params["layer_0"])):
        np.testing.assert_array_equal(np.asarray(leaf_mine),
                                      np.asarray(leaf_enc))
    np.testing.assert_array_equal(
        np.asarray(params["pos_embed"]["embedding"])[1:17],
        np.asarray(enc.params["pos_embed"]["embedding"]))
    res = trainer.fit(ds)
    assert all(np.isfinite(r["loss"]) for r in res.history), res.history

    # depth mismatch: cross-encoder deeper than the encoder -> loud error
    deep = RerankTrainer(
        "cross_encoder", vocab_size=64, cfg=cfg,
        model_kwargs={"num_layers": 2, "num_heads": 2, "mlp_dim": 32},
        warm_start_fn=lambda p: transfer_from_encoder(p, enc.params))
    with pytest.raises(ValueError, match="layer_1"):
        deep.init_params(ds)


def test_rerank_service_load_respects_model_kwargs(tmp_path):
    """RerankService.load must rebuild the architecture the checkpoint was
    TRAINED with (metadata model_kwargs), not the model class defaults —
    regression: a non-default kernel_num loaded fine through the evaluate
    path but the serve path silently rebuilt the default architecture."""
    from semanticsearch_tpu.data.folds import FoldPaths
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.index.rerank_service import RerankService
    from semanticsearch_tpu.train.evaluate import CVEvaluator

    rows = []
    for q in range(4):
        for d in range(4):
            lab = 1 if d < 2 else 0
            text = f"tok{q} sig relevant text" if lab else f"noise z{q} {d}"
            rows.append({"query_id": f"q{q}", "query_text": f"tok{q} sig",
                         "chunk_text": text, "label": str(lab)})
    for split in ("train", "test"):
        write_tsv(str(tmp_path / f"fold_1_{split}.tsv"), rows,
                  ["query_id", "query_text", "chunk_text", "label"])
    cfg = TrainConfig(model="knrm", epochs=1, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01,
                      embedding_dim=16, filter_low_freq=1)
    folds = [FoldPaths(train=str(tmp_path / "fold_1_train.tsv"),
                       test=str(tmp_path / "fold_1_test.tsv"))]
    CVEvaluator(folds, metrics=("map",)).run_model(
        "knrm", cfg=cfg, output_dir=str(tmp_path / "out"),
        model_kwargs={"kernel_num": 7})
    svc = RerankService.load(str(tmp_path / "out" / "knrm" / "fold_1"))
    assert svc.model_kwargs == {"kernel_num": 7}
    assert svc.model.kernel_num == 7
    scores = svc.score_pairs(["tok1 sig", "tok2 sig"],
                             ["tok1 sig relevant text", "noise z9 1"])
    assert scores.shape == (2,) and np.isfinite(scores).all()


@pytest.mark.parametrize("model_name", ["knrm", "conv_knrm", "match_pyramid"])
def test_zero_pad_row_embedding_trains_finite(model_name):
    """Regression: an embedding table with an EXACTLY-ZERO row (the pad row
    of encoder_token_embeddings) must not NaN training. linalg.norm has a
    NaN gradient at a zero vector, and `x / max(norm, eps)` does not block
    it (0 * NaN = NaN) — cosine_match_matrix normalizes via rsqrt of the
    clamped squared norm instead. Pre-fix, every cosine-normalizing model
    (KNRM/Conv-KNRM/MatchPyramid) NaN'd on the FIRST step with this init
    and poisoned all parameters."""
    ds = _learnable_dataset()
    mat = np.random.default_rng(0).standard_normal((64, 16)).astype(
        np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    mat[0] = 0.0  # the pad row
    cfg = TrainConfig(model=model_name, embedding_dim=16, epochs=2,
                      batch_size=4, num_neg=1, optimizer="adam",
                      learning_rate=0.01)
    trainer = RerankTrainer(model_name, vocab_size=64, cfg=cfg,
                            embedding_matrix=mat)
    res = trainer.fit(ds)
    assert all(np.isfinite(r["loss"]) for r in res.history), res.history
    emb = np.asarray(res.params["embedding"]["embedding"])
    assert np.isfinite(emb).all()


def test_cv_train_with_subword_and_encoder_init(tmp_path):
    """CVEvaluator honors TrainConfig.subword_tokenizer_path +
    embedding_init_path="encoder:<dir>" — the CLI-reachable form of the
    BASELINE subword_rr recipe (--set train.subword_tokenizer_path=... etc).
    The reranker's vocab becomes the tokenizer's, its embedding table
    starts as the encoder's token table, and keep_best validates per epoch
    like the reference's loop (train_controller.py:556-560)."""
    from semanticsearch_tpu.core.config import EncoderConfig
    from semanticsearch_tpu.data.folds import FoldPaths
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.models.encoder import SentenceEncoder
    from semanticsearch_tpu.models.subword import train_bpe
    from semanticsearch_tpu.train.encoder_train import save_encoder
    from semanticsearch_tpu.train.evaluate import CVEvaluator

    corpus = ["the running dogs jumped over tall fences",
              "cats watch running dogs jumping fences",
              "fences keep dogs from running and jumping"] * 3
    tok = train_bpe(corpus, vocab_size=120, max_len=16)
    tok.save(str(tmp_path / "tok.json"))
    enc = SentenceEncoder(EncoderConfig(
        vocab_size=tok.vocab_size, hidden_dim=16, num_layers=1, num_heads=2,
        mlp_dim=32, max_len=16, dtype="float32"), tokenizer=tok)
    save_encoder(enc, str(tmp_path / "enc"))

    rng = np.random.default_rng(0)
    for k in (1, 2):
        rows = []
        for q in range(4):
            for d in range(4):
                lab = 1 if d < 2 else 0
                text = (f"tok{q} dogs running" if lab
                        else " ".join(f"z{rng.integers(40)}" for _ in range(3)))
                rows.append({"query_id": f"q{q}",
                             "query_text": f"tok{q} dogs",
                             "chunk_text": text, "label": str(lab)})
        for split in ("train", "test"):
            write_tsv(str(tmp_path / f"fold_{k}_{split}.tsv"), rows,
                      ["query_id", "query_text", "chunk_text", "label"])

    cfg = TrainConfig(
        model="knrm", epochs=2, batch_size=4, num_neg=1, optimizer="adam",
        learning_rate=0.01, embedding_dim=16, filter_low_freq=1,
        keep_best=True, eval_metrics=("map",),
        subword_tokenizer_path=str(tmp_path / "tok.json"),
        embedding_init_path=f"encoder:{tmp_path / 'enc'}",
    )
    folds = [FoldPaths(train=str(tmp_path / f"fold_{k}_train.tsv"),
                       test=str(tmp_path / f"fold_{k}_test.tsv"))
             for k in (1, 2)]
    res = CVEvaluator(folds, metrics=("map", "mrr")).run_model(
        "knrm", cfg=cfg, output_dir=str(tmp_path / "out"))
    assert len(res.per_fold) == 2
    assert all(np.isfinite(f["map"]) for f in res.per_fold)
    # the persisted preprocessor must round-trip in subword mode
    from semanticsearch_tpu.train.vocab import Preprocessor

    pp = Preprocessor.load(str(tmp_path / "out" / "knrm" / "fold_1"
                               / "preprocessor.json"))
    assert pp.subword is not None
    assert pp.vocab_size == tok.vocab_size

    # mismatched embedding_dim must fail loudly, not train garbage
    import dataclasses

    bad = dataclasses.replace(cfg, embedding_dim=8)
    with pytest.raises(ValueError, match="does not match"):
        CVEvaluator(folds[:1]).run_model("knrm", cfg=bad)


def test_saved_model_roundtrip_with_model_kwargs(tmp_path):
    """evaluate_saved_model must rebuild the architecture TRAINED, not the
    model's defaults: run_model's model_kwargs ride the checkpoint
    metadata (regression: a non-default kernel_num made the saved params
    unrestorable or silently mis-shaped)."""
    from semanticsearch_tpu.data.folds import FoldPaths
    from semanticsearch_tpu.data.tsv import write_tsv
    from semanticsearch_tpu.train.evaluate import CVEvaluator, evaluate_saved_model

    rows = []
    for q in range(4):
        for d in range(4):
            lab = 1 if d < 2 else 0
            text = f"tok{q} sig relevant text" if lab else f"noise z{q} {d}"
            rows.append({"query_id": f"q{q}", "query_text": f"tok{q} sig",
                         "chunk_text": text, "label": str(lab)})
    for split in ("train", "test"):
        write_tsv(str(tmp_path / f"fold_1_{split}.tsv"), rows,
                  ["query_id", "query_text", "chunk_text", "label"])
    cfg = TrainConfig(model="knrm", epochs=1, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01,
                      embedding_dim=16, filter_low_freq=1)
    folds = [FoldPaths(train=str(tmp_path / "fold_1_train.tsv"),
                       test=str(tmp_path / "fold_1_test.tsv"))]
    res = CVEvaluator(folds, metrics=("map",)).run_model(
        "knrm", cfg=cfg, output_dir=str(tmp_path / "out"),
        model_kwargs={"kernel_num": 7})
    assert np.isfinite(res.per_fold[0]["map"])
    got = evaluate_saved_model(str(tmp_path / "out" / "knrm" / "fold_1"),
                               str(tmp_path / "fold_1_test.tsv"),
                               metrics=("map",))
    # same params + same architecture -> identical metric
    assert got["map"] == pytest.approx(res.per_fold[0]["map"], abs=1e-6)
