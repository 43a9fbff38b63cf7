"""Mid-training checkpoint/resume: interrupted run continues exactly."""
import numpy as np

from semanticsearch_tpu.core.config import TrainConfig
from semanticsearch_tpu.train.pairs import PairDataset
from semanticsearch_tpu.train.trainer import RerankTrainer


def _ds(seed=0):
    rng = np.random.default_rng(seed)
    left, right, labels, qids = [], [], [], []
    for q in range(6):
        for d in range(4):
            left.append(rng.integers(2, 40, size=4))
            right.append(rng.integers(2, 40, size=8))
            labels.append(1.0 if d < 2 else 0.0)
            qids.append(f"q{q}")
    return PairDataset(
        left=np.asarray(left, np.int32), right=np.asarray(right, np.int32),
        labels=np.asarray(labels, np.float32), query_ids=np.asarray(qids),
    )


def test_resume_matches_uninterrupted(tmp_path):
    ds = _ds()
    cfg = TrainConfig(model="knrm", epochs=4, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01, embedding_dim=8)

    # Uninterrupted 4-epoch run.
    t1 = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    full = t1.fit(ds)

    # 2 epochs with checkpointing, then resume for the rest.
    t2 = RerankTrainer("knrm", vocab_size=64, cfg=TrainConfig(
        **{**cfg.__dict__, "epochs": 2,
           "eval_metrics": tuple(cfg.eval_metrics)}))
    t2.fit(ds, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2)

    t3 = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    resumed = t3.fit(ds, resume_from=str(tmp_path / "ck" / "epoch_1"))

    assert [h["epoch"] for h in resumed.history] == [2, 3]
    # Same total optimization: final scores agree (deterministic sampling,
    # same seeds/rng path per epoch index).
    s_full = t1.predict(full.params, ds)
    s_res = t3.predict(resumed.params, ds)
    np.testing.assert_allclose(s_full, s_res, rtol=1e-4, atol=1e-5)


def test_mid_epoch_step_resume_matches_uninterrupted(tmp_path):
    """Step-granular checkpoints carry the data-iterator cursor (epoch,
    step_in_epoch): resuming mid-epoch replays only the remaining batches
    with the same rng stream, matching an uninterrupted run exactly."""
    ds = _ds()
    cfg = TrainConfig(model="knrm", epochs=3, batch_size=4, num_neg=1,
                      optimizer="adam", learning_rate=0.01, embedding_dim=8)

    t1 = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    full = t1.fit(ds)

    # Checkpoint every 4 steps: with 6 pairable queries / batch 4 the epoch
    # has >1 step, so step_4 lands mid-epoch (not on an epoch boundary).
    t2 = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    t2.fit(ds, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every_steps=4)
    import os
    ckpts = sorted(p for p in os.listdir(tmp_path / "ck")
                   if p.startswith("step_"))
    assert ckpts, "no step checkpoints written"

    from semanticsearch_tpu.core.checkpoint import load_metadata
    meta = load_metadata(str(tmp_path / "ck" / "step_4"))
    assert "step_in_epoch" in meta

    t3 = RerankTrainer("knrm", vocab_size=64, cfg=cfg)
    resumed = t3.fit(ds, resume_from=str(tmp_path / "ck" / "step_4"))

    s_full = t1.predict(full.params, ds)
    s_res = t3.predict(resumed.params, ds)
    np.testing.assert_allclose(s_full, s_res, rtol=1e-4, atol=1e-5)
