"""Per-model training presets.

The chosen hyperparameters of the reference's ``MODEL_CONFIGS``
(``MatchZoo_Tool/train_controller.py:46-188``) and its standalone
``Train_*.py`` recipes (``Train_ESIM[choose].py:22,50-54``,
``Train_KNRM[delete].py:117-119``, etc.), re-expressed as ``TrainConfig`` +
model kwargs. GPU-memory workarounds (batch auto-halving, gradient
accumulation, aggressive cleanup) are intentionally absent — batch sizes here
are TPU-sized, not VRAM-survival-sized.
"""
from __future__ import annotations

from typing import Dict, Tuple

from ..core.config import TrainConfig

# (TrainConfig, model_kwargs) per model key.
MODEL_TRAIN_PRESETS: Dict[str, Tuple[TrainConfig, dict]] = {
    "knrm": (
        TrainConfig(
            model="knrm", optimizer="adadelta", learning_rate=1.0,
            batch_size=64, num_dup=1, num_neg=1, loss="hinge",
            fixed_length_left=16, fixed_length_right=64, filter_low_freq=5,
        ),
        {"kernel_num": 21, "sigma": 0.1, "exact_sigma": 0.001},
    ),
    "conv_knrm": (
        TrainConfig(
            model="conv_knrm", optimizer="adadelta", learning_rate=1.0,
            batch_size=32, num_dup=1, num_neg=1, loss="hinge",
            clip_norm=10.0,
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
        ),
        {"filters": 128, "max_ngram": 3, "use_crossmatch": True,
         "kernel_num": 11, "sigma": 0.1, "exact_sigma": 0.001},
    ),
    "arcii": (
        TrainConfig(
            model="arcii", optimizer="adam", learning_rate=1e-3,
            batch_size=64, num_dup=1, num_neg=1, loss="hinge",
            fixed_length_left=16, fixed_length_right=256, filter_low_freq=5,
        ),
        {"kernel_1d_count": 32, "kernel_1d_size": 3,
         "kernel_2d_count": (64, 64), "dropout_rate": 0.3},
    ),
    "esim": (
        TrainConfig(
            model="esim", optimizer="adadelta", learning_rate=1.0,
            batch_size=32, num_dup=1, num_neg=1, loss="rank_xent",
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
        ),
        {"hidden_size": 200, "dropout_rate": 0.2},
    ),
    "match_lstm": (
        TrainConfig(
            model="match_lstm", optimizer="adadelta", learning_rate=1.0,
            batch_size=32, num_dup=1, num_neg=1, loss="rank_xent",
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
        ),
        {},
    ),
    "match_pyramid": (
        TrainConfig(
            model="match_pyramid", optimizer="adam", learning_rate=1e-3,
            batch_size=64, num_dup=1, num_neg=1, loss="hinge",
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
        ),
        {"kernel_count": (16, 32), "dpool_size": (3, 10), "dropout_rate": 0.3},
    ),
    "mvlstm": (
        TrainConfig(
            model="mvlstm", optimizer="adadelta", learning_rate=1.0,
            batch_size=32, num_dup=1, num_neg=1, loss="rank_xent",
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
        ),
        {"hidden_size": 128, "top_k": 10},
    ),
    # Beyond the reference's seven: the cross-encoder it shipped as dead
    # code (Semantic_Splitter_Optimized.py:14-61, never reached — SURVEY §7
    # defect 2), built for real (models/rerankers/cross_encoder.py). No
    # reference hyperparameters exist; these are the fine-tuning-shaped
    # ones (low adam lr — the model is meant to start from a trained
    # encoder via transfer_from_encoder, and 1e-3 scrambles warm-started
    # transformer blocks; rank_xent over (1+num_neg) groups).
    "cross_encoder": (
        TrainConfig(
            model="cross_encoder", optimizer="adam", learning_rate=2e-4,
            batch_size=32, num_dup=1, num_neg=4, loss="rank_xent",
            fixed_length_left=16, fixed_length_right=128, filter_low_freq=5,
            embedding_dim=128,
        ),
        {"num_layers": 2, "num_heads": 4, "mlp_dim": 256,
         "dropout_rate": 0.1},
    ),
}


def get_preset(model_name: str) -> Tuple[TrainConfig, dict]:
    key = model_name.lower().replace("-", "_")
    if key not in MODEL_TRAIN_PRESETS:
        raise KeyError(
            f"no preset for {model_name!r}; have {sorted(MODEL_TRAIN_PRESETS)}"
        )
    cfg, kwargs = MODEL_TRAIN_PRESETS[key]
    return cfg, dict(kwargs)
