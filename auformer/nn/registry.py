"""Model zoo registry — dispatch mirrors reference train.py:292-315."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..losses import SUITES, LossSuite


def build_model(cfg: Config):
    """Instantiate the model named by cfg.model_name (train.py:292-315
    dispatch; unknown names fall back to the resnet image baseline)."""
    name = cfg.model_name
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    common = dict(modality=cfg.modality, task=cfg.task, dtype=dtype,
                  use_pallas=cfg.use_pallas)
    if name == "avformer":
        from .avformer import TwoStreamAuralVisualFormer
        return TwoStreamAuralVisualFormer(
            n_frames=cfg.n_frames, dropout=cfg.dropout_rate, **common)
    if name == "vformer":
        from .vformer import VisualFormer
        return VisualFormer(n_frames=cfg.n_frames, **common)
    if name == "vggformer":
        from .vggformer import VGGVisualFormer
        return VGGVisualFormer(n_frames=cfg.n_frames, **common)
    if name == "emonet":
        from .emonet import ImageEmoNetModel
        return ImageEmoNetModel(**common)
    if name == "tformer":
        from .tformer import SpatialTemporalFormer
        return SpatialTemporalFormer(
            n_frames=cfg.n_frames, dropout=cfg.dropout_rate, **common)
    if name == "sformer":
        from .sformer import SpatialFormer
        return SpatialFormer(dropout=cfg.dropout_rate, **common)
    if name == "dsformer":
        from .dual_sformer import DualSpatialFormer
        return DualSpatialFormer(dropout=cfg.dropout_rate, **common)
    if name == "i3d":
        from .i3d import VisualI3DModel
        return VisualI3DModel(**common)
    if name == "mc3d":
        from .mc3d import VisualMC3DModel
        return VisualMC3DModel(**common)
    if name == "van":
        from .van import SpatialVAN
        return SpatialVAN(dropout=cfg.dropout_rate, **common)
    if name == "audio":
        from .avformer import AudioOnly
        return AudioOnly(dropout=cfg.dropout_rate, **common)
    if name == "tsav":
        from .tsav import TwoStreamAuralVisualModel
        return TwoStreamAuralVisualModel(n_frames=cfg.n_frames, **common)
    from .resnet_image import ImageResNetModel
    return ImageResNetModel(task=cfg.task, dtype=dtype,
                            use_pallas=cfg.use_pallas)


def loss_suite(model) -> LossSuite:
    return SUITES[getattr(model, "loss_key", "resnet")]


def example_batch(cfg: Config, batch_size: int | None = None,
                  rng: np.random.RandomState | None = None
                  ) -> dict[str, Any]:
    """A correctly-shaped input dict for the configured model."""
    rng = rng or np.random.RandomState(0)
    b = batch_size or cfg.batch_size
    name = cfg.model_name
    single_frame = name in ("sformer", "dsformer", "van", "emonet", "resnet")
    t = 1 if single_frame else cfg.n_frames
    c = cfg.clip_channels if "V" in cfg.modality or "M" in cfg.modality else 3
    x: dict[str, Any] = {}
    needs_clip = name != "audio"
    if needs_clip:
        x["clip"] = rng.randn(b, t, cfg.image_size, cfg.image_size,
                              c).astype(np.float32)
    if cfg.use_audio or name in ("avformer", "audio", "tsav"):
        x["audio_features"] = rng.randn(b, 1, cfg.n_mels,
                                        cfg.mel_frames).astype(np.float32)
    return x


def init_model(cfg: Config, model=None, seed: int | None = None):
    """Initialize (params, batch_stats) with a batch-size-2 dummy batch."""
    model = model or build_model(cfg)
    x = example_batch(cfg, batch_size=2)
    rngs = {
        "params": jax.random.PRNGKey(seed if seed is not None else cfg.seed),
        "dropout": jax.random.PRNGKey(1)}
    if jax.default_backend() == "cpu":
        variables = model.init(rngs, x, train=False)
    else:
        # Eager flax init dispatches thousands of individual ops through
        # the device RPC tunnel (~30 ms+ each on axon: a multi-minute
        # stall observed in round 3). One jitted program compiles once
        # and hits the persistent compilation cache on every later run.
        import functools
        variables = jax.jit(functools.partial(model.init, train=False))(
            rngs, x)
    return model, variables
