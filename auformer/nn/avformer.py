"""The flagship two-stream aural-visual former (reference models/avformer.py)
plus the audio-only models (reference models/audio.py).

Architecture (avformer.py:93-106, shapes per SURVEY.md §3.5):
  audio (B,1,64,1001) -> 1-ch resnet18 -> (B,512) -> AU_former -> (B,12,128)
  clip  (B,T,H,W,C)   -> VideoModel (S+T former) -> (B,512) -> AU_former
                                                   -> (B,12,128)
  concat on feature dim -> (B,12,256) -> FormerAUHead -> 12 AU logits
  out (B,21): AU slice filled, EX/VA slices zero (task='AU' only path).

The pretrained sub-streams are frozen in the reference (avformer.py:78-85);
here freezing is an optimizer-mask concern (see train_lib.trainable_mask) —
the module itself is pure.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .blocks import Dtype
from .heads import AUFormerHead, FormerAUHead
from .resnet import ResNet18
from .vformer import VideoModel


class AudioModel(nn.Module):
    """1-channel resnet18 over the log-mel image -> (B, 512) features
    (reference audio.py:22-39; the 22-way fc is replaced by Dummy in every
    user, audio.py:51 / avformer.py:47, so it is omitted).

    ``time_major=True`` takes (B, T, n_mels, 1) NHWC input directly — the
    layout the dense sweep's phase-mel row gather produces — and expects
    variables whose conv kernels have their H/W axes swapped
    (sweep.swap_conv_hw). Every resnet18 conv, pad, and pool is symmetric
    across H and W, so the pooled (B, 512) features are the transpose-free
    equal of the default orientation (float-reassociation noise only).
    """
    dtype: Dtype = jnp.float32
    time_major: bool = False

    @nn.compact
    def __call__(self, audio_features, *, train: bool = False):
        if self.time_major:
            x = audio_features                    # (B, T, n_mels, 1) NHWC
        else:
            # (B, 1, n_mels, T) [torch layout] -> NHWC (B, n_mels, T, 1)
            x = jnp.transpose(audio_features, (0, 2, 3, 1))
        return ResNet18(dtype=self.dtype, name="resnet")(x, train=train)


class AudioFormer(nn.Module):
    """Audio stream: AudioModel + AU_former -> (B, 12, 128) AU tokens
    (reference avformer.py:37-55)."""
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, audio_features, *, train: bool = False):
        feats = AudioModel(self.dtype, name="audio_model")(
            audio_features, train=train)
        _, tokens = AUFormerHead(dropout=self.dropout, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     feats, train=train,
                                     deterministic=not train)
        return tokens


class AVVisualFormer(nn.Module):
    """Visual stream: VideoModel + AU_former -> (B, 12, 128) AU tokens
    (reference avformer.py:57-71)."""
    num_channels: int = 3
    n_frames: int = 16
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, clip, *, train: bool = False):
        feats = VideoModel(self.num_channels, self.n_frames, None, 0.0,
                           self.dtype, self.use_pallas, name="video_model")(
                               clip, train=train, deterministic=not train)
        _, tokens = AUFormerHead(input_dim=512, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     feats, train=train,
                                     deterministic=not train)
        return tokens


class TwoStreamAuralVisualFormer(nn.Module):
    """avformer (reference avformer.py:73-106): late fusion of A/V AU tokens
    through the reconstructed FormerAUHead."""
    modality: str = "A;V"
    task: str = "AU"
    n_frames: int = 16
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("clip", "audio_features")
    loss_key = "avformer"

    @property
    def num_channels(self) -> int:
        if "M" in self.modality:
            return 4 if "V" in self.modality else 1
        return 3

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        audio_tokens = AudioFormer(self.dropout, self.dtype, self.use_pallas,
                                   name="audio_model")(
                                       x["audio_features"], train=train)
        video_tokens = AVVisualFormer(self.num_channels, self.n_frames,
                                      self.dtype, self.use_pallas,
                                      name="video_model")(
                                          x["clip"], train=train)
        fused = jnp.concatenate([audio_tokens, video_tokens], axis=2)
        b = fused.shape[0]
        out = jnp.zeros((b, 21), jnp.float32)
        if self.task == "AU":
            au = FormerAUHead(emb_dim=256, dropout=self.dropout,
                              dtype=self.dtype, use_pallas=self.use_pallas,
                              name="au_head")(fused, deterministic=not train)
            out = out.at[:, :12].set(au.astype(jnp.float32))
        return out


class AudioOnly(nn.Module):
    """audio model (reference audio.py:42-114): mel -> resnet18 ->
    AU_former logits into the AU slice."""
    modality: str = "A"
    task: str = "AU"
    dropout: float = 0.2
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    modes = ("audio_features",)
    loss_key = "audio"

    @nn.compact
    def __call__(self, x: dict, *, train: bool = False):
        feats = AudioModel(self.dtype, name="audio_model")(
            x["audio_features"], train=train)
        b = feats.shape[0]
        out = jnp.zeros((b, 21), jnp.float32)
        if self.task == "AU":
            au, _ = AUFormerHead(dropout=self.dropout, dtype=self.dtype,
                                 use_pallas=self.use_pallas, name="au_head")(
                                     feats, train=train,
                                     deterministic=not train)
            out = out.at[:, :12].set(au.astype(jnp.float32))
        return out
