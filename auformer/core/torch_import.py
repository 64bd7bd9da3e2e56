"""PyTorch state-dict -> auformer variables converter.

Enables loading reference-format checkpoints (latest.pth / best523.pth and
the frozen upstream stream weights, SURVEY.md §5 checkpoint bullet) into the
JAX model zoo:

  * layout: Conv2d OIHW -> HWIO, Conv3d OITHW -> THWIO, Linear (O,I) ->
    (I,O); BatchNorm weight/bias -> scale/bias, running stats ->
    batch_stats
  * the reference's key-rename maps are honored: ``module.`` strip
    (avformer.py:28-35), ``base_model.`` -> ``s_former.``
    (vformer.py:333-356)
  * the 12 per-AU linears fold into the batched TokenProjection /
    TokenLogits params (nn/blocks.py)

Input is a mapping of parameter name -> numpy array. Use
``load_torch_state_dict`` for .pth files (requires torch at call time
only).
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Params = dict[str, Any]


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    out = {}
    for k, v in sd.items():
        k = k.replace("module.", "")  # DDP prefix strip (avformer.py:28-35)
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


class Converter:
    """Accumulates params and batch_stats trees from torch tensors."""

    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = dict(sd)
        self.params: dict = {}
        self.stats: dict = {}
        self.missing: list[str] = []

    def _get(self, key: str) -> np.ndarray | None:
        if key not in self.sd:
            self.missing.append(key)
            return None
        return self.sd[key]

    # -- leaf mappers ---------------------------------------------------------
    def linear(self, tkey: str, jpath: str, bias: bool = True) -> None:
        w = self._get(f"{tkey}.weight")
        if w is not None:
            _set(self.params, f"{jpath}/kernel", w.T.copy())
        if bias:
            b = self._get(f"{tkey}.bias")
            if b is not None:
                _set(self.params, f"{jpath}/bias", b.copy())

    def conv2d(self, tkey: str, jpath: str, bias: bool = False) -> None:
        w = self._get(f"{tkey}.weight")
        if w is not None:
            _set(self.params, f"{jpath}/kernel",
                 np.transpose(w, (2, 3, 1, 0)).copy())
        if bias:
            b = self._get(f"{tkey}.bias")
            if b is not None:
                _set(self.params, f"{jpath}/bias", b.copy())

    def conv3d(self, tkey: str, jpath: str, bias: bool = False) -> None:
        w = self._get(f"{tkey}.weight")
        if w is not None:
            _set(self.params, f"{jpath}/kernel",
                 np.transpose(w, (2, 3, 4, 1, 0)).copy())
        if bias:
            b = self._get(f"{tkey}.bias")
            if b is not None:
                _set(self.params, f"{jpath}/bias", b.copy())

    def batchnorm(self, tkey: str, jpath: str) -> None:
        pairs = [("weight", "scale", self.params),
                 ("bias", "bias", self.params)]
        for tsuf, jsuf, tree in pairs:
            v = self._get(f"{tkey}.{tsuf}")
            if v is not None:
                _set(tree, f"{jpath}/{jsuf}", v.copy())
        for tsuf, jsuf in [("running_mean", "mean"), ("running_var", "var")]:
            v = self._get(f"{tkey}.{tsuf}")
            if v is not None:
                _set(self.stats, f"{jpath}/{jsuf}", v.copy())

    def layernorm(self, tkey: str, jpath: str) -> None:
        w = self._get(f"{tkey}.weight")
        b = self._get(f"{tkey}.bias")
        if w is not None:
            _set(self.params, f"{jpath}/scale", w.copy())
        if b is not None:
            _set(self.params, f"{jpath}/bias", b.copy())

    def raw(self, tkey: str, jpath: str) -> None:
        v = self._get(tkey)
        if v is not None:
            _set(self.params, jpath, v.copy())

    # -- composite mappers ----------------------------------------------------
    def transformer(self, tpre: str, jpre: str, depth: int) -> None:
        """Reference Transformer stack (vformer.py:100-114 naming:
        layers.{i}.0 = Residual(PreNorm(Attention)), .1 = PreNorm(FF))."""
        for i in range(depth):
            t0 = f"{tpre}.layers.{i}.0.fn"
            t1 = f"{tpre}.layers.{i}.1.fn"
            j = f"{jpre}/layers_{i}"
            self.layernorm(f"{t0}.norm", f"{j}/norm1")
            self.linear(f"{t0}.fn.to_qkv", f"{j}/attn/to_qkv", bias=False)
            # to_out is a Sequential(Linear, Dropout) when project_out
            if f"{t0}.fn.to_out.0.weight" in self.sd:
                self.linear(f"{t0}.fn.to_out.0", f"{j}/attn/to_out")
            self.layernorm(f"{t1}.norm", f"{j}/norm2")
            self.linear(f"{t1}.fn.net.0", f"{j}/mlp/fc1")
            self.linear(f"{t1}.fn.net.3", f"{j}/mlp/fc2")

    def token_proj(self, tpre: str, jpath: str, n: int, stem: str) -> None:
        """{stem}_p1..p{n} linears -> one TokenProjection kernel/bias."""
        ws, bs = [], []
        for i in range(1, n + 1):
            w = self._get(f"{tpre}.{stem}_p{i}.weight")
            b = self._get(f"{tpre}.{stem}_p{i}.bias")
            if w is None or b is None:
                return
            ws.append(w.T)          # (in, emb)
            bs.append(b)
        _set(self.params, f"{jpath}/kernel",
             np.concatenate(ws, axis=1).copy())
        _set(self.params, f"{jpath}/bias", np.concatenate(bs).copy())

    def token_logits(self, tpre: str, jpath: str, n: int,
                     stem: str) -> None:
        ws = []
        for i in range(1, n + 1):
            w = self._get(f"{tpre}.{stem}_last{i}.weight")
            if w is None:
                return
            ws.append(w.reshape(-1))   # (emb,)
        _set(self.params, f"{jpath}/kernel", np.stack(ws).copy())

    def au_former(self, tpre: str, jpre: str) -> None:
        """AU_former (heads.py:258-339) -> AUFormerHead."""
        self.batchnorm(f"{tpre}.AU_BN1", f"{jpre}/input_bn/bn")
        self.token_proj(tpre, f"{jpre}/token_proj", 12, "AU_linear")
        self.raw(f"{tpre}.pos_embedding", f"{jpre}/pos_embedding")
        self.transformer(f"{tpre}.corr_transformer",
                         f"{jpre}/corr_transformer", depth=2)
        self.token_logits(tpre, f"{jpre}/token_logits", 12, "AU_linear")

    def va_former(self, tpre: str, jpre: str) -> None:
        self.batchnorm(f"{tpre}.VA_BN1", f"{jpre}/input_bn/bn")
        self.token_proj(tpre, f"{jpre}/token_proj", 2, "VA_linear")
        self.raw(f"{tpre}.pos_embedding", f"{jpre}/pos_embedding")
        self.transformer(f"{tpre}.corr_transformer",
                         f"{jpre}/corr_transformer", depth=2)
        self.token_logits(tpre, f"{jpre}/token_logits", 2, "VA_linear")

    def former_au_head(self, tpre: str, jpre: str, depth: int = 3) -> None:
        """former_AU_head / tformer_AU_head (tformer.py:362-403)."""
        self.raw(f"{tpre}.pos_embedding", f"{jpre}/pos_embedding")
        self.transformer(f"{tpre}.corr_transformer",
                         f"{jpre}/corr_transformer", depth=depth)
        self.token_logits(tpre, f"{jpre}/token_logits", 12, "AU_linear")

    def resnet_block(self, tpre: str, jpre: str) -> None:
        self.conv2d(f"{tpre}.conv1", f"{jpre}/conv1")
        self.batchnorm(f"{tpre}.bn1", f"{jpre}/bn1/bn")
        self.conv2d(f"{tpre}.conv2", f"{jpre}/conv2")
        self.batchnorm(f"{tpre}.bn2", f"{jpre}/bn2/bn")
        if f"{tpre}.downsample.0.weight" in self.sd:
            self.conv2d(f"{tpre}.downsample.0", f"{jpre}/ds_conv")
            self.batchnorm(f"{tpre}.downsample.1", f"{jpre}/ds_bn/bn")

    def resnet18(self, tpre: str, jpre: str, layers=(2, 2, 2, 2)) -> None:
        """torchvision resnet18 trunk naming -> ResNet18/ResFormerTrunk."""
        p = (tpre + ".") if tpre else ""
        self.conv2d(f"{p}conv1", f"{jpre}/stem/conv1")
        self.batchnorm(f"{p}bn1", f"{jpre}/stem/bn1/bn")
        for li, blocks in enumerate(layers):
            for bi in range(blocks):
                self.resnet_block(f"{p}layer{li + 1}.{bi}",
                                  f"{jpre}/layer{li + 1}/block{bi}")

    def resformer(self, tpre: str, jpre: str) -> None:
        """ResFormer = resnet18 trunk + mid-trunk spatial transformer
        (vformer.py:168-268)."""
        self.resnet18(tpre, jpre)
        self.raw(f"{tpre}.pos_embedding", f"{jpre}/pos_embedding")
        self.transformer(f"{tpre}.spatial_transformer",
                         f"{jpre}/spatial_transformer", depth=1)

    def tformer(self, tpre: str, jpre: str, depth: int = 3) -> None:
        self.raw(f"{tpre}.cls_token", f"{jpre}/cls_token")
        self.raw(f"{tpre}.pos_embedding", f"{jpre}/pos_embedding")
        self.transformer(f"{tpre}.spatial_transformer",
                         f"{jpre}/transformer", depth=depth)

    def video_model(self, tpre: str, jpre: str) -> None:
        """vformer VideoModel (s_former + t_former), with the reference's
        base_model. -> s_former. rename applied upstream."""
        self.resformer(f"{tpre}.s_former", f"{jpre}/s_former")
        self.tformer(f"{tpre}.t_former", f"{jpre}/t_former")

    def result(self) -> dict:
        return {"params": self.params, "batch_stats": self.stats}


def rename_keys(sd: Mapping[str, np.ndarray],
                rules: list[tuple[str, str]]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for a, b in rules:
            k = k.replace(a, b)
        out[k] = v
    return out


def convert_avformer(sd: Mapping[str, np.ndarray]) -> dict:
    """best523.pth layout -> TwoStreamAuralVisualFormer variables
    (avformer.py:73-106 module tree)."""
    c = Converter(sd)
    # audio stream: AudioFormer.audio_model(.resnet) + au_head
    c.resnet18("audio_model.audio_model.resnet", "audio_model/audio_model/resnet")
    c.au_former("audio_model.au_head", "audio_model/au_head")
    # visual stream: VisualFormer.video_model(.video_model) + au_head
    c.video_model("video_model.video_model", "video_model/video_model")
    c.au_former("video_model.au_head", "video_model/au_head")
    # fusion head (reconstructed former_AU_head, SURVEY §2.4-1)
    c.former_au_head("au_head", "au_head", depth=3)
    return c.result()


def convert_vformer(sd: Mapping[str, np.ndarray]) -> dict:
    """VisualFormer (vformer.py:358-405) checkpoints; accepts the
    base_model->s_former rename the reference applies on load."""
    sd = rename_keys(sd, [("base_model.", "s_former.")])
    c = Converter(sd)
    c.video_model("video_model", "video_model")
    # fc Sequential: BN1d, Linear, BN1d, Linear (vformer.py:368-373)
    c.batchnorm("fc.0", "fc/bn1/bn")
    c.linear("fc.1", "fc/fc1")
    c.batchnorm("fc.2", "fc/bn2/bn")
    c.linear("fc.3", "fc/fc2")
    return c.result()


def convert_audio_only(sd: Mapping[str, np.ndarray]) -> dict:
    c = Converter(sd)
    c.resnet18("audio_model.resnet", "audio_model/resnet")
    c.au_former("au_head", "au_head")
    return c.result()


CONVERTERS = {
    "avformer": convert_avformer,
    "vformer": convert_vformer,
    "audio": convert_audio_only,
}


def convert_checkpoint(model_name: str, sd: Mapping[str, np.ndarray]) -> dict:
    if model_name not in CONVERTERS:
        raise NotImplementedError(
            f"no .pth converter for {model_name}; available: "
            f"{sorted(CONVERTERS)}")
    return CONVERTERS[model_name](sd)


def merge_into(variables: dict, converted: dict) -> dict:
    """Overlay converted params/batch_stats onto an init tree
    (strict=False load semantics: missing keys keep init values)."""
    import jax

    def overlay(dst, src):
        if not isinstance(dst, dict):
            return src if src is not None else dst
        out = {}
        for k, v in dst.items():
            if isinstance(src, dict) and k in src:
                out[k] = overlay(v, src[k])
            else:
                out[k] = v
        return out

    return {
        "params": overlay(variables["params"], converted.get("params", {})),
        "batch_stats": overlay(variables.get("batch_stats", {}),
                               converted.get("batch_stats", {})),
    }
