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


def _mlp_head(c: Converter, tpre: str, jpre: str) -> None:
    """BN-Linear-BN-Linear Sequential -> MLPHead (vformer.py:368-373;
    identical heads in sformer.py:351-356, tformer.py:415-420,
    dual_sformer.py:294-299, van.py:344-349)."""
    c.batchnorm(f"{tpre}.0", f"{jpre}/bn1/bn")
    c.linear(f"{tpre}.1", f"{jpre}/fc1")
    c.batchnorm(f"{tpre}.2", f"{jpre}/bn2/bn")
    c.linear(f"{tpre}.3", f"{jpre}/fc2")


def convert_resnet_image(sd: Mapping[str, np.ndarray]) -> dict:
    """ImageResNetModel (resnet.py:16-80): torchvision resnet18 trunk +
    fc Sequential(Dropout, Linear) -> fc.1."""
    c = Converter(sd)
    c.resnet18("base_model", "base_model")
    c.linear("fc.1", "fc")
    return c.result()


def convert_sformer(sd: Mapping[str, np.ndarray]) -> dict:
    """SpatialFormer (sformer.py:338-449): base_model ResFormer + BN-MLP fc
    + AU_former/VA_former heads. Accepts raw trunk checkpoints via the
    base_model rename the reference's load_pretrain applies."""
    c = Converter(sd)
    c.resformer("base_model", "base_model")
    _mlp_head(c, "fc", "fc")
    c.au_former("au_head", "au_head")
    c.va_former("va_head", "va_head")
    return c.result()


def convert_tformer(sd: Mapping[str, np.ndarray]) -> dict:
    """SpatialTemporalFormer (tformer.py:405-455): video_model
    (s_former + per-frame AU_former + dim-1536 TFormer) + BN-MLP fc +
    depth-3 tformer_AU_head."""
    sd = rename_keys(sd, [("base_model.", "s_former.")])
    c = Converter(sd)
    c.resformer("video_model.s_former", "video_model/s_former")
    c.au_former("video_model.au_head", "video_model/au_head")
    c.tformer("video_model.t_former", "video_model/t_former", depth=3)
    _mlp_head(c, "fc", "fc")
    c.former_au_head("au_head", "au_head", depth=3)
    return c.result()


def convert_dsformer(sd: Mapping[str, np.ndarray]) -> dict:
    """DualSpatialFormer (dual_sformer.py:279-365): RGB + 1-channel mask
    ResFormer twins, summed features, BN-MLP fc."""
    c = Converter(sd)
    c.resformer("rgb_model", "rgb_model")
    c.resformer("mask_model", "mask_model")
    _mlp_head(c, "fc", "fc")
    return c.result()


_VAN_DEPTHS = (3, 3, 12, 3)  # van_base (van.py:320-328)


def convert_van(sd: Mapping[str, np.ndarray]) -> dict:
    """SpatialVAN (van.py:330-438): van_base backbone (HuggingFace weights,
    van.py:291-308 layout) + BN-MLP fc + AU_former. All VAN convs carry
    biases (nn.Conv2d defaults, van.py:27-99)."""
    c = Converter(sd)
    b, j = "base_model", "base_model"
    for i in range(4):
        pe, pj = f"{b}.patch_embed{i + 1}", f"{j}/patch_embed{i + 1}"
        c.conv2d(f"{pe}.proj", f"{pj}/proj", bias=True)
        c.batchnorm(f"{pe}.norm", f"{pj}/norm/bn")
        for bi in range(_VAN_DEPTHS[i]):
            tb = f"{b}.block{i + 1}.{bi}"
            jb = f"{j}/block{i + 1}_{bi}"
            c.batchnorm(f"{tb}.norm1", f"{jb}/norm1/bn")
            g = f"{tb}.attn.spatial_gating_unit"
            gj = f"{jb}/attn/spatial_gating_unit"
            c.conv2d(f"{tb}.attn.proj_1", f"{jb}/attn/proj_1", bias=True)
            c.conv2d(f"{g}.conv0", f"{gj}/conv0", bias=True)
            c.conv2d(f"{g}.conv_spatial", f"{gj}/conv_spatial", bias=True)
            c.conv2d(f"{g}.conv1", f"{gj}/conv1", bias=True)
            c.conv2d(f"{tb}.attn.proj_2", f"{jb}/attn/proj_2", bias=True)
            c.batchnorm(f"{tb}.norm2", f"{jb}/norm2/bn")
            c.conv2d(f"{tb}.mlp.fc1", f"{jb}/mlp/fc1", bias=True)
            c.conv2d(f"{tb}.mlp.dwconv.dwconv", f"{jb}/mlp/dwconv/dwconv",
                     bias=True)
            c.conv2d(f"{tb}.mlp.fc2", f"{jb}/mlp/fc2", bias=True)
            c.raw(f"{tb}.layer_scale_1", f"{jb}/layer_scale_1")
            c.raw(f"{tb}.layer_scale_2", f"{jb}/layer_scale_2")
        c.layernorm(f"{b}.norm{i + 1}", f"{j}/norm{i + 1}")
    _mlp_head(c, "fc", "fc")
    c.au_former("au_head", "au_head")
    return c.result()


_I3D_SINGLE = ("Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3")
_I3D_MIXED = ("Mixed_3b", "Mixed_3c", "Mixed_4b", "Mixed_4c", "Mixed_4d",
              "Mixed_4e", "Mixed_4f", "Mixed_5b", "Mixed_5c")


def _unit3d(c: Converter, tpre: str, jpre: str) -> None:
    """Unit3D: conv3d (no bias) + bn (i3d.py:55-125)."""
    c.conv3d(f"{tpre}.conv3d", f"{jpre}/conv3d")
    c.batchnorm(f"{tpre}.bn", f"{jpre}/bn")


def convert_i3d(sd: Mapping[str, np.ndarray]) -> dict:
    """VisualI3DModel (i3d.py:356-403): InceptionI3d endpoint modules
    (i3d.py:172-295 naming via add_module) + fc Sequential
    (Linear, BN1d, Linear). The unused 'logits' Unit3D is ignored."""
    c = Converter(sd)
    v, j = "video_model", "video_model"
    for ep in _I3D_SINGLE:
        _unit3d(c, f"{v}.{ep}", f"{j}/{ep}")
    for ep in _I3D_MIXED:
        for br in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            _unit3d(c, f"{v}.{ep}.{br}", f"{j}/{ep}/{br}")
    c.linear("fc.0", "fc1")
    c.batchnorm("fc.1", "fc_bn")
    c.linear("fc.2", "fc2")
    return c.result()


def convert_mc3d(sd: Mapping[str, np.ndarray]) -> dict:
    """VisualMC3DModel (mc3d.py:37-83): torchvision mc3_18 (stem Sequential
    + BasicBlock conv Sequentials: conv{1,2}.0 conv / .1 bn) + fc
    Sequential(Linear, BN1d, Linear)."""
    c = Converter(sd)
    v, j = "video_model", "video_model"
    c.conv3d(f"{v}.stem.0", f"{j}/stem_conv")
    c.batchnorm(f"{v}.stem.1", f"{j}/stem_bn")
    for li in range(1, 5):
        for bi in range(2):
            tb = f"{v}.layer{li}.{bi}"
            jb = f"{j}/layer{li}_block{bi}"
            c.conv3d(f"{tb}.conv1.0", f"{jb}/conv1")
            c.batchnorm(f"{tb}.conv1.1", f"{jb}/bn1")
            c.conv3d(f"{tb}.conv2.0", f"{jb}/conv2")
            c.batchnorm(f"{tb}.conv2.1", f"{jb}/bn2")
            if f"{tb}.downsample.0.weight" in c.sd:
                c.conv3d(f"{tb}.downsample.0", f"{jb}/ds_conv")
                c.batchnorm(f"{tb}.downsample.1", f"{jb}/ds_bn")
    c.linear("fc.0", "fc1")
    c.batchnorm("fc.1", "fc_bn")
    c.linear("fc.2", "fc2")
    return c.result()


_VGG_LAYERS = ((64, 3), (128, 4), (256, 6), (512, 3))  # resnet50


def _vgg_trunk(c: Converter, tpre: str, jpre: str) -> None:
    """VGGFace2_extractor resnet50 (vggformer.py:62-115)."""
    c.conv2d(f"{tpre}.conv1", f"{jpre}/conv1")
    c.batchnorm(f"{tpre}.bn1", f"{jpre}/bn1/bn")
    for li, (_planes, blocks) in enumerate(_VGG_LAYERS):
        for bi in range(blocks):
            tb = f"{tpre}.layer{li + 1}.{bi}"
            jb = f"{jpre}/layer{li + 1}_block{bi}"
            for cn in ("conv1", "conv2", "conv3"):
                c.conv2d(f"{tb}.{cn}", f"{jb}/{cn}")
            for bn in ("bn1", "bn2", "bn3"):
                c.batchnorm(f"{tb}.{bn}", f"{jb}/{bn}/bn")
            if f"{tb}.downsample.0.weight" in c.sd:
                c.conv2d(f"{tb}.downsample.0", f"{jb}/ds_conv")
                c.batchnorm(f"{tb}.downsample.1", f"{jb}/ds_bn/bn")


def convert_vggformer(sd: Mapping[str, np.ndarray]) -> dict:
    """VGGVisualFormer (vggformer.py:364-420): video_model(s_former
    VGGFormer + t_former TFormer) — flattened to s_former/t_former in the
    flax tree — + fc Sequential(Linear, BN1d, ReLU, Linear)."""
    c = Converter(sd)
    s = "video_model.s_former"
    _vgg_trunk(c, f"{s}.VGG_model", "s_former/VGG_model")
    c.conv2d(f"{s}.conv", "s_former/conv")
    c.raw(f"{s}.pos_embedding", "s_former/pos_embedding")
    c.transformer(f"{s}.spatial_transformer", "s_former/spatial_transformer",
                  depth=1)
    c.tformer("video_model.t_former", "t_former", depth=3)
    c.linear("fc.0", "fc1")
    c.batchnorm("fc.1", "fc_bn/bn")
    c.linear("fc.3", "fc2")
    return c.result()


def _emonet_convblock(c: Converter, tpre: str, jpre: str) -> None:
    """EmoNet ConvBlock (emonet.py:18-60): 3 bias-free 3x3 convs +
    optional downsample Sequential(IN, ReLU, Conv1x1) -> .2."""
    c.conv2d(f"{tpre}.conv1", f"{jpre}/conv1")
    c.conv2d(f"{tpre}.conv2", f"{jpre}/conv2")
    c.conv2d(f"{tpre}.conv3", f"{jpre}/conv3")
    if f"{tpre}.downsample.2.weight" in c.sd:
        c.conv2d(f"{tpre}.downsample.2", f"{jpre}/downsample")


def convert_emonet(sd: Mapping[str, np.ndarray]) -> dict:
    """ImageEmoNetModel (emonet.py:218-286): base_model EmoNet — FAN stem +
    2 hourglass modules + attention emo branch + emo_fc_2 Sequential +
    AU_former(input_dim=256). InstanceNorms are affine-free (no params)."""
    c = Converter(sd)
    b = "base_model"
    c.conv2d(f"{b}.conv1", f"{b}/conv1", bias=True)
    for name in ("conv2", "conv3", "conv4"):
        _emonet_convblock(c, f"{b}.{name}", f"{b}/{name}")
    for i in range(2):  # num_modules=2 (emonet.py:121)
        for lv in (4, 3, 2, 1):
            for stem in ("b1", "b2", "b3"):
                _emonet_convblock(c, f"{b}.m{i}.{stem}_{lv}",
                                  f"{b}/m{i}/{stem}_{lv}")
        _emonet_convblock(c, f"{b}.m{i}.b2_plus_1", f"{b}/m{i}/b2_plus_1")
        _emonet_convblock(c, f"{b}.top_m_{i}", f"{b}/top_m_{i}")
        c.conv2d(f"{b}.conv_last{i}", f"{b}/conv_last{i}", bias=True)
        c.conv2d(f"{b}.l{i}", f"{b}/l{i}", bias=True)
        if i < 1:
            c.conv2d(f"{b}.bl{i}", f"{b}/bl{i}", bias=True)
            c.conv2d(f"{b}.al{i}", f"{b}/al{i}", bias=True)
    c.conv2d(f"{b}.conv1x1_input_emo_2", f"{b}/conv1x1_input_emo_2",
             bias=True)
    for bi in range(4):  # emo_net_2 = [ConvBlock, MaxPool] x 4
        _emonet_convblock(c, f"{b}.emo_net_2.{2 * bi}",
                          f"{b}/emo_convs_{bi}")
    c.linear(f"{b}.emo_fc_2.0", f"{b}/emo_fc_1")
    c.batchnorm(f"{b}.emo_fc_2.1", f"{b}/emo_fc_bn")
    c.linear(f"{b}.emo_fc_2.3", f"{b}/emo_fc_2")
    c.au_former(f"{b}.au_head", f"{b}/au_head")
    return c.result()


def convert_tsav(sd: Mapping[str, np.ndarray]) -> dict:
    """TwoStreamAuralVisualModel (tsav.py:65-143): r2plus1d_18 video stream
    (torchvision Conv2Plus1D Sequential naming: conv{1,2}.0.{0,1,3}) +
    1-channel resnet18 audio stream + fc Sequential(Dropout, Linear)."""
    c = Converter(sd)
    c.resnet18("audio_model.resnet", "audio_model/resnet")
    t, j = "video_model.r2plus1d", "video_model"
    c.conv3d(f"{t}.stem.0", f"{j}/stem_s")
    c.batchnorm(f"{t}.stem.1", f"{j}/stem_bn1")
    c.conv3d(f"{t}.stem.3", f"{j}/stem_t")
    c.batchnorm(f"{t}.stem.4", f"{j}/stem_bn2")
    for li in range(1, 5):
        for bi in range(2):
            tb = f"{t}.layer{li}.{bi}"
            jb = f"{j}/layer{li}_block{bi}"
            for cn in ("conv1", "conv2"):
                c.conv3d(f"{tb}.{cn}.0.0", f"{jb}/{cn}_s")
                c.batchnorm(f"{tb}.{cn}.0.1", f"{jb}/{cn}_bn_mid")
                c.conv3d(f"{tb}.{cn}.0.3", f"{jb}/{cn}_t")
            c.batchnorm(f"{tb}.conv1.1", f"{jb}/bn1")
            c.batchnorm(f"{tb}.conv2.1", f"{jb}/bn2")
            if f"{tb}.downsample.0.weight" in c.sd:
                c.conv3d(f"{tb}.downsample.0", f"{jb}/ds_conv")
                c.batchnorm(f"{tb}.downsample.1", f"{jb}/ds_bn")
    c.linear("fc.1", "fc")
    return c.result()


CONVERTERS = {
    "avformer": convert_avformer,
    "vformer": convert_vformer,
    "audio": convert_audio_only,
    "resnet": convert_resnet_image,
    "sformer": convert_sformer,
    "tformer": convert_tformer,
    "dsformer": convert_dsformer,
    "van": convert_van,
    "i3d": convert_i3d,
    "mc3d": convert_mc3d,
    "vggformer": convert_vggformer,
    "emonet": convert_emonet,
    "tsav": convert_tsav,
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
