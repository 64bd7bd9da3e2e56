"""Zoo-wide checkpoint-converter parity (VERDICT.md round-1 item 3).

Same methodology as test_torch_import.py: a random state dict in the exact
reference parameter naming is evaluated with torch.nn.functional (golden),
converted with core.torch_import, and the flax model must reproduce the
logits (<=1e-4 f32). Covers the 10 zoo models beyond
avformer/vformer/audio: resnet, sformer, dsformer, tformer, van, i3d,
mc3d, vggformer, emonet, tsav.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from auformer.core.config import Config
from auformer.core.torch_import import convert_checkpoint, merge_into
from auformer.nn import init_model

from test_torch_import import (
    RS, t, golden_bn, golden_transformer_hd, make_transformer_sd,
    make_au_former_sd, golden_au_former, golden_resnet18_trunk,
    golden_resformer, golden_tformer, golden_block,
)


@pytest.fixture(autouse=True)
def _reseed():
    """test_torch_import's module-global RandomState advances with every
    t() call, so sd draws would depend on which tests ran first; reseed
    per test for order-independent (and tolerance-stable) arrays."""
    RS.seed(20260816)


def conditioned(sd):
    """Rescale every weight matrix/filter to ~unit layer gain so deep
    random networks keep O(1) intermediates — without this the trunk
    outputs reach 1e5 and f32 cancellation noise swamps tight parity
    tolerances (the conversion itself is exact either way)."""
    for k, v in sd.items():
        if k.endswith(".weight") and v.ndim >= 2:
            fan_in = int(np.prod(v.shape[1:]))
            sd[k] = (v / (0.1 * np.sqrt(fan_in)) * 0.5).astype(np.float32)
    return sd


def w(sd, k):
    return torch.from_numpy(sd[k + ".weight"])


def bb(sd, k):
    v = sd.get(k + ".bias")
    return torch.from_numpy(v) if v is not None else None


def make_resnet18_sd(sd, p, in_ch):
    """torchvision resnet18 trunk naming (same as the avformer fixture)."""
    sd[f"{p}.conv1.weight"] = t(64, in_ch, 7, 7)
    sd[f"{p}.bn1.weight"] = t(64) + 1
    sd[f"{p}.bn1.bias"] = t(64)
    sd[f"{p}.bn1.running_mean"] = t(64)
    sd[f"{p}.bn1.running_var"] = np.abs(t(64)) + 1
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        for bi in range(2):
            bp = f"{p}.layer{li}.{bi}"
            c1_in = cin if bi == 0 else cout
            sd[f"{bp}.conv1.weight"] = t(cout, c1_in, 3, 3)
            sd[f"{bp}.conv2.weight"] = t(cout, cout, 3, 3)
            for bn in ("bn1", "bn2"):
                sd[f"{bp}.{bn}.weight"] = t(cout) + 1
                sd[f"{bp}.{bn}.bias"] = t(cout)
                sd[f"{bp}.{bn}.running_mean"] = t(cout)
                sd[f"{bp}.{bn}.running_var"] = np.abs(t(cout)) + 1
            if bi == 0 and cin != cout:
                sd[f"{bp}.downsample.0.weight"] = t(cout, cin, 1, 1)
                sd[f"{bp}.downsample.1.weight"] = t(cout) + 1
                sd[f"{bp}.downsample.1.bias"] = t(cout)
                sd[f"{bp}.downsample.1.running_mean"] = t(cout)
                sd[f"{bp}.downsample.1.running_var"] = np.abs(t(cout)) + 1


def make_resformer_sd(sd, p, in_ch=3):
    """ResFormer = resnet18 trunk + 49-token dim-256 spatial transformer
    (vformer.py:168-268 / sformer.py:236-336)."""
    make_resnet18_sd(sd, p, in_ch)
    sd[f"{p}.pos_embedding"] = t(1, 49, 256)
    sd.update(make_transformer_sd(f"{p}.spatial_transformer", 1, 256, 512))


def make_mlp_head_sd(sd, p, in_f=512):
    """fc Sequential(BN, Linear(in_f,256), BN, Linear(256,21))."""
    sd[f"{p}.0.weight"] = t(in_f) + 1
    sd[f"{p}.0.bias"] = t(in_f)
    sd[f"{p}.0.running_mean"] = t(in_f)
    sd[f"{p}.0.running_var"] = np.abs(t(in_f)) + 1
    sd[f"{p}.1.weight"] = t(256, in_f)
    sd[f"{p}.1.bias"] = t(256)
    sd[f"{p}.2.weight"] = t(256) + 1
    sd[f"{p}.2.bias"] = t(256)
    sd[f"{p}.2.running_mean"] = t(256)
    sd[f"{p}.2.running_var"] = np.abs(t(256)) + 1
    sd[f"{p}.3.weight"] = t(21, 256)
    sd[f"{p}.3.bias"] = t(21)


def golden_mlp_head(x, sd, p):
    h = golden_bn(x, sd, f"{p}.0")
    h = h @ w(sd, f"{p}.1").T + bb(sd, f"{p}.1")
    h = golden_bn(h, sd, f"{p}.2")
    return h @ w(sd, f"{p}.3").T + bb(sd, f"{p}.3")


def apply_converted(cfg, sd, x):
    """convert -> merge into a fresh init -> forward, returns (B, out) np."""
    model, variables = init_model(cfg)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        convert_checkpoint(cfg.model_name, sd))
    out = model.apply({"params": merged["params"],
                       "batch_stats": merged["batch_stats"]},
                      x, train=False)
    return np.asarray(out)


def nchw(x):
    return np.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# resnet / sformer / dsformer / tformer (ResFormer family)
# ---------------------------------------------------------------------------

def test_resnet_image_conversion_parity():
    sd = {}
    make_resnet18_sd(sd, "base_model", 3)
    sd["fc.1.weight"] = t(21, 512)
    sd["fc.1.bias"] = t(21)

    conditioned(sd)
    x = t(2, 3, 32, 32, scale=1.0)
    feats = golden_resnet18_trunk(torch.from_numpy(x), sd,
                                  "base_model").mean(dim=(2, 3))
    golden = (feats @ w(sd, "fc.1").T + bb(sd, "fc.1")).numpy()

    cfg = Config(model_name="resnet", modality="V", task="AU", n_frames=1,
                 image_size=32, compute_dtype="float32", use_pallas=False)
    ours = apply_converted(cfg, sd, {"clip": nchw(x)[:, None]})
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_sformer_conversion_parity():
    sd = {}
    make_resformer_sd(sd, "base_model")
    make_mlp_head_sd(sd, "fc")
    sd.update(make_au_former_sd("au_head"))
    conditioned(sd)

    x = t(2, 3, 32, 32, scale=1.0)
    feats = golden_resformer(torch.from_numpy(x), sd, "base_model")
    out = golden_mlp_head(feats, sd, "fc")
    au, _ = golden_au_former(feats.numpy(), sd, "au_head")
    golden = out.numpy().copy()
    golden[:, :12] = au

    cfg = Config(model_name="sformer", modality="V", task="AU", n_frames=1,
                 image_size=32, compute_dtype="float32", use_pallas=False)
    ours = apply_converted(cfg, sd, {"clip": nchw(x)[:, None]})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


def test_dsformer_conversion_parity():
    sd = {}
    make_resformer_sd(sd, "rgb_model", 3)
    make_resformer_sd(sd, "mask_model", 1)
    make_mlp_head_sd(sd, "fc")
    conditioned(sd)

    rgb = t(2, 3, 32, 32, scale=1.0)
    mask = t(2, 1, 32, 32, scale=1.0)
    f_rgb = golden_resformer(torch.from_numpy(rgb), sd, "rgb_model")
    f_mask = golden_resformer(torch.from_numpy(mask), sd, "mask_model")
    golden = golden_mlp_head(f_rgb + f_mask, sd, "fc").numpy()

    cfg = Config(model_name="dsformer", modality="V;M", task="AU",
                 n_frames=1, image_size=32, compute_dtype="float32",
                 use_pallas=False)
    clip = np.concatenate([nchw(rgb), nchw(mask)], axis=-1)[:, None]
    ours = apply_converted(cfg, sd, {"clip": clip})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


def golden_former_au_head(feats, sd, p, emb, depth):
    """tformer_AU_head (tformer.py:362-403): 12-token pos-embedded
    transformer + 12 bias-free per-AU linears."""
    z = feats.reshape(feats.shape[0], 12, emb)
    z = z + torch.from_numpy(sd[f"{p}.pos_embedding"])[:, :12]
    z = golden_transformer_hd(z, sd, f"{p}.corr_transformer", depth, 8, 32)
    return torch.cat(
        [z[:, i - 1] @ torch.from_numpy(
            sd[f"{p}.AU_linear_last{i}.weight"]).T
         for i in range(1, 13)], dim=1)


def test_tformer_conversion_parity():
    b, tt = 2, 4
    sd = {}
    make_resformer_sd(sd, "video_model.s_former")
    sd.update(make_au_former_sd("video_model.au_head"))
    dim = 12 * 128
    sd["video_model.t_former.cls_token"] = t(1, 1, dim)
    sd["video_model.t_former.pos_embedding"] = t(1, tt + 1, dim)
    sd.update(make_transformer_sd(
        "video_model.t_former.spatial_transformer", 3, dim, 1024, inner=512))
    make_mlp_head_sd(sd, "fc", in_f=dim)
    sd["au_head.pos_embedding"] = t(1, 12, 128)
    sd.update(make_transformer_sd("au_head.corr_transformer", 3, 128, 256))
    for i in range(1, 13):
        sd[f"au_head.AU_linear_last{i}.weight"] = t(1, 128)
    conditioned(sd)

    clip = t(b, tt, 3, 32, 32, scale=1.0)        # (B, T, C, H, W)
    frames = torch.from_numpy(clip).reshape(b * tt, 3, 32, 32)
    v = golden_resformer(frames, sd, "video_model.s_former")
    _, tokens = golden_au_former(v.numpy(), sd, "video_model.au_head")
    per_frame = torch.from_numpy(tokens).reshape(b, tt, dim)
    feats = golden_tformer(per_frame, sd, "video_model.t_former")
    out = golden_mlp_head(feats, sd, "fc")
    au = golden_former_au_head(feats, sd, "au_head", 128, 3)
    golden = out.numpy().copy()
    golden[:, :12] = au.numpy()

    cfg = Config(model_name="tformer", modality="V", task="AU", n_frames=tt,
                 image_size=32, compute_dtype="float32", use_pallas=False)
    clip_nhwc = np.transpose(clip, (0, 1, 3, 4, 2))
    ours = apply_converted(cfg, sd, {"clip": clip_nhwc})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)

# ---------------------------------------------------------------------------
# van
# ---------------------------------------------------------------------------

_VAN_DIMS = (64, 128, 320, 512)
_VAN_DEPTHS = (3, 3, 12, 3)
_VAN_RATIOS = (8, 8, 4, 4)


def make_van_sd(sd, p="base_model"):
    """van_base naming (van.py:182-267; HF layout per van.py:291-308)."""
    in_ch = 3
    for i, (dim, depth, ratio) in enumerate(
            zip(_VAN_DIMS, _VAN_DEPTHS, _VAN_RATIOS)):
        pe = f"{p}.patch_embed{i + 1}"
        k = 7 if i == 0 else 3
        sd[f"{pe}.proj.weight"] = t(dim, in_ch, k, k)
        sd[f"{pe}.proj.bias"] = t(dim)
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{pe}.norm.{s}"] = (np.abs(t(dim)) + 1 if s == "running_var"
                                    else t(dim) + (1 if s == "weight" else 0))
        for bi in range(depth):
            b = f"{p}.block{i + 1}.{bi}"
            for nm in ("norm1", "norm2"):
                sd[f"{b}.{nm}.weight"] = t(dim) + 1
                sd[f"{b}.{nm}.bias"] = t(dim)
                sd[f"{b}.{nm}.running_mean"] = t(dim)
                sd[f"{b}.{nm}.running_var"] = np.abs(t(dim)) + 1
            a = f"{b}.attn"
            sd[f"{a}.proj_1.weight"] = t(dim, dim, 1, 1)
            sd[f"{a}.proj_1.bias"] = t(dim)
            g = f"{a}.spatial_gating_unit"
            sd[f"{g}.conv0.weight"] = t(dim, 1, 5, 5)
            sd[f"{g}.conv0.bias"] = t(dim)
            sd[f"{g}.conv_spatial.weight"] = t(dim, 1, 7, 7)
            sd[f"{g}.conv_spatial.bias"] = t(dim)
            sd[f"{g}.conv1.weight"] = t(dim, dim, 1, 1)
            sd[f"{g}.conv1.bias"] = t(dim)
            sd[f"{a}.proj_2.weight"] = t(dim, dim, 1, 1)
            sd[f"{a}.proj_2.bias"] = t(dim)
            hid = int(dim * ratio)
            m = f"{b}.mlp"
            sd[f"{m}.fc1.weight"] = t(hid, dim, 1, 1)
            sd[f"{m}.fc1.bias"] = t(hid)
            sd[f"{m}.dwconv.dwconv.weight"] = t(hid, 1, 3, 3)
            sd[f"{m}.dwconv.dwconv.bias"] = t(hid)
            sd[f"{m}.fc2.weight"] = t(dim, hid, 1, 1)
            sd[f"{m}.fc2.bias"] = t(dim)
            sd[f"{b}.layer_scale_1"] = t(dim) * 0.1 + 0.01
            sd[f"{b}.layer_scale_2"] = t(dim) * 0.1 + 0.01
        sd[f"{p}.norm{i + 1}.weight"] = t(dim) + 1
        sd[f"{p}.norm{i + 1}.bias"] = t(dim)
        in_ch = dim


def golden_van(x, sd, p="base_model"):
    """Functional van_base forward (van.py:215-267, NCHW)."""
    h = x
    for i, (dim, depth) in enumerate(zip(_VAN_DIMS, _VAN_DEPTHS)):
        pe = f"{p}.patch_embed{i + 1}"
        k = 7 if i == 0 else 3
        stride = 4 if i == 0 else 2
        h = F.conv2d(h, w(sd, f"{pe}.proj"), bb(sd, f"{pe}.proj"),
                     stride=stride, padding=k // 2)
        h = golden_bn(h, sd, f"{pe}.norm")
        for bi in range(depth):
            b = f"{p}.block{i + 1}.{bi}"
            a, g, m = f"{b}.attn", f"{b}.attn.spatial_gating_unit", f"{b}.mlp"
            z = golden_bn(h, sd, f"{b}.norm1")
            y = F.conv2d(z, w(sd, f"{a}.proj_1"), bb(sd, f"{a}.proj_1"))
            y = F.gelu(y)
            u = y
            v = F.conv2d(y, w(sd, f"{g}.conv0"), bb(sd, f"{g}.conv0"),
                         padding=2, groups=dim)
            v = F.conv2d(v, w(sd, f"{g}.conv_spatial"),
                         bb(sd, f"{g}.conv_spatial"), padding=9, dilation=3,
                         groups=dim)
            v = F.conv2d(v, w(sd, f"{g}.conv1"), bb(sd, f"{g}.conv1"))
            y = u * v
            y = F.conv2d(y, w(sd, f"{a}.proj_2"), bb(sd, f"{a}.proj_2"))
            y = y + z                                   # attn residual
            h = h + torch.from_numpy(sd[f"{b}.layer_scale_1"]
                                     ).view(1, -1, 1, 1) * y
            z = golden_bn(h, sd, f"{b}.norm2")
            y = F.conv2d(z, w(sd, f"{m}.fc1"), bb(sd, f"{m}.fc1"))
            y = F.conv2d(y, w(sd, f"{m}.dwconv.dwconv"),
                         bb(sd, f"{m}.dwconv.dwconv"), padding=1,
                         groups=y.shape[1])
            y = F.gelu(y)
            y = F.conv2d(y, w(sd, f"{m}.fc2"), bb(sd, f"{m}.fc2"))
            h = h + torch.from_numpy(sd[f"{b}.layer_scale_2"]
                                     ).view(1, -1, 1, 1) * y
        bsz, c, hh, ww = h.shape
        tokens = h.flatten(2).transpose(1, 2)           # (B, N, C)
        tokens = F.layer_norm(tokens, (c,),
                              torch.from_numpy(sd[f"{p}.norm{i + 1}.weight"]),
                              torch.from_numpy(sd[f"{p}.norm{i + 1}.bias"]),
                              eps=1e-6)
        if i != 3:
            h = tokens.transpose(1, 2).reshape(bsz, c, hh, ww)
        else:
            h = tokens
    return h.mean(dim=1)                                # (B, 512)


def test_van_conversion_parity():
    sd = {}
    make_van_sd(sd)
    make_mlp_head_sd(sd, "fc")
    sd.update(make_au_former_sd("au_head"))
    conditioned(sd)

    x = t(2, 3, 64, 64, scale=1.0)
    feats = golden_van(torch.from_numpy(x), sd)
    out = golden_mlp_head(feats, sd, "fc")
    au, _ = golden_au_former(feats.numpy(), sd, "au_head")
    golden = out.numpy().copy()
    golden[:, :12] = au

    cfg = Config(model_name="van", modality="V", task="AU", n_frames=1,
                 image_size=64, compute_dtype="float32", use_pallas=False)
    ours = apply_converted(cfg, sd, {"clip": nchw(x)[:, None]})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)

# ---------------------------------------------------------------------------
# i3d / mc3d (3D conv families)
# ---------------------------------------------------------------------------

_I3D_MIXED_CFG = {
    "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
    "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
    "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
    "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
    "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
    "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
    "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
    "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
    "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
}


def _unit3d_sd(sd, p, in_ch, out_ch, k):
    sd[f"{p}.conv3d.weight"] = t(out_ch, in_ch, *k)
    sd[f"{p}.bn.weight"] = t(out_ch) + 1
    sd[f"{p}.bn.bias"] = t(out_ch)
    sd[f"{p}.bn.running_mean"] = t(out_ch)
    sd[f"{p}.bn.running_var"] = np.abs(t(out_ch)) + 1


def make_i3d_sd(sd, p="video_model"):
    _unit3d_sd(sd, f"{p}.Conv3d_1a_7x7", 3, 64, (7, 7, 7))
    _unit3d_sd(sd, f"{p}.Conv3d_2b_1x1", 64, 64, (1, 1, 1))
    _unit3d_sd(sd, f"{p}.Conv3d_2c_3x3", 64, 192, (3, 3, 3))
    for ep, (in_ch, oc) in _I3D_MIXED_CFG.items():
        _unit3d_sd(sd, f"{p}.{ep}.b0", in_ch, oc[0], (1, 1, 1))
        _unit3d_sd(sd, f"{p}.{ep}.b1a", in_ch, oc[1], (1, 1, 1))
        _unit3d_sd(sd, f"{p}.{ep}.b1b", oc[1], oc[2], (3, 3, 3))
        _unit3d_sd(sd, f"{p}.{ep}.b2a", in_ch, oc[3], (1, 1, 1))
        _unit3d_sd(sd, f"{p}.{ep}.b2b", oc[3], oc[4], (3, 3, 3))
        _unit3d_sd(sd, f"{p}.{ep}.b3b", in_ch, oc[5], (1, 1, 1))


def _same_pad_3d(x, kernel, stride):
    """TF-SAME pad for (B,C,T,H,W): pad so out = ceil(in/stride)
    (i3d.py:37-52,98-114 compute_pad)."""
    pads = []
    for d, (k, s) in enumerate(zip(kernel, stride)):
        n = x.shape[2 + d]
        pad = max(k - s, 0) if n % s == 0 else max(k - (n % s), 0)
        pads.append((pad // 2, pad - pad // 2))
    # F.pad wants last-dim-first: (Wl, Wr, Hl, Hr, Tl, Tr)
    flat = [v for ab in reversed(pads) for v in ab]
    return F.pad(x, flat)


def golden_unit3d(x, sd, p, k, stride=(1, 1, 1), relu=True):
    x = _same_pad_3d(x, k, stride)
    x = F.conv3d(x, torch.from_numpy(sd[f"{p}.conv3d.weight"]),
                 stride=stride)
    x = F.batch_norm(x, torch.from_numpy(sd[f"{p}.bn.running_mean"]),
                     torch.from_numpy(sd[f"{p}.bn.running_var"]),
                     torch.from_numpy(sd[f"{p}.bn.weight"]),
                     torch.from_numpy(sd[f"{p}.bn.bias"]),
                     training=False, eps=1e-3)
    return F.relu(x) if relu else x


def golden_i3d_maxpool(x, k, s):
    return F.max_pool3d(_same_pad_3d(x, k, s), k, stride=s)


def golden_i3d(x, sd, p="video_model"):
    h = golden_unit3d(x, sd, f"{p}.Conv3d_1a_7x7", (7, 7, 7), (2, 2, 2))
    h = golden_i3d_maxpool(h, (1, 3, 3), (1, 2, 2))
    h = golden_unit3d(h, sd, f"{p}.Conv3d_2b_1x1", (1, 1, 1))
    h = golden_unit3d(h, sd, f"{p}.Conv3d_2c_3x3", (3, 3, 3))
    h = golden_i3d_maxpool(h, (1, 3, 3), (1, 2, 2))

    def mixed(h, ep):
        b0 = golden_unit3d(h, sd, f"{ep}.b0", (1, 1, 1))
        b1 = golden_unit3d(h, sd, f"{ep}.b1a", (1, 1, 1))
        b1 = golden_unit3d(b1, sd, f"{ep}.b1b", (3, 3, 3))
        b2 = golden_unit3d(h, sd, f"{ep}.b2a", (1, 1, 1))
        b2 = golden_unit3d(b2, sd, f"{ep}.b2b", (3, 3, 3))
        b3 = golden_i3d_maxpool(h, (3, 3, 3), (1, 1, 1))
        b3 = golden_unit3d(b3, sd, f"{ep}.b3b", (1, 1, 1))
        return torch.cat([b0, b1, b2, b3], dim=1)

    h = mixed(h, f"{p}.Mixed_3b")
    h = mixed(h, f"{p}.Mixed_3c")
    h = golden_i3d_maxpool(h, (3, 3, 3), (2, 2, 2))
    for ep in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        h = mixed(h, f"{p}.{ep}")
    h = golden_i3d_maxpool(h, (2, 2, 2), (2, 2, 2))
    h = mixed(h, f"{p}.Mixed_5b")
    h = mixed(h, f"{p}.Mixed_5c")
    return h.mean(dim=(2, 3, 4))            # global (== [2,7,7] pool @112)


def make_linear_bn_linear_sd(sd, p, in_f):
    """fc Sequential(Linear(in_f,256), BN1d(256), Linear(256,21))
    (i3d.py:366-370, mc3d.py:47-51)."""
    sd[f"{p}.0.weight"] = t(256, in_f)
    sd[f"{p}.0.bias"] = t(256)
    sd[f"{p}.1.weight"] = t(256) + 1
    sd[f"{p}.1.bias"] = t(256)
    sd[f"{p}.1.running_mean"] = t(256)
    sd[f"{p}.1.running_var"] = np.abs(t(256)) + 1
    sd[f"{p}.2.weight"] = t(21, 256)
    sd[f"{p}.2.bias"] = t(21)


def golden_linear_bn_linear(x, sd, p):
    h = x @ w(sd, f"{p}.0").T + bb(sd, f"{p}.0")
    h = golden_bn(h, sd, f"{p}.1")
    return h @ w(sd, f"{p}.2").T + bb(sd, f"{p}.2")


def test_i3d_conversion_parity():
    sd = {}
    make_i3d_sd(sd)
    make_linear_bn_linear_sd(sd, "fc", 1024)
    conditioned(sd)

    tt = 16
    x = t(1, 3, tt, 64, 64, scale=1.0)       # (B, C, T, H, W)
    feats = golden_i3d(torch.from_numpy(x), sd)
    golden = golden_linear_bn_linear(feats, sd, "fc").numpy()

    cfg = Config(model_name="i3d", modality="V", task="AU", n_frames=tt,
                 image_size=64, compute_dtype="float32", use_pallas=False)
    clip = np.transpose(x, (0, 2, 3, 4, 1))  # (B, T, H, W, C)
    ours = apply_converted(cfg, sd, {"clip": clip})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


def make_mc3d_sd(sd, p="video_model"):
    """torchvision mc3_18 naming: stem Sequential + conv{1,2}.{0,1}."""
    sd[f"{p}.stem.0.weight"] = t(64, 3, 3, 7, 7)
    sd[f"{p}.stem.1.weight"] = t(64) + 1
    sd[f"{p}.stem.1.bias"] = t(64)
    sd[f"{p}.stem.1.running_mean"] = t(64)
    sd[f"{p}.stem.1.running_var"] = np.abs(t(64)) + 1
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        k = (3, 3, 3) if li == 1 else (1, 3, 3)
        for bi in range(2):
            bp = f"{p}.layer{li}.{bi}"
            c1_in = cin if bi == 0 else cout
            sd[f"{bp}.conv1.0.weight"] = t(cout, c1_in, *k)
            sd[f"{bp}.conv2.0.weight"] = t(cout, cout, *k)
            for bn in ("conv1.1", "conv2.1"):
                sd[f"{bp}.{bn}.weight"] = t(cout) + 1
                sd[f"{bp}.{bn}.bias"] = t(cout)
                sd[f"{bp}.{bn}.running_mean"] = t(cout)
                sd[f"{bp}.{bn}.running_var"] = np.abs(t(cout)) + 1
            if bi == 0 and cin != cout:
                sd[f"{bp}.downsample.0.weight"] = t(cout, cin, 1, 1, 1)
                sd[f"{bp}.downsample.1.weight"] = t(cout) + 1
                sd[f"{bp}.downsample.1.bias"] = t(cout)
                sd[f"{bp}.downsample.1.running_mean"] = t(cout)
                sd[f"{bp}.downsample.1.running_var"] = np.abs(t(cout)) + 1


def golden_mc3d(x, sd, p="video_model"):
    h = F.conv3d(x, torch.from_numpy(sd[f"{p}.stem.0.weight"]),
                 stride=(1, 2, 2), padding=(1, 3, 3))
    h = F.relu(golden_bn(h, sd, f"{p}.stem.1"))
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        k = (3, 3, 3) if li == 1 else (1, 3, 3)
        pad = tuple(kk // 2 for kk in k)
        stride1 = (1, 1, 1) if li == 1 else (1, 2, 2)
        if li == 1:
            stride1 = (1, 1, 1)
        for bi in range(2):
            bp = f"{p}.layer{li}.{bi}"
            s = stride1 if bi == 0 else (1, 1, 1)
            idn = h
            o = F.conv3d(h, torch.from_numpy(sd[f"{bp}.conv1.0.weight"]),
                         stride=s, padding=pad)
            o = F.relu(golden_bn(o, sd, f"{bp}.conv1.1"))
            o = F.conv3d(o, torch.from_numpy(sd[f"{bp}.conv2.0.weight"]),
                         padding=pad)
            o = golden_bn(o, sd, f"{bp}.conv2.1")
            if f"{bp}.downsample.0.weight" in sd:
                idn = F.conv3d(h, torch.from_numpy(
                    sd[f"{bp}.downsample.0.weight"]), stride=s)
                idn = golden_bn(idn, sd, f"{bp}.downsample.1")
            h = F.relu(o + idn)
    return h.mean(dim=(2, 3, 4))


def test_mc3d_conversion_parity():
    sd = {}
    make_mc3d_sd(sd)
    make_linear_bn_linear_sd(sd, "fc", 512)
    conditioned(sd)

    tt = 4
    x = t(2, 3, tt, 32, 32, scale=1.0)
    feats = golden_mc3d(torch.from_numpy(x), sd)
    golden = golden_linear_bn_linear(feats, sd, "fc").numpy()

    cfg = Config(model_name="mc3d", modality="V", task="AU", n_frames=tt,
                 image_size=32, compute_dtype="float32", use_pallas=False)
    clip = np.transpose(x, (0, 2, 3, 4, 1))
    ours = apply_converted(cfg, sd, {"clip": clip})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)

# ---------------------------------------------------------------------------
# vggformer
# ---------------------------------------------------------------------------

_VGG_LAYERS = ((64, 3), (128, 4), (256, 6), (512, 3))


def make_vgg_trunk_sd(sd, p):
    """VGGFace2_extractor resnet50 naming (vggformer.py:62-115)."""
    sd[f"{p}.conv1.weight"] = t(64, 3, 7, 7)
    for s, v in (("weight", t(64) + 1), ("bias", t(64)),
                 ("running_mean", t(64)),
                 ("running_var", np.abs(t(64)) + 1)):
        sd[f"{p}.bn1.{s}"] = v
    in_p = 64
    for li, (planes, blocks) in enumerate(_VGG_LAYERS):
        for bi in range(blocks):
            bp = f"{p}.layer{li + 1}.{bi}"
            cin = in_p if bi == 0 else planes * 4
            sd[f"{bp}.conv1.weight"] = t(planes, cin, 1, 1)
            sd[f"{bp}.conv2.weight"] = t(planes, planes, 3, 3)
            sd[f"{bp}.conv3.weight"] = t(planes * 4, planes, 1, 1)
            for bn, ch in (("bn1", planes), ("bn2", planes),
                           ("bn3", planes * 4)):
                sd[f"{bp}.{bn}.weight"] = t(ch) + 1
                sd[f"{bp}.{bn}.bias"] = t(ch)
                sd[f"{bp}.{bn}.running_mean"] = t(ch)
                sd[f"{bp}.{bn}.running_var"] = np.abs(t(ch)) + 1
            if bi == 0:
                sd[f"{bp}.downsample.0.weight"] = t(planes * 4, cin, 1, 1)
                sd[f"{bp}.downsample.1.weight"] = t(planes * 4) + 1
                sd[f"{bp}.downsample.1.bias"] = t(planes * 4)
                sd[f"{bp}.downsample.1.running_mean"] = t(planes * 4)
                sd[f"{bp}.downsample.1.running_var"] = (
                    np.abs(t(planes * 4)) + 1)
        in_p = planes * 4


def golden_vgg_trunk(x, sd, p):
    h = F.conv2d(x, torch.from_numpy(sd[f"{p}.conv1.weight"]), stride=2,
                 padding=3)
    h = F.relu(golden_bn(h, sd, f"{p}.bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=0, ceil_mode=True)
    for li, (planes, blocks) in enumerate(_VGG_LAYERS):
        stride = 1 if li == 0 else 2
        for bi in range(blocks):
            bp = f"{p}.layer{li + 1}.{bi}"
            s = stride if bi == 0 else 1
            idn = h
            o = F.conv2d(h, torch.from_numpy(sd[f"{bp}.conv1.weight"]),
                         stride=s)
            o = F.relu(golden_bn(o, sd, f"{bp}.bn1"))
            o = F.conv2d(o, torch.from_numpy(sd[f"{bp}.conv2.weight"]),
                         padding=1)
            o = F.relu(golden_bn(o, sd, f"{bp}.bn2"))
            o = F.conv2d(o, torch.from_numpy(sd[f"{bp}.conv3.weight"]))
            o = golden_bn(o, sd, f"{bp}.bn3")
            if f"{bp}.downsample.0.weight" in sd:
                idn = F.conv2d(h, torch.from_numpy(
                    sd[f"{bp}.downsample.0.weight"]), stride=s)
                idn = golden_bn(idn, sd, f"{bp}.downsample.1")
            h = F.relu(o + idn)
    return h


def test_vggformer_conversion_parity():
    """NOTE reference bottleneck geometry: VGGFace2_extractor puts the
    3x3 stride on conv2? No — the VGGFace2 repo variant strides conv1
    (vggformer.py:30, stride on conv1). Mirrored here and in
    nn/vggformer.py."""
    b, tt = 1, 2
    sd = {}
    s = "video_model.s_former"
    make_vgg_trunk_sd(sd, f"{s}.VGG_model")
    sd[f"{s}.conv.weight"] = t(512, 2048, 1, 1)
    sd[f"{s}.pos_embedding"] = t(1, 49, 512)
    sd.update(make_transformer_sd(f"{s}.spatial_transformer", 1, 512, 512))
    tf = "video_model.t_former"
    sd[f"{tf}.cls_token"] = t(1, 1, 512)
    sd[f"{tf}.pos_embedding"] = t(1, tt + 1, 512)
    sd.update(make_transformer_sd(f"{tf}.spatial_transformer", 3, 512, 1024,
                                  inner=512))
    sd["fc.0.weight"] = t(256, 512)
    sd["fc.0.bias"] = t(256)
    sd["fc.1.weight"] = t(256) + 1
    sd["fc.1.bias"] = t(256)
    sd["fc.1.running_mean"] = t(256)
    sd["fc.1.running_var"] = np.abs(t(256)) + 1
    sd["fc.3.weight"] = t(21, 256)
    sd["fc.3.bias"] = t(21)
    conditioned(sd)

    clip = t(b, tt, 3, 64, 64, scale=1.0)
    frames = torch.from_numpy(clip).reshape(b * tt, 3, 64, 64)
    h = golden_vgg_trunk(frames, sd, f"{s}.VGG_model")
    h = F.conv2d(h, torch.from_numpy(sd[f"{s}.conv.weight"]))
    bt, c, hh, ww = h.shape
    tokens = h.flatten(2).transpose(1, 2)
    tokens = tokens + torch.from_numpy(sd[f"{s}.pos_embedding"])[:, :hh * ww]
    tokens = golden_transformer_hd(tokens, sd, f"{s}.spatial_transformer",
                                   1, 8, 32)
    feats = tokens.mean(dim=1).reshape(b, tt, 512)
    pooled = golden_tformer(feats, sd, tf)
    h1 = pooled @ w(sd, "fc.0").T + bb(sd, "fc.0")
    h1 = F.relu(golden_bn(h1, sd, "fc.1"))
    golden = (h1 @ w(sd, "fc.3").T + bb(sd, "fc.3")).numpy()

    cfg = Config(model_name="vggformer", modality="V", task="AU",
                 n_frames=tt, image_size=64, compute_dtype="float32",
                 use_pallas=False)
    clip_nhwc = np.transpose(clip, (0, 1, 3, 4, 2))
    ours = apply_converted(cfg, sd, {"clip": clip_nhwc})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)

# ---------------------------------------------------------------------------
# emonet
# ---------------------------------------------------------------------------

def make_emo_convblock_sd(sd, p, in_p, out_p):
    sd[f"{p}.conv1.weight"] = t(out_p // 2, in_p, 3, 3)
    sd[f"{p}.conv2.weight"] = t(out_p // 4, out_p // 2, 3, 3)
    sd[f"{p}.conv3.weight"] = t(out_p // 4, out_p // 4, 3, 3)
    if in_p != out_p:
        sd[f"{p}.downsample.2.weight"] = t(out_p, in_p, 1, 1)


def golden_emo_convblock(x, sd, p):
    def inr(v):
        return F.relu(F.instance_norm(v))
    o1 = F.conv2d(inr(x), w(sd, f"{p}.conv1"), padding=1)
    o2 = F.conv2d(inr(o1), w(sd, f"{p}.conv2"), padding=1)
    o3 = F.conv2d(inr(o2), w(sd, f"{p}.conv3"), padding=1)
    out = torch.cat([o1, o2, o3], dim=1)
    if f"{p}.downsample.2.weight" in sd:
        res = F.conv2d(inr(x), w(sd, f"{p}.downsample.2"))
    else:
        res = x
    return out + res


def make_hourglass_sd(sd, p):
    for lv in (4, 3, 2, 1):
        for stem in ("b1", "b2", "b3"):
            make_emo_convblock_sd(sd, f"{p}.{stem}_{lv}", 256, 256)
    make_emo_convblock_sd(sd, f"{p}.b2_plus_1", 256, 256)


def golden_hourglass(x, sd, p, lv=4):
    up1 = golden_emo_convblock(x, sd, f"{p}.b1_{lv}")
    low = F.max_pool2d(x, 2, stride=2)
    low = golden_emo_convblock(low, sd, f"{p}.b2_{lv}")
    if lv > 1:
        low2 = golden_hourglass(low, sd, p, lv - 1)
    else:
        low2 = golden_emo_convblock(low, sd, f"{p}.b2_plus_1")
    low3 = golden_emo_convblock(low2, sd, f"{p}.b3_{lv}")
    up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
    return up1 + up2


def make_au_former_sd_dim(p, in_dim):
    """AU_former with configurable input dim (heads.py:258 input_dim)."""
    sd = {f"{p}.AU_BN1.weight": t(in_dim) + 1,
          f"{p}.AU_BN1.bias": t(in_dim),
          f"{p}.AU_BN1.running_mean": t(in_dim),
          f"{p}.AU_BN1.running_var": np.abs(t(in_dim)) + 1,
          f"{p}.pos_embedding": t(1, 12, 128)}
    for i in range(1, 13):
        sd[f"{p}.AU_linear_p{i}.weight"] = t(128, in_dim)
        sd[f"{p}.AU_linear_p{i}.bias"] = t(128)
        sd[f"{p}.AU_linear_last{i}.weight"] = t(1, 128)
    sd.update(make_transformer_sd(f"{p}.corr_transformer", 2, 128, 256))
    return sd


def test_emonet_conversion_parity():
    b = "base_model"
    sd = {f"{b}.conv1.weight": t(64, 3, 7, 7), f"{b}.conv1.bias": t(64)}
    make_emo_convblock_sd(sd, f"{b}.conv2", 64, 128)
    make_emo_convblock_sd(sd, f"{b}.conv3", 128, 128)
    make_emo_convblock_sd(sd, f"{b}.conv4", 128, 256)
    for i in range(2):
        make_hourglass_sd(sd, f"{b}.m{i}")
        make_emo_convblock_sd(sd, f"{b}.top_m_{i}", 256, 256)
        sd[f"{b}.conv_last{i}.weight"] = t(256, 256, 1, 1)
        sd[f"{b}.conv_last{i}.bias"] = t(256)
        sd[f"{b}.l{i}.weight"] = t(68, 256, 1, 1)
        sd[f"{b}.l{i}.bias"] = t(68)
        if i < 1:
            sd[f"{b}.bl{i}.weight"] = t(256, 256, 1, 1)
            sd[f"{b}.bl{i}.bias"] = t(256)
            sd[f"{b}.al{i}.weight"] = t(256, 68, 1, 1)
            sd[f"{b}.al{i}.bias"] = t(256)
    sd[f"{b}.conv1x1_input_emo_2.weight"] = t(256, 256 * 3, 1, 1)
    sd[f"{b}.conv1x1_input_emo_2.bias"] = t(256)
    for bi in range(4):
        make_emo_convblock_sd(sd, f"{b}.emo_net_2.{2 * bi}", 256, 256)
    sd[f"{b}.emo_fc_2.0.weight"] = t(128, 256)
    sd[f"{b}.emo_fc_2.0.bias"] = t(128)
    sd[f"{b}.emo_fc_2.1.weight"] = t(128) + 1
    sd[f"{b}.emo_fc_2.1.bias"] = t(128)
    sd[f"{b}.emo_fc_2.1.running_mean"] = t(128)
    sd[f"{b}.emo_fc_2.1.running_var"] = np.abs(t(128)) + 1
    sd[f"{b}.emo_fc_2.3.weight"] = t(10, 128)
    sd[f"{b}.emo_fc_2.3.bias"] = t(10)
    sd.update(make_au_former_sd_dim(f"{b}.au_head", 256))
    conditioned(sd)

    # 128px: smallest 64-divisible size where no InstanceNorm sees a 1x1
    # map (hourglass bottom = 2x2; emonet is canonically a 256px model)
    x = t(2, 3, 128, 128, scale=1.0)
    xt = torch.from_numpy(x)
    h = F.relu(F.instance_norm(F.conv2d(xt, w(sd, f"{b}.conv1"),
                                        bb(sd, f"{b}.conv1"), stride=2,
                                        padding=3)))
    h = F.max_pool2d(golden_emo_convblock(h, sd, f"{b}.conv2"), 2, stride=2)
    h = golden_emo_convblock(h, sd, f"{b}.conv3")
    h = golden_emo_convblock(h, sd, f"{b}.conv4")
    previous, hg_feats, tmp_out = h, [], None
    for i in range(2):
        hg = golden_hourglass(previous, sd, f"{b}.m{i}")
        ll = golden_emo_convblock(hg, sd, f"{b}.top_m_{i}")
        ll = F.relu(F.instance_norm(
            F.conv2d(ll, w(sd, f"{b}.conv_last{i}"),
                     bb(sd, f"{b}.conv_last{i}"))))
        tmp_out = F.conv2d(ll, w(sd, f"{b}.l{i}"), bb(sd, f"{b}.l{i}"))
        if i < 1:
            bl = F.conv2d(ll, w(sd, f"{b}.bl{i}"), bb(sd, f"{b}.bl{i}"))
            al = F.conv2d(tmp_out, w(sd, f"{b}.al{i}"), bb(sd, f"{b}.al{i}"))
            previous = previous + bl + al
        hg_feats.append(ll)
    cat = torch.cat(hg_feats, dim=1)
    mask = torch.sum(tmp_out, dim=1, keepdim=True)
    cat = cat * mask
    emo = torch.cat([h, cat], dim=1)
    emo = F.conv2d(emo, w(sd, f"{b}.conv1x1_input_emo_2"),
                   bb(sd, f"{b}.conv1x1_input_emo_2"))
    for bi in range(4):
        emo = golden_emo_convblock(emo, sd, f"{b}.emo_net_2.{2 * bi}")
        emo = F.max_pool2d(emo, 2, stride=2)
    final = emo.mean(dim=(2, 3))
    h1 = final @ w(sd, f"{b}.emo_fc_2.0").T + bb(sd, f"{b}.emo_fc_2.0")
    h1 = F.relu(golden_bn(h1, sd, f"{b}.emo_fc_2.1"))
    predict = h1 @ w(sd, f"{b}.emo_fc_2.3").T + bb(sd, f"{b}.emo_fc_2.3")
    au, _ = golden_au_former(final.numpy(), sd, f"{b}.au_head")
    golden = np.zeros((2, 21), np.float32)
    golden[:, :12] = au
    golden[:, 12:19] = predict[:, :7].numpy()
    golden[:, 19:21] = predict[:, -2:].numpy()

    cfg = Config(model_name="emonet", modality="V", task="AU", n_frames=1,
                 image_size=128, compute_dtype="float32", use_pallas=False)
    ours = apply_converted(cfg, sd, {"clip": nchw(x)[:, None]})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# tsav
# ---------------------------------------------------------------------------

def _r2p1_mid(in_p, out_p):
    return (in_p * out_p * 3 * 3 * 3) // (in_p * 3 * 3 + 3 * out_p)


def make_tsav_sd(sd):
    make_resnet18_sd(sd, "audio_model.resnet", 1)
    p = "video_model.r2plus1d"
    sd[f"{p}.stem.0.weight"] = t(45, 3, 1, 7, 7)
    sd[f"{p}.stem.3.weight"] = t(64, 45, 3, 1, 1)
    for bn, ch in (("stem.1", 45), ("stem.4", 64)):
        sd[f"{p}.{bn}.weight"] = t(ch) + 1
        sd[f"{p}.{bn}.bias"] = t(ch)
        sd[f"{p}.{bn}.running_mean"] = t(ch)
        sd[f"{p}.{bn}.running_var"] = np.abs(t(ch)) + 1
    chans = [64, 64, 128, 256, 512]
    for li in range(1, 5):
        cin, cout = chans[li - 1], chans[li]
        for bi in range(2):
            bp = f"{p}.layer{li}.{bi}"
            c1_in = cin if bi == 0 else cout
            for cn, ci, co in (("conv1", c1_in, cout), ("conv2", cout, cout)):
                mid = _r2p1_mid(ci, co)
                sd[f"{bp}.{cn}.0.0.weight"] = t(mid, ci, 1, 3, 3)
                sd[f"{bp}.{cn}.0.3.weight"] = t(co, mid, 3, 1, 1)
                sd[f"{bp}.{cn}.0.1.weight"] = t(mid) + 1
                sd[f"{bp}.{cn}.0.1.bias"] = t(mid)
                sd[f"{bp}.{cn}.0.1.running_mean"] = t(mid)
                sd[f"{bp}.{cn}.0.1.running_var"] = np.abs(t(mid)) + 1
            for bn in ("conv1.1", "conv2.1"):
                sd[f"{bp}.{bn}.weight"] = t(cout) + 1
                sd[f"{bp}.{bn}.bias"] = t(cout)
                sd[f"{bp}.{bn}.running_mean"] = t(cout)
                sd[f"{bp}.{bn}.running_var"] = np.abs(t(cout)) + 1
            if bi == 0 and cin != cout:
                sd[f"{bp}.downsample.0.weight"] = t(cout, cin, 1, 1, 1)
                sd[f"{bp}.downsample.1.weight"] = t(cout) + 1
                sd[f"{bp}.downsample.1.bias"] = t(cout)
                sd[f"{bp}.downsample.1.running_mean"] = t(cout)
                sd[f"{bp}.downsample.1.running_var"] = np.abs(t(cout)) + 1
    sd["fc.1.weight"] = t(22, 1024)
    sd["fc.1.bias"] = t(22)


def golden_conv2plus1d(x, sd, bp, cn, stride):
    h = F.conv3d(x, torch.from_numpy(sd[f"{bp}.{cn}.0.0.weight"]),
                 stride=(1, stride, stride), padding=(0, 1, 1))
    h = golden_bn(h, sd, f"{bp}.{cn}.0.1")
    h = F.relu(h)
    return F.conv3d(h, torch.from_numpy(sd[f"{bp}.{cn}.0.3.weight"]),
                    stride=(stride, 1, 1), padding=(1, 0, 0))


def golden_r2plus1d(x, sd, p):
    h = F.conv3d(x, torch.from_numpy(sd[f"{p}.stem.0.weight"]),
                 stride=(1, 2, 2), padding=(0, 3, 3))
    h = F.relu(golden_bn(h, sd, f"{p}.stem.1"))
    h = F.conv3d(h, torch.from_numpy(sd[f"{p}.stem.3.weight"]),
                 padding=(1, 0, 0))
    h = F.relu(golden_bn(h, sd, f"{p}.stem.4"))
    for li in range(1, 5):
        stride = 1 if li == 1 else 2
        for bi in range(2):
            bp = f"{p}.layer{li}.{bi}"
            s = stride if bi == 0 else 1
            idn = h
            o = golden_conv2plus1d(h, sd, bp, "conv1", s)
            o = F.relu(golden_bn(o, sd, f"{bp}.conv1.1"))
            o = golden_conv2plus1d(o, sd, bp, "conv2", 1)
            o = golden_bn(o, sd, f"{bp}.conv2.1")
            if f"{bp}.downsample.0.weight" in sd:
                idn = F.conv3d(h, torch.from_numpy(
                    sd[f"{bp}.downsample.0.weight"]), stride=(s, s, s))
                idn = golden_bn(idn, sd, f"{bp}.downsample.1")
            h = F.relu(o + idn)
    return h.mean(dim=(2, 3, 4))


def test_tsav_conversion_parity():
    sd = {}
    make_tsav_sd(sd)
    conditioned(sd)

    b, tt = 1, 4
    clip = t(b, 3, tt, 32, 32, scale=1.0)       # (B, C, T, H, W)
    audio = t(b, 1, 64, 101, scale=1.0)
    vfeat = golden_r2plus1d(torch.from_numpy(clip), sd,
                            "video_model.r2plus1d")
    afeat = golden_resnet18_trunk(torch.from_numpy(audio), sd,
                                  "audio_model.resnet").mean(dim=(2, 3))
    feats = torch.cat([afeat, vfeat], dim=1)
    golden = (feats @ w(sd, "fc.1").T + bb(sd, "fc.1")).numpy()

    cfg = Config(model_name="tsav", modality="A;V", task="AU", n_frames=tt,
                 image_size=32, compute_dtype="float32", use_pallas=False)
    clip_nhwc = np.transpose(clip, (0, 2, 3, 4, 1))
    ours = apply_converted(cfg, sd, {"clip": clip_nhwc,
                                     "audio_features": audio})
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-5)
