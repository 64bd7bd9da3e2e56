"""Checkpoint-converter parity tests.

Golden values are computed functionally with torch.nn.functional from a
random state dict in the reference's parameter naming; the converter maps it
into auformer variables and the flax modules must reproduce the outputs.
This validates layout transposes (OIHW->HWIO, linear transpose), BN
semantics, the batched TokenProjection/TokenLogits folding, and the
transformer block naming end to end (SURVEY.md §7.3-7).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from auformer.core.torch_import import Converter, merge_into
from auformer.nn.heads import AUFormerHead
from auformer.nn.resnet import BasicBlock

RS = np.random.RandomState(11)


def t(*shape, scale=0.1):
    return (RS.randn(*shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# golden: functional torch evaluation of reference-named state dicts
# ---------------------------------------------------------------------------

def golden_bn(x, sd, p, eps=1e-5):
    return F.batch_norm(x, torch.from_numpy(sd[f"{p}.running_mean"]),
                        torch.from_numpy(sd[f"{p}.running_var"]),
                        torch.from_numpy(sd[f"{p}.weight"]),
                        torch.from_numpy(sd[f"{p}.bias"]),
                        training=False, eps=eps)


def golden_attention(z, sd, p, heads=8, dim_head=32):
    inner = heads * dim_head
    qkv = z @ torch.from_numpy(sd[f"{p}.to_qkv.weight"]).T
    q, k, v = qkv.chunk(3, dim=-1)
    b, n, _ = z.shape

    def split(u):
        return u.reshape(b, n, heads, dim_head).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    dots = (q @ k.transpose(-1, -2)) * dim_head ** -0.5
    attn = dots.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, inner)
    return (out @ torch.from_numpy(sd[f"{p}.to_out.0.weight"]).T
            + torch.from_numpy(sd[f"{p}.to_out.0.bias"]))


def tanh_gelu_t(x):
    return 0.5 * x * (1 + torch.tanh(
        np.sqrt(2 / np.pi) * (x + 0.044715 * x ** 3)))


def golden_transformer(z, sd, p, depth):
    for i in range(depth):
        a = f"{p}.layers.{i}.0.fn"
        m = f"{p}.layers.{i}.1.fn"
        h = F.layer_norm(z, (z.shape[-1],),
                         torch.from_numpy(sd[f"{a}.norm.weight"]),
                         torch.from_numpy(sd[f"{a}.norm.bias"]))
        z = z + golden_attention(h, sd, f"{a}.fn")
        h = F.layer_norm(z, (z.shape[-1],),
                         torch.from_numpy(sd[f"{m}.norm.weight"]),
                         torch.from_numpy(sd[f"{m}.norm.bias"]))
        h = tanh_gelu_t(h @ torch.from_numpy(sd[f"{m}.fn.net.0.weight"]).T
                        + torch.from_numpy(sd[f"{m}.fn.net.0.bias"]))
        h = (h @ torch.from_numpy(sd[f"{m}.fn.net.3.weight"]).T
             + torch.from_numpy(sd[f"{m}.fn.net.3.bias"]))
        z = z + h
    return z


def make_transformer_sd(p, depth, dim, mlp_dim, inner=256):
    sd = {}
    for i in range(depth):
        a = f"{p}.layers.{i}.0.fn"
        m = f"{p}.layers.{i}.1.fn"
        sd[f"{a}.norm.weight"] = t(dim) + 1
        sd[f"{a}.norm.bias"] = t(dim)
        sd[f"{a}.fn.to_qkv.weight"] = t(inner * 3, dim)
        sd[f"{a}.fn.to_out.0.weight"] = t(dim, inner)
        sd[f"{a}.fn.to_out.0.bias"] = t(dim)
        sd[f"{m}.norm.weight"] = t(dim) + 1
        sd[f"{m}.norm.bias"] = t(dim)
        sd[f"{m}.fn.net.0.weight"] = t(mlp_dim, dim)
        sd[f"{m}.fn.net.0.bias"] = t(mlp_dim)
        sd[f"{m}.fn.net.3.weight"] = t(dim, mlp_dim)
        sd[f"{m}.fn.net.3.bias"] = t(dim)
    return sd


def make_au_former_sd(p="head"):
    sd = {f"{p}.AU_BN1.weight": t(512) + 1,
          f"{p}.AU_BN1.bias": t(512),
          f"{p}.AU_BN1.running_mean": t(512),
          f"{p}.AU_BN1.running_var": np.abs(t(512)) + 1,
          f"{p}.pos_embedding": t(1, 12, 128)}
    for i in range(1, 13):
        sd[f"{p}.AU_linear_p{i}.weight"] = t(128, 512)
        sd[f"{p}.AU_linear_p{i}.bias"] = t(128)
        sd[f"{p}.AU_linear_last{i}.weight"] = t(1, 128)
    sd.update(make_transformer_sd(f"{p}.corr_transformer", 2, 128, 256))
    return sd


def golden_au_former(x, sd, p="head"):
    h = golden_bn(torch.from_numpy(x), sd, f"{p}.AU_BN1")
    tokens = torch.stack(
        [h @ torch.from_numpy(sd[f"{p}.AU_linear_p{i}.weight"]).T
         + torch.from_numpy(sd[f"{p}.AU_linear_p{i}.bias"])
         for i in range(1, 13)], dim=1)
    z = tokens + torch.from_numpy(sd[f"{p}.pos_embedding"])[:, :12]
    z = golden_transformer(z, sd, f"{p}.corr_transformer", 2)
    logits = torch.cat(
        [z[:, i - 1] @ torch.from_numpy(sd[f"{p}.AU_linear_last{i}.weight"]).T
         for i in range(1, 13)], dim=1)
    return logits.numpy(), z.numpy()


def test_au_former_conversion_parity():
    sd = make_au_former_sd()
    c = Converter(sd)
    c.au_former("head", "head")
    conv = c.result()
    assert not c.missing

    head = AUFormerHead()
    x = t(4, 512, scale=1.0)
    import jax
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    merged = merge_into(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": conv["params"]["head"],
         "batch_stats": conv["batch_stats"]["head"]})
    logits, tokens = head.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        x, train=False)
    g_logits, g_tokens = golden_au_former(x, sd)
    np.testing.assert_allclose(np.asarray(logits), g_logits,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tokens), g_tokens,
                               rtol=1e-4, atol=1e-5)


def test_basic_block_conversion_parity():
    """Conv OIHW->HWIO + BN eval semantics through a residual block."""
    sd = {"blk.conv1.weight": t(16, 8, 3, 3),
          "blk.bn1.weight": t(16) + 1, "blk.bn1.bias": t(16),
          "blk.bn1.running_mean": t(16),
          "blk.bn1.running_var": np.abs(t(16)) + 1,
          "blk.conv2.weight": t(16, 16, 3, 3),
          "blk.bn2.weight": t(16) + 1, "blk.bn2.bias": t(16),
          "blk.bn2.running_mean": t(16),
          "blk.bn2.running_var": np.abs(t(16)) + 1,
          "blk.downsample.0.weight": t(16, 8, 1, 1),
          "blk.downsample.1.weight": t(16) + 1,
          "blk.downsample.1.bias": t(16),
          "blk.downsample.1.running_mean": t(16),
          "blk.downsample.1.running_var": np.abs(t(16)) + 1}
    c = Converter(sd)
    c.resnet_block("blk", "blk")
    conv = c.result()

    x = t(2, 8, 10, 10, scale=1.0)  # NCHW for torch
    xt = torch.from_numpy(x)
    h = F.conv2d(xt, torch.from_numpy(sd["blk.conv1.weight"]), stride=2,
                 padding=1)
    h = F.relu(golden_bn(h, sd, "blk.bn1"))
    h = F.conv2d(h, torch.from_numpy(sd["blk.conv2.weight"]), padding=1)
    h = golden_bn(h, sd, "blk.bn2")
    idn = F.conv2d(xt, torch.from_numpy(sd["blk.downsample.0.weight"]),
                   stride=2)
    idn = golden_bn(idn, sd, "blk.downsample.1")
    golden = F.relu(h + idn).numpy()

    import jax
    blk = BasicBlock(planes=16, stride=2, downsample=True)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = blk.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    merged = merge_into(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        {"params": conv["params"]["blk"],
         "batch_stats": conv["batch_stats"]["blk"]})
    out = blk.apply({"params": merged["params"],
                     "batch_stats": merged["batch_stats"]},
                    x_nhwc, train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               golden, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def synthetic_avformer_sd():
    """Random state dict with the exact reference avformer parameter naming
    and shapes (best523.pth layout)."""
    sd = {}
    # audio resnet18 (1-channel conv1)
    def add_resnet18(p, in_ch):
        sd[f"{p}.conv1.weight"] = t(64, in_ch, 7, 7)
        for n, ch in [("bn1", 64)]:
            sd[f"{p}.{n}.weight"] = t(ch) + 1
            sd[f"{p}.{n}.bias"] = t(ch)
            sd[f"{p}.{n}.running_mean"] = t(ch)
            sd[f"{p}.{n}.running_var"] = np.abs(t(ch)) + 1
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

    add_resnet18("audio_model.audio_model.resnet", 1)
    add_resnet18("video_model.video_model.s_former", 3)
    sd["video_model.video_model.s_former.pos_embedding"] = t(1, 49, 256)
    sd.update(make_transformer_sd(
        "video_model.video_model.s_former.spatial_transformer", 1, 256, 512))
    sd["video_model.video_model.t_former.cls_token"] = t(1, 1, 512)
    sd["video_model.video_model.t_former.pos_embedding"] = t(1, 17, 512)
    sd.update(make_transformer_sd(
        "video_model.video_model.t_former.spatial_transformer", 3, 512, 1024,
        inner=512))
    sd.update(make_au_former_sd("audio_model.au_head"))
    sd.update(make_au_former_sd("video_model.au_head"))
    sd["au_head.pos_embedding"] = t(1, 12, 256)
    sd.update(make_transformer_sd("au_head.corr_transformer", 3, 256, 256))
    for i in range(1, 13):
        sd[f"au_head.AU_linear_last{i}.weight"] = t(1, 256)
    return sd


def test_avformer_converter_covers_checkpoint(synthetic_avformer_sd):
    """The synthetic avformer state dict converts with merge shapes equal
    to a fresh init, and the tensors actually land."""
    from auformer.core.config import Config
    from auformer.core.torch_import import convert_avformer
    from auformer.nn import init_model

    sd = synthetic_avformer_sd
    converted = convert_avformer(sd)

    # n_frames=16 so the t_former pos-embedding (1,17,512) matches the
    # checkpoint buffer (the reference slices pos[:, :n+1] at runtime)
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=32, compute_dtype="float32",
                 use_pallas=False)
    model, variables = init_model(cfg)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, converted)

    import jax
    init_shapes = jax.tree_util.tree_map(np.shape, variables["params"])
    merged_shapes = jax.tree_util.tree_map(np.shape, merged["params"])
    assert init_shapes == merged_shapes
    # converted arrays actually landed (not left at init)
    qkv = merged["params"]["au_head"]["corr_transformer"]["layers_0"][
        "attn"]["to_qkv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(qkv),
        sd["au_head.corr_transformer.layers.0.0.fn.fn.to_qkv.weight"].T)


def test_stem_parity():
    """conv7x7 s2 p3 + BN + relu + maxpool3x3 s2 p1 vs torch functional
    (the geometry-critical part of every resnet trunk)."""
    import jax
    from auformer.nn.resnet import ResNetStem

    sd = {"stem.conv1.weight": t(64, 3, 7, 7),
          "stem.bn1.weight": t(64) + 1, "stem.bn1.bias": t(64),
          "stem.bn1.running_mean": t(64),
          "stem.bn1.running_var": np.abs(t(64)) + 1}
    c = Converter(sd)
    c.conv2d("stem.conv1", "stem/conv1")
    c.batchnorm("stem.bn1", "stem/bn1/bn")
    conv = c.result()

    x = t(2, 3, 33, 33, scale=1.0)  # odd size exercises pool padding
    xt = torch.from_numpy(x)
    h = F.conv2d(xt, torch.from_numpy(sd["stem.conv1.weight"]), stride=2,
                 padding=3)
    h = F.relu(golden_bn(h, sd, "stem.bn1"))
    golden = F.max_pool2d(h, 3, stride=2, padding=1).numpy()

    stem = ResNetStem()
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    variables = stem.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        {"params": conv["params"]["stem"],
         "batch_stats": conv["batch_stats"]["stem"]})
    out = stem.apply({"params": merged["params"],
                      "batch_stats": merged["batch_stats"]},
                     x_nhwc, train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               golden, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# full avformer forward parity (the BASELINE "bit-faithful logits" check on
# synthetic weights)
# ---------------------------------------------------------------------------

def golden_attention_hd(z, sd, p, heads, dim_head):
    inner = heads * dim_head
    qkv = z @ torch.from_numpy(sd[f"{p}.to_qkv.weight"]).T
    q, k, v = qkv.chunk(3, dim=-1)
    b, n, _ = z.shape

    def split(u):
        return u.reshape(b, n, heads, dim_head).permute(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    dots = (q @ k.transpose(-1, -2)) * dim_head ** -0.5
    attn = dots.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, inner)
    return (out @ torch.from_numpy(sd[f"{p}.to_out.0.weight"]).T
            + torch.from_numpy(sd[f"{p}.to_out.0.bias"]))


def golden_transformer_hd(z, sd, p, depth, heads=8, dim_head=32):
    for i in range(depth):
        a = f"{p}.layers.{i}.0.fn"
        m = f"{p}.layers.{i}.1.fn"
        h = F.layer_norm(z, (z.shape[-1],),
                         torch.from_numpy(sd[f"{a}.norm.weight"]),
                         torch.from_numpy(sd[f"{a}.norm.bias"]))
        z = z + golden_attention_hd(h, sd, f"{a}.fn", heads, dim_head)
        h = F.layer_norm(z, (z.shape[-1],),
                         torch.from_numpy(sd[f"{m}.norm.weight"]),
                         torch.from_numpy(sd[f"{m}.norm.bias"]))
        h = tanh_gelu_t(h @ torch.from_numpy(sd[f"{m}.fn.net.0.weight"]).T
                        + torch.from_numpy(sd[f"{m}.fn.net.0.bias"]))
        h = (h @ torch.from_numpy(sd[f"{m}.fn.net.3.weight"]).T
             + torch.from_numpy(sd[f"{m}.fn.net.3.bias"]))
        z = z + h
    return z


def golden_block(h, sd, p, stride):
    idn = h
    o = F.conv2d(h, torch.from_numpy(sd[f"{p}.conv1.weight"]),
                 stride=stride, padding=1)
    o = F.relu(golden_bn(o, sd, f"{p}.bn1"))
    o = F.conv2d(o, torch.from_numpy(sd[f"{p}.conv2.weight"]), padding=1)
    o = golden_bn(o, sd, f"{p}.bn2")
    if f"{p}.downsample.0.weight" in sd:
        idn = F.conv2d(h, torch.from_numpy(sd[f"{p}.downsample.0.weight"]),
                       stride=stride)
        idn = golden_bn(idn, sd, f"{p}.downsample.1")
    return F.relu(o + idn)


def golden_resnet18_trunk(x, sd, p):
    h = F.conv2d(x, torch.from_numpy(sd[f"{p}.conv1.weight"]), stride=2,
                 padding=3)
    h = F.relu(golden_bn(h, sd, f"{p}.bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    for li, stride in [(1, 1), (2, 2), (3, 2), (4, 2)]:
        for bi in range(2):
            h = golden_block(h, sd, f"{p}.layer{li}.{bi}",
                             stride if bi == 0 else 1)
    return h


def golden_resformer(x, sd, p):
    """ResFormer (vformer.py:232-268): trunk to layer3, 49-token spatial
    transformer, layer4, pool."""
    h = F.conv2d(x, torch.from_numpy(sd[f"{p}.conv1.weight"]), stride=2,
                 padding=3)
    h = F.relu(golden_bn(h, sd, f"{p}.bn1"))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    for li, stride in [(1, 1), (2, 2), (3, 2)]:
        for bi in range(2):
            h = golden_block(h, sd, f"{p}.layer{li}.{bi}",
                             stride if bi == 0 else 1)
    b, c, hh, ww = h.shape
    tokens = h.reshape(b, c, hh * ww).permute(0, 2, 1)
    tokens = tokens + torch.from_numpy(sd[f"{p}.pos_embedding"])[:, :hh * ww]
    tokens = golden_transformer_hd(tokens, sd, f"{p}.spatial_transformer",
                                   1, 8, 32)
    h = tokens.permute(0, 2, 1).reshape(b, c, hh, ww)
    for bi in range(2):
        h = golden_block(h, sd, f"{p}.layer4.{bi}", 2 if bi == 0 else 1)
    return h.mean(dim=(2, 3))


def golden_tformer(feats, sd, p):
    b = feats.shape[0]
    cls = torch.from_numpy(sd[f"{p}.cls_token"]).expand(b, 1, -1)
    z = torch.cat([cls, feats], dim=1)
    z = z + torch.from_numpy(sd[f"{p}.pos_embedding"])[:, :z.shape[1]]
    z = golden_transformer_hd(z, sd, f"{p}.spatial_transformer", 3, 8, 64)
    return z[:, 0]


def golden_au_tokens(feats, sd, p):
    _, tokens = golden_au_former(feats.numpy(), sd, p)
    return torch.from_numpy(tokens)


def test_full_avformer_forward_parity(synthetic_avformer_sd):
    """Converted synthetic checkpoint: our jitted avformer forward must
    reproduce the torch-functional golden end to end (AU logits)."""
    import jax
    from auformer.core.config import Config
    from auformer.core.torch_import import convert_avformer
    from auformer.nn import init_model

    sd = synthetic_avformer_sd
    b, tt, size = 2, 16, 32
    clip_nchw = t(b, 3, tt, size, size, scale=1.0)       # torch layout
    audio = t(b, 1, 64, 101, scale=1.0)

    # ---- golden ----
    at = torch.from_numpy(audio)
    a_feats = golden_resnet18_trunk(
        at, sd, "audio_model.audio_model.resnet").mean(dim=(2, 3))
    a_tokens = golden_au_tokens(a_feats, sd, "audio_model.au_head")

    ct = torch.from_numpy(clip_nchw).permute(0, 2, 1, 3, 4)  # (B,T,C,H,W)
    frames = ct.reshape(b * tt, 3, size, size)
    v_feats = golden_resformer(frames, sd, "video_model.video_model.s_former")
    pooled = golden_tformer(v_feats.reshape(b, tt, 512), sd,
                            "video_model.video_model.t_former")
    v_tokens = golden_au_tokens(pooled, sd, "video_model.au_head")

    fused = torch.cat([a_tokens, v_tokens], dim=2)
    z = fused + torch.from_numpy(sd["au_head.pos_embedding"])
    z = golden_transformer_hd(z, sd, "au_head.corr_transformer", 3, 8, 32)
    golden_logits = torch.cat(
        [z[:, i - 1] @ torch.from_numpy(
            sd[f"au_head.AU_linear_last{i}.weight"]).T
         for i in range(1, 13)], dim=1).numpy()

    # ---- ours ----
    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=32, compute_dtype="float32",
                 use_pallas=False)
    model, variables = init_model(cfg)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, convert_avformer(sd))
    clip_nhwc = np.transpose(clip_nchw, (0, 2, 3, 4, 1))  # (B,T,H,W,C)
    out = model.apply({"params": merged["params"],
                       "batch_stats": merged["batch_stats"]},
                      {"clip": clip_nhwc, "audio_features": audio},
                      train=False)
    ours = np.asarray(out)[:, :12]
    np.testing.assert_allclose(ours, golden_logits, rtol=2e-3, atol=2e-4)


def test_va_former_conversion_parity():
    """VA_former (heads.py:341-372): 2-token analog of AU_former."""
    import jax
    from auformer.nn.heads import VAFormerHead

    p = "vhead"
    sd = {f"{p}.VA_BN1.weight": t(512) + 1,
          f"{p}.VA_BN1.bias": t(512),
          f"{p}.VA_BN1.running_mean": t(512),
          f"{p}.VA_BN1.running_var": np.abs(t(512)) + 1,
          f"{p}.pos_embedding": t(1, 2, 128)}
    for i in (1, 2):
        sd[f"{p}.VA_linear_p{i}.weight"] = t(128, 512)
        sd[f"{p}.VA_linear_p{i}.bias"] = t(128)
        sd[f"{p}.VA_linear_last{i}.weight"] = t(1, 128)
    sd.update(make_transformer_sd(f"{p}.corr_transformer", 2, 128, 128))

    c = Converter(sd)
    c.va_former(p, p)
    conv = c.result()
    assert not c.missing

    x = t(4, 512, scale=1.0)
    h = golden_bn(torch.from_numpy(x), sd, f"{p}.VA_BN1")
    tokens = torch.stack(
        [h @ torch.from_numpy(sd[f"{p}.VA_linear_p{i}.weight"]).T
         + torch.from_numpy(sd[f"{p}.VA_linear_p{i}.bias"])
         for i in (1, 2)], dim=1)
    z = tokens + torch.from_numpy(sd[f"{p}.pos_embedding"])
    z = golden_transformer(z, sd, f"{p}.corr_transformer", 2)
    golden = torch.cat(
        [z[:, i - 1] @ torch.from_numpy(
            sd[f"{p}.VA_linear_last{i}.weight"]).T for i in (1, 2)],
        dim=1).numpy()

    head = VAFormerHead()
    variables = head.init(jax.random.PRNGKey(0), x, train=False)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        {"params": conv["params"][p], "batch_stats": conv["batch_stats"][p]})
    logits, _ = head.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        x, train=False)
    np.testing.assert_allclose(np.asarray(logits), golden,
                               rtol=1e-4, atol=1e-5)


def test_s2d_stem_parity():
    """space-to-depth stem evaluates the same conv1 weights identically
    (trace-time reshuffle, shared param tree)."""
    import jax
    from auformer.nn.resnet import ResNetStem

    rs = np.random.RandomState(3)
    x = rs.randn(2, 32, 32, 3).astype(np.float32)
    stem = ResNetStem(space_to_depth=False)
    v = stem.init(jax.random.PRNGKey(0), x, train=False)
    ref = stem.apply(v, x, train=False)
    out = ResNetStem(space_to_depth=True).apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
