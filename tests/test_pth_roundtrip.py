"""Real on-disk .pth round trip (VERDICT.md round-1 item 4).

torch.save an avformer-layout state dict (with DDP ``module.`` prefixes)
to disk -> scripts/convert_checkpoint.py CLI (main(argv)) -> Orbax ->
load_checkpoint -> forward parity with the in-memory conversion; plus
train_lib resume from a reference-format ``latest.pth``
(train.py:323-326 semantics).
"""
import os
import sys

import numpy as np
import pytest
import torch

import jax

from auformer.core.checkpointing import load_checkpoint
from auformer.core.config import Config
from auformer.core.torch_import import (convert_checkpoint,
                                        load_torch_state_dict, merge_into)
from auformer.nn import build_model, init_model

from test_torch_import import make_au_former_sd, make_transformer_sd, t
from test_torch_import_zoo import conditioned, make_resnet18_sd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def build_avformer_sd():
    """best523.pth-layout state dict (same structure as the
    synthetic_avformer_sd fixture, standalone for reuse here)."""
    sd = {}
    make_resnet18_sd(sd, "audio_model.audio_model.resnet", 1)
    make_resnet18_sd(sd, "video_model.video_model.s_former", 3)
    sd["video_model.video_model.s_former.pos_embedding"] = t(1, 49, 256)
    sd.update(make_transformer_sd(
        "video_model.video_model.s_former.spatial_transformer", 1, 256, 512))
    sd["video_model.video_model.t_former.cls_token"] = t(1, 1, 512)
    sd["video_model.video_model.t_former.pos_embedding"] = t(1, 17, 512)
    sd.update(make_transformer_sd(
        "video_model.video_model.t_former.spatial_transformer", 3, 512,
        1024, inner=512))
    sd.update(make_au_former_sd("audio_model.au_head"))
    sd.update(make_au_former_sd("video_model.au_head"))
    sd["au_head.pos_embedding"] = t(1, 12, 256)
    sd.update(make_transformer_sd("au_head.corr_transformer", 3, 256, 256))
    for i in range(1, 13):
        sd[f"au_head.AU_linear_last{i}.weight"] = t(1, 256)
    return conditioned(sd)


@pytest.fixture(scope="module")
def pth_file(tmp_path_factory):
    """A real torch.save file with DDP module. prefixes + state_dict
    wrapper (the formats load_torch_state_dict must strip)."""
    sd = build_avformer_sd()
    wrapped = {"state_dict": {f"module.{k}": torch.from_numpy(v)
                              for k, v in sd.items()}}
    path = str(tmp_path_factory.mktemp("pth") / "best523.pth")
    torch.save(wrapped, path)
    return path, sd


def small_cfg():
    # n_frames=16 matches the checkpoint's (1,17,512) t_former
    # pos-embedding (flax validates param shapes at apply); 32px keeps the
    # CPU forward cheap (ResFormer/TFormer pos slices handle the rest)
    return Config(model_name="avformer", modality="A;V", task="AU",
                  n_frames=16, image_size=32, compute_dtype="float32",
                  use_pallas=False)


def test_load_torch_state_dict_from_disk(pth_file):
    path, sd = pth_file
    loaded = load_torch_state_dict(path)
    assert set(loaded) == set(sd)          # module. prefix stripped
    np.testing.assert_array_equal(
        loaded["au_head.pos_embedding"], sd["au_head.pos_embedding"])


def test_convert_checkpoint_cli_roundtrip(pth_file, tmp_path):
    path, sd = pth_file
    import convert_checkpoint as cli
    out = str(tmp_path / "ckpt" / "best")
    cli.main(["--pth", path, "--model", "avformer", "--out", out, "--cpu"])

    restored = load_checkpoint(str(tmp_path / "ckpt"), "best")
    assert restored is not None

    cfg = small_cfg()
    model = build_model(cfg)
    rs = np.random.RandomState(5)
    x = {"clip": rs.randn(2, 16, 32, 32, 3).astype(np.float32),
         "audio_features": rs.randn(2, 1, 64, 101).astype(np.float32)}
    out_disk = np.asarray(model.apply(
        {"params": restored["params"],
         "batch_stats": restored["batch_stats"]}, x, train=False))

    _, variables = init_model(cfg)
    merged = merge_into(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        convert_checkpoint("avformer", load_torch_state_dict(path)))
    out_mem = np.asarray(model.apply(merged, x, train=False))
    # disk round trip must be bit-exact vs the in-memory conversion
    np.testing.assert_array_equal(out_disk, out_mem)


def test_train_lib_resume_from_pth(pth_file, tmp_path):
    """--resume with a reference-format latest.pth converts on the fly
    (train_lib resume block; reference train.py:323-326)."""
    from auformer import train_lib
    from auformer.data.fixtures import generate_synthetic_dataset

    path, sd = pth_file
    root, label = str(tmp_path / "root"), str(tmp_path / "labels")
    generate_synthetic_dataset(root, label, n_videos=4,
                               frames_per_video=16, image_size=32,
                               audio_secs=1.0)
    cfg = Config(root=root, lmdb_label_dir=label,
                 cache_dir=str(tmp_path / "cache"),
                 exp_dir=str(tmp_path / "exp"),
                 model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, dilation=1, image_size=32, batch_size=4,
                 downsample_rate=1, compute_dtype="float32",
                 use_pallas=False, resume=True, host_threads=2)
    pretrain = os.path.join(cfg.exp_dir, "pretrain")
    os.makedirs(pretrain, exist_ok=True)
    wrapped = {f"module.{k}": torch.from_numpy(v) for k, v in sd.items()}
    torch.save(wrapped, os.path.join(pretrain, "latest.pth"))

    state, history = train_lib.train(cfg, epochs=0)

    got = np.asarray(jax.device_get(
        state.params["au_head"]["corr_transformer"]["layers_0"]["attn"]
        ["to_qkv"]["kernel"]))
    np.testing.assert_allclose(
        got, sd["au_head.corr_transformer.layers.0.0.fn.fn.to_qkv.weight"].T,
        rtol=1e-6, atol=1e-7)
