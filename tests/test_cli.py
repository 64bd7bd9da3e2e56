"""CLI flag-surface parity: every reference opts.py flag parses with the
same defaults (BASELINE.md API-parity requirement)."""
import pytest

from auformer.core.config import Config, parse_opt


def test_defaults_match_reference():
    cfg = parse_opt([])
    # opts.py:4-43 defaults
    assert cfg.task == "AU"
    assert cfg.root == "./data/aff2_processed"
    assert cfg.exp_dir == "experiments/avformer"
    assert cfg.cache_dir == "./data/cached_data"
    assert cfg.lmdb_label_dir == "./data/112_align/lmdb"
    assert cfg.image_size == 112
    assert cfg.modality == "A;V"
    assert cfg.dropout_rate == 0.2
    assert cfg.model_name == "avformer"
    assert cfg.seed == 123
    assert cfg.learning_rate == 5e-4
    assert cfg.n_warmup_steps == 0
    assert cfg.grad_clip == -1
    assert cfg.weight_decay == 5e-5
    assert cfg.epochs == 60
    assert cfg.batch_size == 64
    assert cfg.early_stop_step == 30
    assert cfg.resume is False
    assert cfg.start_epoch == 15
    assert cfg.eval_step == 1
    assert cfg.n_frames == 16
    assert cfg.dilation == 3
    assert cfg.downsample_rate == 100
    assert cfg.audio_len_secs == 10
    assert cfg.audio_shift_secs == 5
    assert cfg.n_mels == 64


def test_short_flags():
    cfg = parse_opt(["-t", "ALL", "-mn", "vformer", "-md", "V;M",
                     "-b", "32", "-lr", "1e-3", "-e", "5", "-ds", "10",
                     "-als", "8", "-ass", "4"])
    assert cfg.task == "ALL" and cfg.model_name == "vformer"
    assert cfg.modality == "V;M" and cfg.batch_size == 32
    assert cfg.learning_rate == 1e-3 and cfg.epochs == 5
    assert cfg.downsample_rate == 10
    assert cfg.audio_len_secs == 8 and cfg.audio_shift_secs == 4


def test_derived_properties():
    cfg = Config(modality="A;V;M")
    assert cfg.use_mask and cfg.use_audio and cfg.clip_channels == 4
    assert cfg.label_frame == 48
    assert cfg.n_fft == 1024 and cfg.win_length == 882
    assert cfg.hop_length == 441 and cfg.mel_frames == 1001
    assert cfg.sample_len_frames == 441000
    cfg2 = Config(modality="M")
    assert cfg2.clip_channels == 1
    assert not cfg2.use_audio


def test_bad_task_rejected():
    with pytest.raises(AssertionError):
        parse_opt(["-t", "BOGUS"])


def test_tpu_flags():
    cfg = parse_opt(["--no_pallas", "--compute_dtype", "float32",
                     "--mesh_shape", "data:4"])
    assert cfg.use_pallas is False
    assert cfg.compute_dtype == "float32"
    assert cfg.mesh_shape == "data:4"
    cfg2 = parse_opt(["--strict_parity"])
    assert cfg2.compute_dtype == "float32"
