"""FLOPs / MFU report for the headline inference paths (BASELINE.md).

Uses XLA's compiled cost analysis to count the FLOPs of one dense-sweep
bucket and one clip-batch forward, then converts the driver-measured
clip rates into achieved TF/s and MFU against the v5e peak
(197 TF/s bf16; the round-3 profiler trace showed XLA contracts the
"f32" DFT at DEFAULT precision = one bf16 pass, so the bf16 peak is the
right ceiling for every block — see scripts/profile_trace.py for the
trace-measured number).

    python scripts/flops_report.py [--sweep-rate 8616] [--clip-rate 3273]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_F32_PEAK = 49e12


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sweep-rate", type=float, default=8616.0,
                   help="measured dense-sweep clips/s (BENCH JSON value)")
    p.add_argument("--clip-rate", type=float, default=3273.0,
                   help="measured clip-batch clips/s")
    p.add_argument("--bucket", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from auformer.core.config import Config
    from auformer.nn import init_model
    from auformer.ops.audio import audio_frontend
    from auformer.ops.preprocess import normalize_clip
    from auformer.sweep import AvformerSweep

    cfg = Config(model_name="avformer", modality="A;V", task="AU",
                 n_frames=16, image_size=112, compute_dtype="bfloat16",
                 use_pallas=False)
    model, variables = init_model(cfg)

    def flops_of(fn, *xs):
        lowered = jax.jit(fn).lower(*xs)
        try:  # unoptimized-HLO analysis: no XLA compile needed
            cost = lowered.cost_analysis()
        except Exception:
            cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"])

    rs = np.random.RandomState(0)

    # clip-batch forward (incl. mel frontend)
    b = args.batch
    clip = rs.randint(0, 256, (b, 16, 112, 112, 3)).astype(np.uint8)
    audio = (rs.randn(b, 441000) * 0.1).astype(np.float32)

    def clip_fwd(variables, clip_u8, audio_raw):
        feats = audio_frontend(audio_raw)
        x = {"clip": normalize_clip(clip_u8, dtype=jnp.bfloat16),
             "audio_features": feats}
        return model.apply(variables, x, train=False)

    f_clip = flops_of(clip_fwd, variables, clip, audio)

    # dense-sweep bucket (frame-feature reuse)
    sw = AvformerSweep(cfg, variables)
    lf = cfg.label_frame
    frames = rs.randint(0, 256,
                        (args.bucket + lf, 112, 112, 3)).astype(np.uint8)
    audio_b = (rs.randn(args.bucket, 441000) * 0.1).astype(np.float32)
    idx = np.clip(np.arange(args.bucket)[:, None]
                  + np.arange(0, lf, cfg.dilation)[None, :],
                  0, args.bucket + lf).astype(np.int32)

    def sweep_fwd(frames, audio_raw, idx):
        feats = audio_frontend(audio_raw)
        return sw.fused_sweep(frames, feats, idx)

    f_sweep = flops_of(sweep_fwd, frames, audio_b, idx)

    mel_flops = flops_of(lambda a: audio_frontend(a), audio_b)

    def line(name, flops_total, clips, rate):
        per_clip = flops_total / clips
        tfs = per_clip * rate / 1e12
        print(f"{name:<22} {per_clip / 1e9:8.2f} GFLOP/clip   "
              f"@{rate:8.0f} clips/s -> {tfs:6.1f} TF/s   "
              f"MFU {tfs * 1e12 / V5E_BF16_PEAK * 100:5.1f}% of bf16 peak / "
              f"{tfs * 1e12 / V5E_F32_PEAK * 100:5.1f}% of f32 peak")

    print(f"XLA cost analysis (shapes: bucket={args.bucket}, "
          f"batch={args.batch}, 16f x 112px, 10s audio)")
    line("dense sweep", f_sweep, args.bucket, args.sweep_rate)
    line("clip batch", f_clip, args.batch, args.clip_rate)
    print(f"{'mel frontend share':<22} {mel_flops / args.bucket / 1e9:8.2f} "
          f"GFLOP/clip ({mel_flops / f_sweep * 100:.0f}% of sweep FLOPs, "
          "bf16-contracted at DEFAULT precision)")


if __name__ == "__main__":
    main()
