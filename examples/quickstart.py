"""Quickstart: train + evaluate + sweep-infer on a synthetic dataset.

    python examples/quickstart.py            # runs on whatever jax sees
    python examples/quickstart.py --cpu      # force CPU

Mirrors the real workflow at toy scale: synthetic Aff-Wild2-shaped
fixtures -> vformer AU training for 2 epochs -> test-split inference with
per-video submission files.
"""
import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--workdir", default=None)
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from auformer import train_lib
    from auformer.core.config import Config
    from auformer.data.fixtures import generate_synthetic_dataset
    from auformer.infer import run_inference
    from auformer.nn import init_model

    work = args.workdir or tempfile.mkdtemp(prefix="auformer_quickstart_")
    root = os.path.join(work, "root")
    labels = os.path.join(work, "labels")
    print(f"workdir: {work}")
    generate_synthetic_dataset(root, labels, n_videos=4,
                               frames_per_video=40, image_size=64,
                               audio_secs=2.0)

    cfg = Config(root=root, lmdb_label_dir=labels,
                 cache_dir=os.path.join(work, "cache"),
                 exp_dir=os.path.join(work, "exp"),
                 model_name="vformer", modality="V", task="AU",
                 n_frames=4, dilation=2, image_size=64, batch_size=8,
                 downsample_rate=1, epochs=2, eval_batch_mult=1,
                 compute_dtype="float32", use_pallas=False)

    state, history = train_lib.train(cfg)
    print("training history:")
    for h in history:
        print(f"  epoch {h['epoch']}: loss {h['loss']:.4f} "
              f"AU score {h['scores']['AU']['score']:.4f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = run_inference(cfg, variables,
                        result_path=os.path.join(work, "results"))
    print(f"inference: {out.shape} predictions; submission files under "
          f"{os.path.join(work, 'results', 'au')}")


if __name__ == "__main__":
    main()
