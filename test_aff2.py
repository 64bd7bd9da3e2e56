"""Inference entry point (reference test_aff2.py): loads the best avformer
checkpoint, sweeps the test split, writes per-video AU submission txts and
inference.pkl. Batched on TPU instead of the reference's batch-1 sweep;
AUFORMER_SWEEP=1 selects the frame-feature-reuse dense-sweep path
(auformer/sweep.py, ~2.5x faster, bit-identical logits).
"""
import os

from auformer.core.checkpointing import load_checkpoint
from auformer.core.config import parse_opt
from auformer.infer import run_inference, run_inference_sweep
from auformer.nn import init_model

MODEL_PATH = os.path.join("experiments", "avformer", "pretrain")
RESULT_PATH = "results"


def main():
    cfg = parse_opt()
    cfg.model_name = "avformer"
    cfg.modality = "A;V"
    cfg.task = "AU"
    model, variables = init_model(cfg)
    target = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
    restored = load_checkpoint(MODEL_PATH, "best", target=target)
    if restored is None:
        restored = load_checkpoint(MODEL_PATH, "latest", target=target)
    if restored is None:
        # reference-format .pth (e.g. the shipped best523.pth,
        # test_aff2.py:18,62) via the converter
        import glob
        for pth in sorted(glob.glob(os.path.join(MODEL_PATH, "*.pth"))):
            from auformer.core.torch_import import (convert_checkpoint,
                                                    load_torch_state_dict,
                                                    merge_into)
            restored = merge_into(
                target, convert_checkpoint(
                    "avformer", load_torch_state_dict(pth)))
            print(f"converted torch checkpoint: {pth}")
            break
    if restored is not None:
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        print(f"Loading weight from: {MODEL_PATH}")
    else:
        print("WARNING: no checkpoint found, using random init")
    if os.environ.get("AUFORMER_SWEEP", "1") != "0":
        run_inference_sweep(cfg, variables, result_path=RESULT_PATH)
    else:
        run_inference(cfg, variables, result_path=RESULT_PATH)


if __name__ == "__main__":
    main()
