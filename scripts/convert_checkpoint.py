"""Convert a reference .pth checkpoint into an auformer Orbax checkpoint.

    python scripts/convert_checkpoint.py --pth best523.pth \
        --model avformer --out experiments/avformer/pretrain/best

The result loads with core.checkpointing.load_checkpoint (used by
test_aff2.py / --resume).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--model", default="avformer")
    p.add_argument("--out", required=True,
                   help="output checkpoint dir (parent/name)")
    p.add_argument("--modality", default="A;V")
    p.add_argument("--task", default="AU")
    p.add_argument("--cpu", action="store_true",
                   help="convert on CPU (no TPU needed)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from auformer.core.torch_import import CONVERTERS
    if args.model not in CONVERTERS:
        p.error(f"no .pth converter for {args.model!r}; "
                f"available: {sorted(CONVERTERS)}")

    from auformer.core.checkpointing import save_checkpoint
    from auformer.core.config import Config
    from auformer.core.torch_import import (convert_checkpoint,
                                            load_torch_state_dict, merge_into)
    from auformer.nn import init_model

    cfg = Config(model_name=args.model, modality=args.modality,
                 task=args.task, compute_dtype="float32", use_pallas=False)
    model, variables = init_model(cfg)
    sd = load_torch_state_dict(args.pth)
    converted = convert_checkpoint(args.model, sd)
    merged = merge_into({"params": variables["params"],
                         "batch_stats": variables["batch_stats"]}, converted)
    parent, name = os.path.split(os.path.abspath(args.out))
    save_checkpoint(parent, merged, name=name)
    n = sum(1 for _ in __import__("jax").tree_util.tree_leaves(
        merged["params"]))
    print(f"converted {args.pth} -> {args.out} ({n} param tensors)")


if __name__ == "__main__":
    main()
