"""Training entry point — CLI-compatible with the reference
(``python train.py -t AU -mn avformer ...``, reference train.py:339-343).
"""
from auformer.core.config import parse_opt
from auformer import train_lib


def main():
    cfg = parse_opt()
    print(f"Task: {cfg.task}")
    print("Model:", cfg.model_name)
    print("Modality:", cfg.modality)
    print("clip size", cfg.n_frames, cfg.image_size)
    train_lib.train(cfg)


if __name__ == "__main__":
    main()
