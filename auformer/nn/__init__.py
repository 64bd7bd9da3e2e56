from .registry import build_model, init_model, loss_suite, example_batch

__all__ = ["build_model", "init_model", "loss_suite", "example_batch"]
