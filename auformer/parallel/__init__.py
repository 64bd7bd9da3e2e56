from .step import (TrainState, create_train_state, make_train_step,
                   make_eval_step, trainable_mask, FROZEN_PREFIXES)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_eval_step", "trainable_mask", "FROZEN_PREFIXES"]
