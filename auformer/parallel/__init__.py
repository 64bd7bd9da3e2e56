from .step import (TrainState, create_train_state, make_train_step,
                   make_multi_train_step, make_eval_step, stack_batches,
                   make_device_stacker, make_clip_expander,
                   expand_dedup_batch, trainable_mask, FROZEN_PREFIXES)

__all__ = ["TrainState", "create_train_state", "make_train_step",
           "make_multi_train_step", "make_eval_step", "stack_batches",
           "make_device_stacker", "make_clip_expander", "expand_dedup_batch",
           "trainable_mask", "FROZEN_PREFIXES"]
