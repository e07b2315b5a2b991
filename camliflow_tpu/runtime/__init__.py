"""Training / evaluation runtime."""

from .train_state import TrainState, make_eval_step, make_infer_step, make_train_step

__all__ = ["TrainState", "make_eval_step", "make_infer_step", "make_train_step"]
