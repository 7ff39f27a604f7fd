"""Training core: TrainState pytree, the jitted DyCON train step, and
the host-side Trainer loop."""

from .state import TrainState, create_train_state
from .step import build_train_step, StepScalars
