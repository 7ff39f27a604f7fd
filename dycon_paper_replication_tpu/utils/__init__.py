"""Cross-cutting subsystems: checkpointing, experiment logging,
similarity monitoring, profiling."""

from .checkpoint import save_checkpoint, restore_checkpoint, best_checkpoint_path
from .logging import ExperimentLogger
