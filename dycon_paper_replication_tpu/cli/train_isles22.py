"""DyCON-TPU training on ISLES-2022 (reference train_DyCON_ISLES22.py):
teacher kept in eval mode, poly LR decay, n-class Dice, derived mask
kernel, whole-volume validation — all via the isles22 config defaults.
"""

from ..config import config_from_args
from ..train.trainer import Trainer


def main(argv=None) -> float:
    cfg = config_from_args("isles22", argv)
    return Trainer(cfg).run()


if __name__ == "__main__":
    main()
