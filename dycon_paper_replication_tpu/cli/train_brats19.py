"""DyCON-TPU training on BraTS-2019 (reference train_DyCON_BraTS19.py).

Multi-chip note: the reference's DataParallel flags (--gpu_ids,
--use_ddp) are accepted but scaling is controlled by --data_parallel
(number of mesh devices; 0 = all visible chips).
"""

from ..config import config_from_args
from ..train.trainer import Trainer


def main(argv=None) -> float:
    cfg = config_from_args("brats19", argv)
    return Trainer(cfg).run()


if __name__ == "__main__":
    main()
