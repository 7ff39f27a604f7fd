"""DyCON-TPU training on Pancreas-CT (reference train_DyCON_Pancreas.py).

    python -m dycon_paper_replication_tpu.cli.train_pancreas \
        --root_dir ../data/Pancreas --labelnum 12 --batch_size 8
"""

from ..config import config_from_args
from ..train.trainer import Trainer


def main(argv=None) -> float:
    cfg = config_from_args("pancreas", argv)
    return Trainer(cfg).run()


if __name__ == "__main__":
    main()
