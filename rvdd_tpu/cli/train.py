"""Training CLI (reference: train.py).

    python -m rvdd_tpu.cli.train --dataroot ... --val_dataroot ... \
        --netDenoiser newunet-mode=feat --feature_rec --future_patch_depth 1
"""

from rvdd_tpu.config import parse_options
from rvdd_tpu.training.loop import train


def main(argv=None):
    opt = parse_options(argv, train=True)
    train(opt)


if __name__ == "__main__":
    main()
