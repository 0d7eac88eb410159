"""CLI twin of the reference's ``python train.py`` (train.py:489-504).

Trains the globe height model for 20 epochs, then evaluates per region,
writing the same acc txt/csv artifacts.
"""
import sys

from srbh_tpu.train.config import get_args
from srbh_tpu.train.trainer import main, main_test

if __name__ == "__main__":
    args = get_args(city="globe", argv=sys.argv[1:])
    args.maxepoch = 20  # "20 is enough" (train.py:491)
    main(args)
    args.checkpoint = "checkpoint20"
    main_test(args, num_sample=100)
    for city in ("china", "eu", "usa"):
        args.testlist = f"datalist_{city}_test_0.7_test_0.3.csv"
        main_test(args, num_sample=0, suffix=city)
