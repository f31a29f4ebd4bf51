"""CLI alias: `python -m bbbp_tpu.pipelines.train_regress` → bbbp_tpu.train.regression."""

from bbbp_tpu.train.regression import main

if __name__ == "__main__":
    main()
