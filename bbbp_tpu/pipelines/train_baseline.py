"""CLI alias: `python -m bbbp_tpu.pipelines.train_baseline` → bbbp_tpu.train.baseline."""

from bbbp_tpu.train.baseline import main

if __name__ == "__main__":
    main()
