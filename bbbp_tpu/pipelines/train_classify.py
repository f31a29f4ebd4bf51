"""CLI alias: `python -m bbbp_tpu.pipelines.train_classify` → bbbp_tpu.train.classification."""

from bbbp_tpu.train.classification import main

if __name__ == "__main__":
    main()
