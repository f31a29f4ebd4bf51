"""CLI alias: `python -m bbbp_tpu.pipelines.train_flow` → bbbp_tpu.train.flow_pipeline."""

from bbbp_tpu.train.flow_pipeline import main

if __name__ == "__main__":
    main()
