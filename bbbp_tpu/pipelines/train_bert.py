"""CLI alias: `python -m bbbp_tpu.pipelines.train_bert` → bbbp_tpu.train.bert_pipeline."""

from bbbp_tpu.train.bert_pipeline import main

if __name__ == "__main__":
    main()
