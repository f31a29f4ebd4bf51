"""CLI alias: `python -m bbbp_tpu.pipelines.screen_ensemble` → bbbp_tpu.train.weighted_ensemble."""

from bbbp_tpu.train.weighted_ensemble import main

if __name__ == "__main__":
    main()
