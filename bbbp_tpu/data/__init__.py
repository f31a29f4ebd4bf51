from bbbp_tpu.data.b3db import (
    load_b3db_regression,
    load_b3db_classification,
    B3DB_REGRESSION_TSV,
    B3DB_CLASSIFICATION_TSV,
)

__all__ = [
    "load_b3db_regression",
    "load_b3db_classification",
    "B3DB_REGRESSION_TSV",
    "B3DB_CLASSIFICATION_TSV",
]
