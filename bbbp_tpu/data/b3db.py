"""B3DB dataset loaders.

The B3DB dataset (theochem/B3DB, CC0) ships inside the reference checkout; we
read the TSVs directly from the read-only mount rather than vendoring copies
(reference: B3DB/B3DB/B3DB_regression.tsv — 1,060 molecules with logBB;
B3DB/B3DB/B3DB_classification.tsv — 7,809 molecules with BBB+/BBB- labels).
Set ``BBBP_B3DB_DIR`` to point elsewhere.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd

_DEFAULT_DIR = os.environ.get("BBBP_B3DB_DIR", "/root/reference/B3DB/B3DB")
B3DB_REGRESSION_TSV = os.path.join(_DEFAULT_DIR, "B3DB_regression.tsv")
B3DB_CLASSIFICATION_TSV = os.path.join(_DEFAULT_DIR, "B3DB_classification.tsv")


@dataclass
class RegressionData:
    smiles: list
    logbb: np.ndarray        # float32 [N]
    numbers: np.ndarray      # original `NO.` column, int [N]
    frame: pd.DataFrame

    def __len__(self) -> int:
        return len(self.smiles)


@dataclass
class ClassificationData:
    smiles: list
    labels: np.ndarray       # int32 [N], 1 = BBB+, 0 = BBB-
    numbers: np.ndarray
    frame: pd.DataFrame

    def __len__(self) -> int:
        return len(self.smiles)


def load_b3db_regression(path: Optional[str] = None) -> RegressionData:
    path = path or B3DB_REGRESSION_TSV
    df = pd.read_csv(path, sep="\t")
    required = {"SMILES", "logBB", "NO."}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"B3DB regression TSV missing columns: {missing}")
    df = df.dropna(subset=["SMILES", "logBB"]).reset_index(drop=True)
    return RegressionData(
        smiles=df["SMILES"].astype(str).tolist(),
        logbb=df["logBB"].to_numpy(dtype=np.float32),
        numbers=df["NO."].to_numpy(dtype=np.int64),
        frame=df,
    )


def load_b3db_classification(path: Optional[str] = None) -> ClassificationData:
    path = path or B3DB_CLASSIFICATION_TSV
    df = pd.read_csv(path, sep="\t")
    required = {"SMILES", "BBB+/BBB-", "NO."}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"B3DB classification TSV missing columns: {missing}")
    df = df.dropna(subset=["SMILES", "BBB+/BBB-"]).reset_index(drop=True)
    labels = (df["BBB+/BBB-"].astype(str).str.strip() == "BBB+").to_numpy(dtype=np.int32)
    return ClassificationData(
        smiles=df["SMILES"].astype(str).tolist(),
        labels=labels,
        numbers=df["NO."].to_numpy(dtype=np.int64),
        frame=df,
    )
