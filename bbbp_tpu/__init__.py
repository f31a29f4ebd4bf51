"""bbbp_tpu — TPU-native multi-modal deep-ensemble framework for BBBP prediction.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
FengDushuo/BBBP-Multi-Modal-Deep-Ensemble-Framework (see SURVEY.md):

- ``bbbp_tpu.chem``      SMILES parser, fingerprints (Morgan/path/MACCS-style),
                         2-D depiction — built from scratch (no RDKit in image),
                         with a threaded C++ fast path in ``bbbp_tpu.native``.
- ``bbbp_tpu.data``      B3DB dataset loaders, ZINC stream readers.
- ``bbbp_tpu.ops``       XLA feature-engineering ops: scaler, PCA, interaction
                         features, isolation forest, SMOTE-Tomek, metrics,
                         tensorized decision-forest engine, packed-bit unpack.
- ``bbbp_tpu.models``    Flax model zoo: dual-branch MLP, Transformer+CNN with
                         attention fusion, SMILES-BERT, flow-MLP, linear zoo.
- ``bbbp_tpu.train``     pjit training loops, K-fold/ensemble mesh parallelism,
                         stacking + voting pipelines.
- ``bbbp_tpu.parallel``  mesh construction, sharding rules, host→device prefetch.
- ``bbbp_tpu.pipelines`` CLI entry points mirroring the reference's scripts
                         (featurize / preprocess / train-classify / train-regress /
                         train-bert / screen).
- ``bbbp_tpu.reporting`` metrics CSVs, plots, attribution (integrated gradients,
                         exact TreeSHAP on the JAX forests).
"""

__version__ = "0.1.0"
