from bbbp_tpu.models.fusion import (
    MultiHeadAttentionFusion,
    AttentionFusion,
    MultiModalAttentionFusion,
)
from bbbp_tpu.models.mlp import DualBranchMLP
from bbbp_tpu.models.transformer_cnn import MultiModalRegressor
from bbbp_tpu.models.flow import FlowModel

__all__ = [
    "MultiHeadAttentionFusion",
    "AttentionFusion",
    "MultiModalAttentionFusion",
    "DualBranchMLP",
    "MultiModalRegressor",
    "FlowModel",
]
