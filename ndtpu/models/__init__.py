"""Model families: PointNet (FPS baseline), NDT-Net, multiscale NDT-Net++.

Flax Linen modules in channels-last [B, N, C] layout: every 1x1 Conv1d of
the torch reference is a Dense over the trailing feature axis, which XLA
lowers to [B*N, C] matmuls on the MXU — the natural TPU mapping.
"""
from ndtpu.models.tnet import TNet  # noqa: F401
from ndtpu.models.pointnet import (  # noqa: F401
    PointNet,
    PointNetClassification,
    PointNetSegmentation,
)
from ndtpu.models.ndtnet import (  # noqa: F401
    AdditionalFeatures,
    NDTNet,
    NDTNetClassification,
    NDTNetSegmentation,
)
from ndtpu.models.ndtnetpp import (  # noqa: F401
    NDTNetPP,
    NDTNetPPClassification,
    NDTNetPPSegmentation,
    ResidualConnection,
)
