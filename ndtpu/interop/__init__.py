"""Interop with the torch reference implementation: weight migration."""
from ndtpu.interop.torch_weights import (  # noqa: F401
    map_backbone,
    map_ndtnet_classification,
    map_ndtnet_segmentation,
    map_pointnet_classification,
    map_pointnet_segmentation,
    map_residual_connection,
    map_tnet,
)
