"""Interop with the torch reference implementation: weight migration in
both directions (torch checkpoint -> flax, trained flax -> torch)."""
from ndtpu.interop.export_torch import (  # noqa: F401
    export_ndtnet_classification,
    export_ndtnet_segmentation,
    export_ndtnetpp_classification,
    export_ndtnetpp_segmentation,
    export_pointnet_classification,
    export_pointnet_segmentation,
    export_residual_connection,
)
from ndtpu.interop.torch_weights import (  # noqa: F401
    map_backbone,
    map_ndtnet_classification,
    map_ndtnet_segmentation,
    map_ndtnetpp_classification,
    map_ndtnetpp_segmentation,
    map_pointnet_classification,
    map_pointnet_segmentation,
    map_residual_connection,
    map_tnet,
)
