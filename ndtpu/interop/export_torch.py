"""Reverse checkpoint migration: flax variables -> torch reference models.

The inverse of `torch_weights`: load trained ndtpu parameters into a
torch reference module instance (`/root/reference/ndnet/models/
pointnet.py:7-214`, `ndtnet.py:65-243`) so its `state_dict()` can be
`torch.save`d and consumed by reference deployments. Round-trip
equivalence (torch -> flax -> torch) is pinned by
tests/test_torch_parity.py.

Mapping rules (inverse of torch_weights):
  flax Dense kernel [in, out] -> torch Conv1d(k=1).weight [out, in, 1]
                               | torch Linear.weight [out, in]
  flax BatchNorm scale/bias + batch_stats mean/var
      -> torch BatchNorm1d weight/bias/running_{mean,var}
"""
from __future__ import annotations

import numpy as np


def _copy(t_param, array):
    import torch

    a = np.ascontiguousarray(np.asarray(array, dtype=np.float32))
    with torch.no_grad():
        t_param.copy_(torch.from_numpy(a))


def _set_conv(conv, p):
    _copy(conv.weight, np.asarray(p["kernel"]).T[:, :, None])
    _copy(conv.bias, p["bias"])


def _set_linear(lin, p):
    _copy(lin.weight, np.asarray(p["kernel"]).T)
    _copy(lin.bias, p["bias"])


def _set_bn(bn, p, s):
    _copy(bn.weight, p["scale"])
    _copy(bn.bias, p["bias"])
    _copy(bn.running_mean, s["mean"])
    _copy(bn.running_var, s["var"])


def export_tnet(params, stats, t_tnet):
    for i, c in enumerate([t_tnet.conv1, t_tnet.conv2, t_tnet.conv3]):
        _set_conv(c, params[f"Dense_{i}"])
    for i, l in enumerate([t_tnet.fc1, t_tnet.fc2, t_tnet.fc3]):
        _set_linear(l, params[f"Dense_{i + 3}"])
    for i, b in enumerate(
        [t_tnet.bn1, t_tnet.bn2, t_tnet.bn3, t_tnet.bn4, t_tnet.bn5]
    ):
        _set_bn(b, params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"])


def export_backbone(params, stats, t_net):
    export_tnet(params["TNet_0"], stats["TNet_0"], t_net.t1)
    export_tnet(params["TNet_1"], stats["TNet_1"], t_net.t2)
    for i, c in enumerate([t_net.conv1, t_net.conv2, t_net.conv3]):
        _set_conv(c, params[f"Dense_{i}"])
    for i, b in enumerate([t_net.bn1, t_net.bn2, t_net.bn3]):
        _set_bn(b, params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"])


def _export_segmentation(variables, t_model, backbone_key):
    params = variables["params"]
    stats = variables["batch_stats"]
    export_backbone(
        params[backbone_key], stats[backbone_key], t_model.feature_extractor
    )
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        _set_conv(c, params[f"Dense_{i}"])
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        _set_bn(b, params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"])
    return t_model


def _export_classification(variables, t_model, backbone_key):
    params = variables["params"]
    stats = variables["batch_stats"]
    export_backbone(
        params[backbone_key], stats[backbone_key], t_model.feature_extractor
    )
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        _set_conv(c, params[f"Dense_{i}"])
    return t_model


def export_pointnet_segmentation(variables, t_model):
    """flax variables -> torch PointNetSegmentation instance (in place)."""
    return _export_segmentation(variables, t_model, "PointNet_0")


def export_pointnet_classification(variables, t_model):
    return _export_classification(variables, t_model, "PointNet_0")


def export_ndtnet_segmentation(variables, t_model):
    """flax variables -> torch NDTNetSegmentation instance (in place)."""
    return _export_segmentation(variables, t_model, "NDTNet_0")


def export_ndtnet_classification(variables, t_model):
    return _export_classification(variables, t_model, "NDTNet_0")


def export_residual_connection(variables, t_res):
    """flax ResidualConnection variables -> torch instance (in place)."""
    _set_conv(t_res.conv1, variables["params"]["Dense_0"])
    _set_bn(
        t_res.bn1,
        variables["params"]["BatchNorm_0"],
        variables["batch_stats"]["BatchNorm_0"],
    )
    return t_res


def _export_residual_subtree(params, stats, t_res):
    export_residual_connection(
        {"params": params, "batch_stats": stats}, t_res
    )


def _export_ndtnetpp_extractor(params, stats, t_pp):
    """flax NDTNetPP subtrees -> torch `ndnet` extractor (inverse of
    torch_weights.map_ndtnetpp_extractor)."""
    export_backbone(params["NDTNet_0"], stats["NDTNet_0"], t_pp.ndtnet1)
    export_backbone(params["NDTNet_1"], stats["NDTNet_1"], t_pp.ndtnet2)
    _export_residual_subtree(
        params["ResidualConnection_0"], stats["ResidualConnection_0"],
        t_pp.residual,
    )
    _set_conv(t_pp.conv1, params["Dense_0"])
    _set_bn(t_pp.bn1, params["BatchNorm_0"], stats["BatchNorm_0"])


def export_ndtnetpp_segmentation(variables, t_model):
    """flax NDTNetPPSegmentation variables -> torch ndnetSegmentation
    instance (in place; use the patched loader to construct it). The
    shipped state_dict targets a bug-patched reference deployment — the
    verbatim reference multiscale classes cannot run (SURVEY.md §2.4)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    _export_ndtnetpp_extractor(
        params["NDTNetPP_0"], stats["NDTNetPP_0"], t_model.ndnet
    )
    _export_residual_subtree(
        params["ResidualConnection_0"], stats["ResidualConnection_0"],
        t_model.residual,
    )
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        _set_conv(c, params[f"Dense_{i}"])
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        _set_bn(b, params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"])
    return t_model


def export_ndtnetpp_classification(variables, t_model):
    """flax NDTNetPPClassification variables -> torch ndnetClassification
    (patched loader required: `super().__init()` typo)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    _export_ndtnetpp_extractor(
        params["NDTNetPP_0"], stats["NDTNetPP_0"], t_model.feature_extractor
    )
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        _set_conv(c, params[f"Dense_{i}"])
    return t_model
