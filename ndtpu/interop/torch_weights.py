"""Torch-reference checkpoint migration: torch state -> flax variables.

Users of the reference (carlostojal/NDT-Net) hold `torch.save`d state dicts
of its models (`ndnet/models/pointnet.py:7-214`, `ndtnet.py:65-243`,
`ndtnetpp.py:8-53`). These helpers map a *torch module instance* (load the
state dict into one first) onto the exactly-equivalent ndtpu flax modules,
so trained reference checkpoints carry over without retraining.

Mapping rules:
  torch Conv1d(k=1).weight [out, in, 1] -> flax Dense kernel [in, out]
  torch Linear.weight [out, in]         -> flax Dense kernel [in, out]
  torch BatchNorm1d weight/bias/running_{mean,var}
        -> flax BatchNorm scale/bias + batch_stats mean/var

The equivalence of the mapped models is pinned numerically by
tests/test_torch_parity.py (forward outputs agree to ~1e-4).
"""
from __future__ import annotations


def _t2np(t):
    # copy() matters: torch .numpy() shares storage, and on the CPU
    # backend jnp.asarray can adopt a numpy buffer without copying — the
    # mapped flax params would then alias the live torch parameters, and
    # training/perturbing the torch model in place would silently mutate
    # the "transplanted" jax weights (observed in the parity harness's
    # perturbation controls).
    return t.detach().cpu().numpy().copy()


def conv_kernel(conv):
    """torch Conv1d(k=1) weight -> flax Dense kernel [in, out]."""
    return _t2np(conv.weight)[:, :, 0].T


def linear_kernel(lin):
    return _t2np(lin.weight).T


def _bn(b):
    params = {"scale": _t2np(b.weight), "bias": _t2np(b.bias)}
    stats = {"mean": _t2np(b.running_mean), "var": _t2np(b.running_var)}
    return params, stats


def map_tnet(t_tnet):
    """torch TNet (pointnet.py:7-62 / ndtnet.py:7-62) -> flax TNet
    (params, batch_stats) dicts."""
    params, stats = {}, {}
    for i, c in enumerate([t_tnet.conv1, t_tnet.conv2, t_tnet.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    for i, l in enumerate([t_tnet.fc1, t_tnet.fc2, t_tnet.fc3]):
        params[f"Dense_{i + 3}"] = {
            "kernel": linear_kernel(l), "bias": _t2np(l.bias)
        }
    for i, b in enumerate(
        [t_tnet.bn1, t_tnet.bn2, t_tnet.bn3, t_tnet.bn4, t_tnet.bn5]
    ):
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(b)
    return params, stats


def map_backbone(t_net):
    """torch PointNet/NDTNet backbone (pointnet.py:65-135 /
    ndtnet.py:100-164) -> flax params/stats (shared layout: TNet_0, TNet_1,
    Dense_0..2, BatchNorm_0..2)."""
    params, stats = {}, {}
    params["TNet_0"], stats["TNet_0"] = map_tnet(t_net.t1)
    params["TNet_1"], stats["TNet_1"] = map_tnet(t_net.t2)
    for i, c in enumerate([t_net.conv1, t_net.conv2, t_net.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    for i, b in enumerate([t_net.bn1, t_net.bn2, t_net.bn3]):
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(b)
    return params, stats


def _head_segmentation(t_model, backbone_key):
    """Shared segmentation-head mapping (4 convs, 3 BNs —
    pointnet.py:169-214 / ndtnet.py:198-243)."""
    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {backbone_key: bb_params}
    stats = {backbone_key: bb_stats}
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(b)
    return {"params": params, "batch_stats": stats}


def _head_classification(t_model, backbone_key):
    """Shared classification-head mapping (3 convs, no BN —
    pointnet.py:137-167 / ndtnet.py:166-196)."""
    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {backbone_key: bb_params}
    stats = {backbone_key: bb_stats}
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    return {"params": params, "batch_stats": stats}


def map_pointnet_segmentation(t_model):
    """torch PointNetSegmentation -> flax variables dict."""
    return _head_segmentation(t_model, "PointNet_0")


def map_pointnet_classification(t_model):
    return _head_classification(t_model, "PointNet_0")


def map_ndtnet_segmentation(t_model):
    """torch NDTNetSegmentation (ndtnet.py:198-243) -> flax variables."""
    return _head_segmentation(t_model, "NDTNet_0")


def map_ndtnet_classification(t_model):
    """torch NDTNetClassification (ndtnet.py:166-196) -> flax variables."""
    return _head_classification(t_model, "NDTNet_0")


def map_residual_connection(t_res):
    """torch ResidualConnection (ndtnetpp.py:8-41) -> flax variables."""
    bn_params, bn_stats = _bn(t_res.bn1)
    return {
        "params": {
            "Dense_0": {
                "kernel": conv_kernel(t_res.conv1),
                "bias": _t2np(t_res.conv1.bias),
            },
            "BatchNorm_0": bn_params,
        },
        "batch_stats": {"BatchNorm_0": bn_stats},
    }


def map_ndtnetpp_extractor(t_pp):
    """torch `ndnet` two-branch extractor (ndtnetpp.py:55-134) -> flax
    NDTNetPP (params, stats) subtrees. Flax call order fixes submodule
    names: ndtnet1 -> NDTNet_0, residual -> ResidualConnection_0,
    ndtnet2 -> NDTNet_1 (shared across both uses, like the reference's
    single self.ndtnet2), merge conv/bn -> Dense_0/BatchNorm_0."""
    params, stats = {}, {}
    params["NDTNet_0"], stats["NDTNet_0"] = map_backbone(t_pp.ndtnet1)
    params["NDTNet_1"], stats["NDTNet_1"] = map_backbone(t_pp.ndtnet2)
    rv = map_residual_connection(t_pp.residual)
    params["ResidualConnection_0"] = rv["params"]
    stats["ResidualConnection_0"] = rv["batch_stats"]
    params["Dense_0"] = {
        "kernel": conv_kernel(t_pp.conv1), "bias": _t2np(t_pp.conv1.bias)
    }
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(t_pp.bn1)
    return params, stats


def map_ndtnetpp_segmentation(t_model):
    """torch ndnetSegmentation (ndtnetpp.py:180-240) -> flax
    NDTNetPPSegmentation variables. Requires a bug-patched reference
    instance (reference_loader.load_reference_module("ndtnetpp",
    patched=True) — the verbatim module's dead duplicate forward breaks
    its own ResidualConnection)."""
    params, stats = {}, {}
    params["NDTNetPP_0"], stats["NDTNetPP_0"] = map_ndtnetpp_extractor(
        t_model.ndnet
    )
    rv = map_residual_connection(t_model.residual)
    params["ResidualConnection_0"] = rv["params"]
    stats["ResidualConnection_0"] = rv["batch_stats"]
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(b)
    return {"params": params, "batch_stats": stats}


def map_ndtnetpp_classification(t_model):
    """torch ndnetClassification (ndtnetpp.py:136-178; needs the patched
    loader — `super().__init()` typo) -> flax NDTNetPPClassification."""
    params, stats = {}, {}
    params["NDTNetPP_0"], stats["NDTNetPP_0"] = map_ndtnetpp_extractor(
        t_model.feature_extractor
    )
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": _t2np(c.bias)}
    return {"params": params, "batch_stats": stats}
