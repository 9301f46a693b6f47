"""Numerical parity against the torch reference models.

Loads the reference model code from /root/reference (read-only, import-time
ctypes dependency stubbed), copies its randomly-initialized weights into the
flax models, and checks forward outputs agree. This pins the architecture
(layer sizes, transform application order, BN placement, activation quirks)
far harder than shape tests.

Weight mapping: torch Conv1d(k=1).weight [out,in,1] -> Dense kernel [in,out];
Linear.weight [out,in] -> kernel [in,out]; BatchNorm1d -> BatchNorm
scale/bias (+ running stats). Eval mode on both sides (running stats:
mean 0, var 1 at init).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/ndnet/models"


def load_reference_module(name, path):
    """Import a reference model file with its ndt_legacy ctypes import
    stubbed (libndnet.so does not exist in this image)."""
    if "ndnet" not in sys.modules:
        pkg = types.ModuleType("ndnet")
        pkg.__path__ = ["/root/reference/ndnet"]
        sys.modules["ndnet"] = pkg
        pre = types.ModuleType("ndnet.preprocessing")
        pre.__path__ = ["/root/reference/ndnet/preprocessing"]
        sys.modules["ndnet.preprocessing"] = pre
        legacy = types.ModuleType("ndnet.preprocessing.ndt_legacy")
        legacy.NDT_Sampler = object
        sys.modules["ndnet.preprocessing.ndt_legacy"] = legacy
        models = types.ModuleType("ndnet.models")
        models.__path__ = [REF]
        sys.modules["ndnet.models"] = models
    spec = importlib.util.spec_from_file_location(f"ndnet.models.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"ndnet.models.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def t2np(t):
    return t.detach().cpu().numpy()


def conv_kernel(conv):
    return t2np(conv.weight)[:, :, 0].T  # [in, out]


def linear_kernel(lin):
    return t2np(lin.weight).T


def map_tnet(t_tnet):
    """torch TNet -> flax TNet param/batch_stats dicts."""
    params = {}
    stats = {}
    convs = [t_tnet.conv1, t_tnet.conv2, t_tnet.conv3]
    fcs = [t_tnet.fc1, t_tnet.fc2, t_tnet.fc3]
    bns = [t_tnet.bn1, t_tnet.bn2, t_tnet.bn3, t_tnet.bn4, t_tnet.bn5]
    for i, c in enumerate(convs):
        params[f"Dense_{i}"] = {
            "kernel": conv_kernel(c), "bias": t2np(c.bias)
        }
    for i, l in enumerate(fcs):
        params[f"Dense_{i + 3}"] = {
            "kernel": linear_kernel(l), "bias": t2np(l.bias)
        }
    for i, b in enumerate(bns):
        params[f"BatchNorm_{i}"] = {
            "scale": t2np(b.weight), "bias": t2np(b.bias)
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": t2np(b.running_mean), "var": t2np(b.running_var)
        }
    return params, stats


def map_backbone(t_net):
    """torch PointNet/NDTNet backbone -> flax params/stats (shared layout:
    TNet_0, TNet_1, Dense_0..2, BatchNorm_0..2)."""
    params, stats = {}, {}
    p, s = map_tnet(t_net.t1)
    params["TNet_0"], stats["TNet_0"] = p, s
    p, s = map_tnet(t_net.t2)
    params["TNet_1"], stats["TNet_1"] = p, s
    for i, c in enumerate([t_net.conv1, t_net.conv2, t_net.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": t2np(c.bias)}
    for i, b in enumerate([t_net.bn1, t_net.bn2, t_net.bn3]):
        params[f"BatchNorm_{i}"] = {
            "scale": t2np(b.weight), "bias": t2np(b.bias)
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": t2np(b.running_mean), "var": t2np(b.running_var)
        }
    return params, stats


@pytest.mark.slow
def test_tnet_parity():
    ref = load_reference_module("pointnet", f"{REF}/pointnet.py")
    torch.manual_seed(0)
    t_tnet = ref.TNet(in_dim=3).eval()

    import jax.numpy as jnp

    from ndtpu.models import TNet

    params, stats = map_tnet(t_tnet)
    x = np.random.default_rng(0).normal(size=(2, 17, 3)).astype(np.float32)

    with torch.no_grad():
        t_out = t2np(t_tnet(torch.tensor(x).transpose(2, 1)))
    j_out = np.asarray(
        TNet(in_dim=3).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_pointnet_segmentation_parity():
    ref = load_reference_module("pointnet", f"{REF}/pointnet.py")
    torch.manual_seed(1)
    t_model = ref.PointNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import PointNetSegmentation

    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {"PointNet_0": bb_params}
    stats = {"PointNet_0": bb_stats}
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": t2np(c.bias)}
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        params[f"BatchNorm_{i}"] = {
            "scale": t2np(b.weight), "bias": t2np(b.bias)
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": t2np(b.running_mean), "var": t2np(b.running_var)
        }

    x = np.random.default_rng(1).normal(size=(2, 33, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(x)))  # [B, N, C+1] log-probs
    j_out = np.asarray(
        PointNetSegmentation(num_classes=5, feature_dim=64).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_pointnet_classification_parity():
    ref = load_reference_module("pointnet", f"{REF}/pointnet.py")
    torch.manual_seed(3)
    t_model = ref.PointNetClassification(
        point_dim=3, num_classes=7, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import PointNetClassification

    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {"PointNet_0": bb_params}
    stats = {"PointNet_0": bb_stats}
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": t2np(c.bias)}

    x = np.random.default_rng(3).normal(size=(2, 29, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(x)))[:, :, 0]  # [B, C, 1] -> [B, C]
    j_out = np.asarray(
        PointNetClassification(num_classes=7, feature_dim=64).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_ndtnet_classification_parity():
    ref = load_reference_module("ndtnet", f"{REF}/ndtnet.py")
    torch.manual_seed(4)
    t_model = ref.NDTNetClassification(
        point_dim=3, num_classes=7, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import NDTNetClassification

    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {"NDTNet_0": bb_params}
    stats = {"NDTNet_0": bb_stats}
    for i, c in enumerate([t_model.conv1, t_model.conv2, t_model.conv3]):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": t2np(c.bias)}

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(2, 29, 3)).astype(np.float32)
    covs = (rng.normal(size=(2, 29, 9)) * 0.1).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(pts), torch.tensor(covs)))[:, :, 0]
    j_out = np.asarray(
        NDTNetClassification(num_classes=7, feature_dim=64).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(pts), jnp.asarray(covs), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_residual_connection_parity():
    ref = load_reference_module("ndtnetpp", f"{REF}/ndtnetpp.py")
    torch.manual_seed(5)
    t_res = ref.ResidualConnection(in_points=12, out_points=5).eval()

    import jax.numpy as jnp

    from ndtpu.models import ResidualConnection

    params = {
        "Dense_0": {
            "kernel": conv_kernel(t_res.conv1), "bias": t2np(t_res.conv1.bias)
        },
        "BatchNorm_0": {
            "scale": t2np(t_res.bn1.weight), "bias": t2np(t_res.bn1.bias)
        },
    }
    stats = {
        "BatchNorm_0": {
            "mean": t2np(t_res.bn1.running_mean),
            "var": t2np(t_res.bn1.running_var),
        }
    }
    x = np.random.default_rng(5).normal(size=(2, 12, 6)).astype(np.float32)
    # the reference's duplicate dead `forward` (ndtnetpp.py:44-53) overrides
    # the real one and returns None — drive the layers directly instead
    with torch.no_grad():
        t_out = t2np(
            torch.relu(t_res.bn1(t_res.conv1(torch.tensor(x))))
        )
    j_out = np.asarray(
        ResidualConnection(12, 5).apply(
            {"params": params, "batch_stats": stats}, jnp.asarray(x),
            train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_ndtnet_segmentation_parity():
    ref = load_reference_module("ndtnet", f"{REF}/ndtnet.py")
    torch.manual_seed(2)
    t_model = ref.NDTNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import NDTNetSegmentation

    bb_params, bb_stats = map_backbone(t_model.feature_extractor)
    params = {"NDTNet_0": bb_params}
    stats = {"NDTNet_0": bb_stats}
    for i, c in enumerate(
        [t_model.conv1, t_model.conv2, t_model.conv3, t_model.conv4]
    ):
        params[f"Dense_{i}"] = {"kernel": conv_kernel(c), "bias": t2np(c.bias)}
    for i, b in enumerate([t_model.bn1, t_model.bn2, t_model.bn3]):
        params[f"BatchNorm_{i}"] = {
            "scale": t2np(b.weight), "bias": t2np(b.bias)
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": t2np(b.running_mean), "var": t2np(b.running_var)
        }

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2, 33, 3)).astype(np.float32)
    covs = rng.normal(size=(2, 33, 9)).astype(np.float32) * 0.1
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(pts), torch.tensor(covs)))
    j_out = np.asarray(
        NDTNetSegmentation(num_classes=5, feature_dim=64).apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(pts), jnp.asarray(covs), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)
