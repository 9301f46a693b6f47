"""Numerical parity against the torch reference models.

Loads the reference model code from /root/reference (read-only, import-time
ctypes dependency stubbed), migrates its randomly-initialized weights into
the flax models via ndtpu.interop.torch_weights, and checks forward outputs
agree. This pins the architecture (layer sizes, transform application order,
BN placement, activation quirks) far harder than shape tests — and
simultaneously proves the checkpoint-migration path users take when
switching from the reference.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ndtpu.interop import (  # noqa: E402
    map_ndtnet_classification,
    map_ndtnet_segmentation,
    map_pointnet_classification,
    map_pointnet_segmentation,
    map_residual_connection,
    map_tnet,
)
from ndtpu.interop.reference_loader import load_reference_module  # noqa: E402

REF = "/root/reference/ndnet/models"


def t2np(t):
    return t.detach().cpu().numpy()


@pytest.mark.slow
def test_tnet_parity():
    ref = load_reference_module("pointnet", REF)
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
    ref = load_reference_module("pointnet", REF)
    torch.manual_seed(1)
    t_model = ref.PointNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import PointNetSegmentation

    variables = map_pointnet_segmentation(t_model)
    x = np.random.default_rng(1).normal(size=(2, 33, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(x)))  # [B, N, C+1] log-probs
    j_out = np.asarray(
        PointNetSegmentation(num_classes=5, feature_dim=64).apply(
            variables, jnp.asarray(x), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_pointnet_classification_parity():
    ref = load_reference_module("pointnet", REF)
    torch.manual_seed(3)
    t_model = ref.PointNetClassification(
        point_dim=3, num_classes=7, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import PointNetClassification

    variables = map_pointnet_classification(t_model)
    x = np.random.default_rng(3).normal(size=(2, 29, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(x)))[:, :, 0]  # [B, C, 1] -> [B, C]
    j_out = np.asarray(
        PointNetClassification(num_classes=7, feature_dim=64).apply(
            variables, jnp.asarray(x), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_ndtnet_classification_parity():
    ref = load_reference_module("ndtnet", REF)
    torch.manual_seed(4)
    t_model = ref.NDTNetClassification(
        point_dim=3, num_classes=7, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import NDTNetClassification

    variables = map_ndtnet_classification(t_model)
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(2, 29, 3)).astype(np.float32)
    covs = (rng.normal(size=(2, 29, 9)) * 0.1).astype(np.float32)
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(pts), torch.tensor(covs)))[:, :, 0]
    j_out = np.asarray(
        NDTNetClassification(num_classes=7, feature_dim=64).apply(
            variables, jnp.asarray(pts), jnp.asarray(covs), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_residual_connection_parity():
    ref = load_reference_module("ndtnetpp", REF)
    torch.manual_seed(5)
    t_res = ref.ResidualConnection(in_points=12, out_points=5).eval()

    import jax.numpy as jnp

    from ndtpu.models import ResidualConnection

    variables = map_residual_connection(t_res)
    x = np.random.default_rng(5).normal(size=(2, 12, 6)).astype(np.float32)
    # the reference's duplicate dead `forward` (ndtnetpp.py:44-53) overrides
    # the real one and returns None — drive the layers directly instead
    with torch.no_grad():
        t_out = t2np(
            torch.relu(t_res.bn1(t_res.conv1(torch.tensor(x))))
        )
    j_out = np.asarray(
        ResidualConnection(12, 5).apply(variables, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_ndtnet_segmentation_parity():
    ref = load_reference_module("ndtnet", REF)
    torch.manual_seed(2)
    t_model = ref.NDTNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()

    import jax.numpy as jnp

    from ndtpu.models import NDTNetSegmentation

    variables = map_ndtnet_segmentation(t_model)
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(2, 33, 3)).astype(np.float32)
    covs = rng.normal(size=(2, 33, 9)).astype(np.float32) * 0.1
    with torch.no_grad():
        t_out = t2np(t_model(torch.tensor(pts), torch.tensor(covs)))
    j_out = np.asarray(
        NDTNetSegmentation(num_classes=5, feature_dim=64).apply(
            variables, jnp.asarray(pts), jnp.asarray(covs), train=False,
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_batchnorm_running_stats_match_torch():
    """ndtpu.models.norm.BatchNorm replicates torch BatchNorm1d's
    running-statistics semantics (unbiased running var, momentum=0.1
    update) — the train-then-eval trajectory must match, not just the
    eval-at-init forward (which the transplant tests above pin)."""
    import jax
    import jax.numpy as jnp

    from ndtpu.models.norm import BatchNorm

    torch.manual_seed(7)
    t_bn = torch.nn.BatchNorm1d(8)  # momentum 0.1 <-> decay 0.9

    j_bn = BatchNorm(use_running_average=False, momentum=0.9)
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=(4, 8)).astype(np.float32) * 3.0 + 1.0
    variables = j_bn.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    stats = variables["batch_stats"]

    t_bn.train()
    for i in range(3):
        x = rng.normal(size=(4, 8)).astype(np.float32) * (i + 1)
        t_out = t_bn(torch.tensor(x)).detach().numpy()
        j_out, mut = j_bn.apply(
            {"params": variables["params"], "batch_stats": stats},
            jnp.asarray(x), mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(stats["mean"]), t_bn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), t_bn.running_var.numpy(), rtol=1e-5
    )

    t_bn.eval()
    xe = rng.normal(size=(4, 8)).astype(np.float32)
    t_out = t_bn(torch.tensor(xe)).detach().numpy()
    j_out = BatchNorm(use_running_average=True).apply(
        {"params": variables["params"], "batch_stats": stats},
        jnp.asarray(xe),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=1e-5)


def test_export_roundtrip_ndtnet_segmentation():
    """Reverse migration (flax -> torch, ndtpu.interop.export_torch): load
    mapped variables into a DIFFERENTLY-initialized torch instance and the
    two torch models agree exactly — users can torch.save trained ndtpu
    weights for reference deployments."""
    from ndtpu.interop import export_ndtnet_segmentation

    ref = load_reference_module("ndtnet", REF)
    torch.manual_seed(5)
    t_src = ref.NDTNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()
    variables = map_ndtnet_segmentation(t_src)

    torch.manual_seed(99)  # deliberately different init
    t_dst = ref.NDTNetSegmentation(
        point_dim=3, num_classes=5, feature_dim=64
    ).eval()
    export_ndtnet_segmentation(variables, t_dst)

    rng = np.random.default_rng(5)
    pts = torch.tensor(rng.normal(size=(2, 33, 3)).astype(np.float32))
    covs = torch.tensor(
        rng.normal(size=(2, 33, 9)).astype(np.float32) * 0.1
    )
    with torch.no_grad():
        np.testing.assert_array_equal(
            t2np(t_src(pts, covs)), t2np(t_dst(pts, covs))
        )


def test_export_roundtrip_pointnet_classification():
    from ndtpu.interop import export_pointnet_classification

    ref = load_reference_module("pointnet", REF)
    torch.manual_seed(6)
    t_src = ref.PointNetClassification(
        point_dim=3, num_classes=4, feature_dim=64
    ).eval()
    variables = map_pointnet_classification(t_src)
    torch.manual_seed(77)
    t_dst = ref.PointNetClassification(
        point_dim=3, num_classes=4, feature_dim=64
    ).eval()
    export_pointnet_classification(variables, t_dst)
    pts = torch.tensor(
        np.random.default_rng(6).normal(size=(2, 29, 3)).astype(np.float32)
    )
    with torch.no_grad():
        np.testing.assert_array_equal(t2np(t_src(pts)), t2np(t_dst(pts)))
