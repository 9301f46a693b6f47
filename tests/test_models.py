"""Model golden-shape and behavior tests (the reference has none —
SURVEY.md §4 'Model/trainer tests: none')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndtpu.core.ndt import ndt_downsample
from ndtpu.models import (
    NDTNet,
    NDTNetClassification,
    NDTNetPP,
    NDTNetPPClassification,
    NDTNetPPSegmentation,
    NDTNetSegmentation,
    PointNet,
    PointNetClassification,
    PointNetSegmentation,
    ResidualConnection,
    TNet,
)

B, N, C = 2, 32, 5
KEY = jax.random.PRNGKey(0)


def init_and_apply(model, *args, **kwargs):
    variables = model.init(KEY, *args, **kwargs)
    out = model.apply(*(variables, *args), **kwargs)
    return variables, out


def test_tnet_shapes_and_identity_bias():
    x = jnp.zeros((B, N, 3))
    model = TNet(in_dim=3)
    variables, t = init_and_apply(model, x)
    assert t.shape == (B, 3, 3)
    # zero input + zero-init final dense => exactly the identity (pointnet.py:59)
    np.testing.assert_allclose(
        np.asarray(t), np.broadcast_to(np.eye(3), (B, 3, 3)), atol=1e-5
    )


def test_pointnet_backbone_shapes():
    x = jax.random.normal(KEY, (B, N, 3))
    feats_t = init_and_apply(PointNet(feature_dim=64), x)[1]
    feats, x_t2 = feats_t
    assert feats.shape == (B, N, 64)
    assert x_t2.shape == (B, N, 64)


def test_pointnet_heads():
    x = jax.random.normal(KEY, (B, N, 3))
    probs = init_and_apply(PointNetClassification(num_classes=C, feature_dim=64), x)[1]
    assert probs.shape == (B, C)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)

    logp = init_and_apply(PointNetSegmentation(num_classes=C, feature_dim=64), x)[1]
    assert logp.shape == (B, N, C + 1)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4
    )


def test_ndtnet_backbone_and_cov_rotation():
    pts = jax.random.normal(KEY, (B, N, 3))
    covs = jax.random.normal(jax.random.PRNGKey(1), (B, N, 9))
    model = NDTNet(feature_dim=64)
    variables, (feats, x_t2) = init_and_apply(model, pts, covs)
    assert feats.shape == (B, N, 64) and x_t2.shape == (B, N, 64)


def test_ndtnet_heads():
    pts = jax.random.normal(KEY, (B, N, 3))
    covs = jax.random.normal(jax.random.PRNGKey(1), (B, N, 9))
    probs = init_and_apply(
        NDTNetClassification(num_classes=C, feature_dim=64), pts, covs
    )[1]
    assert probs.shape == (B, C)
    logits = init_and_apply(
        NDTNetClassification(num_classes=C, feature_dim=64), pts, covs,
        return_logits=True,
    )[1]
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(logits, -1)), np.asarray(probs), rtol=2e-5, atol=1e-6
    )

    logp = init_and_apply(
        NDTNetSegmentation(num_classes=C, feature_dim=64), pts, covs
    )[1]
    assert logp.shape == (B, N, C + 1)


def test_residual_connection_resizes_points_axis():
    x = jax.random.normal(KEY, (B, 16, 8))
    out = init_and_apply(ResidualConnection(16, 6), x)[1]
    assert out.shape == (B, 6, 8)


def make_multiscale_inputs(fine, coarse):
    rng = np.random.default_rng(3)
    centers = rng.uniform(-4, 4, size=(30, 3))
    pts = (
        (centers[:, None, :] + rng.normal(scale=0.25, size=(30, 12, 3)))
        .reshape(-1, 3)
        .astype(np.float32)
    )
    batch = jnp.stack([jnp.asarray(pts), jnp.asarray(pts) * 1.1])

    fine_fn = jax.vmap(lambda p: ndt_downsample(p, fine))
    p1, c1, _, m1, state = fine_fn(batch)
    coarse_fn = jax.vmap(lambda p: ndt_downsample(p, coarse))
    p2, c2, _, m2, _ = coarse_fn(batch)
    return p1, c1, state, p2, c2


@pytest.mark.slow
def test_ndtnetpp_multiscale_forward():
    fine, coarse = 16, 8
    p1, c1, state, p2, c2 = make_multiscale_inputs(fine, coarse)
    model = NDTNetPP(fine_res=fine, coarse_res=coarse, feature_dim=32)
    variables, (feat, feat1) = init_and_apply(model, p1, c1, state, p2, c2)
    assert feat.shape == (2, coarse, 32)
    assert feat1.shape == (2, fine, 32)


@pytest.mark.slow
def test_ndtnetpp_heads():
    fine, coarse = 16, 8
    p1, c1, state, p2, c2 = make_multiscale_inputs(fine, coarse)
    probs = init_and_apply(
        NDTNetPPClassification(
            num_classes=C, fine_res=fine, coarse_res=coarse, feature_dim=32
        ),
        p1, c1, state, p2, c2,
    )[1]
    assert probs.shape == (2, C)

    seg = init_and_apply(
        NDTNetPPSegmentation(
            num_classes=C, fine_res=fine, coarse_res=coarse, feature_dim=32
        ),
        p1, c1, state, p2, c2,
    )[1]
    assert seg.shape == (2, fine, C + 1)
    np.testing.assert_allclose(np.asarray(seg.sum(-1)), 1.0, rtol=1e-4)


def test_bfloat16_compute_dtype():
    """Models accept a compute dtype (bf16 on the MXU); params stay f32."""
    pts = jax.random.normal(KEY, (B, N, 3))
    covs = jax.random.normal(jax.random.PRNGKey(1), (B, N, 9))
    model = NDTNetSegmentation(num_classes=C, feature_dim=32, dtype=jnp.bfloat16)
    variables = model.init(KEY, pts, covs)
    out = model.apply(variables, pts, covs)
    assert out.dtype == jnp.bfloat16
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_batchnorm_train_mode_updates_stats():
    x = jax.random.normal(KEY, (4, N, 3)) * 5.0
    model = PointNet(feature_dim=32)
    variables = model.init(KEY, x)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
