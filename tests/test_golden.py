"""Golden regression test: exact pinned outputs for a fixed cloud.

Guards optimization rounds against silent semantic drift. If an
*intentional* semantic change lands (e.g. altered tie-breaking), regenerate
with the snippet in the module docstring of this file's git history.
"""
import jax.numpy as jnp
import numpy as np

from ndtpu.core.ndt import ndt_downsample
from ndtpu.data.synthetic import clustered_cloud


def test_golden_downsample():
    pts = clustered_cloud(2000, n_clusters=32, extent=8.0, scale=0.3, seed=42)
    pcl, covs, labels, mask, state = ndt_downsample(jnp.asarray(pts), 20)

    assert float(state.voxel_size) == np.float32(5.629374980926514)
    assert int(state.num_valid) == 23
    assert bool(state.converged)
    assert int(mask.sum()) == 20
    np.testing.assert_allclose(
        float(np.asarray(pcl).sum()), 13.160667419433594, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(np.asarray(covs).sum()), 44.63232421875, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pcl)[0],
        [1.1183464527130127, -4.586442470550537, -6.656826496124268],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(state.counts)[:8], [137, 158, 126, 63, 21, 63, 109, 91]
    )
