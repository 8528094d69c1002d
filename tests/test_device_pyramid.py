"""Device-built pyramid dict vs pyramid_to_arrays(build_pyramid(...))."""

import numpy as np

from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
from gmf_tpu.sparse.kernel_map import build_pyramid
from gmf_tpu.sparse.resunet import pyramid_to_arrays


def _compare(rng, dim, extent, n, conv1_k, granule, region="hypercube"):
    coords = np.unique(
        rng.randint(0, extent, (n, dim)).astype(np.int32), axis=0)
    host = pyramid_to_arrays(build_pyramid(
        coords, 4, conv1_kernel_size=conv1_k, region=region,
        granule=granule))
    dev = build_pyramid_arrays_device(
        coords, 4, conv1_kernel_size=conv1_k, region=region,
        granule=granule)
    assert set(host) == set(dev)
    for k in sorted(host):
        np.testing.assert_array_equal(
            np.asarray(dev[k]), np.asarray(host[k]), err_msg=k)


def test_pyramid_3d_conv7(rng):
    _compare(rng, 3, 64, 700, conv1_k=7, granule=128)


def test_pyramid_6d_pruned(rng):
    _compare(rng, 6, 8, 400, conv1_k=3, granule=128)


def test_pyramid_hypercross(rng):
    _compare(rng, 6, 8, 300, conv1_k=3, granule=128, region="hypercross")
