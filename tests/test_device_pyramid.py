"""Device-built pyramid dict vs pyramid_to_arrays(build_pyramid(...))."""

import numpy as np

from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
from gmf_tpu.sparse.kernel_map import build_pyramid
from gmf_tpu.sparse.resunet import pyramid_to_arrays


def _compare(rng, dim, extent, n, conv1_k, granule, region="hypercube",
             lo=0):
    coords = np.unique(
        rng.randint(lo, extent, (n, dim)).astype(np.int32), axis=0)
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


def test_pyramid_negative_coords(rng):
    """Real clouds produce negative voxel coords; the probes' lattice
    shift (arithmetic right shift of stride multiples) and the packing
    frames must stay exact there — both 3-D and 6-D."""
    _compare(rng, 3, 30, 700, conv1_k=7, granule=128, lo=-34)
    _compare(rng, 6, 7, 400, conv1_k=3, granule=128, lo=-9)


def test_pyramid_hypercross(rng):
    _compare(rng, 6, 8, 300, conv1_k=3, granule=128, region="hypercross")


def test_pyramid_6d_degenerate_multiplicity(rng):
    """Extreme src-part multiplicity (>39 pairs per src voxel) routes the
    EXCESS rows of each hot src key to the tgt-part tables (the two-pass
    split probe) — the output must stay bit-equal to the all-host
    pyramid."""
    src = rng.randint(0, 2, (500, 3)).astype(np.int32)  # ~60 per src part
    tgt = rng.randint(0, 10, (500, 3)).astype(np.int32)
    coords = np.unique(np.concatenate([src, tgt], axis=1), axis=0)
    mult = np.unique(coords[:, :3], axis=0, return_counts=True)[1].max()
    assert mult > 39, f"fixture multiplicity too low ({mult})"
    host = pyramid_to_arrays(build_pyramid(
        coords, 4, conv1_kernel_size=3, granule=64))
    dev = build_pyramid_arrays_device(
        coords, 4, conv1_kernel_size=3, granule=64)
    assert set(host) == set(dev)
    for k in sorted(host):
        np.testing.assert_array_equal(
            np.asarray(dev[k]), np.asarray(host[k]), err_msg=k)


def test_srcrows_probe_engages(rng, monkeypatch):
    """Multiplicity past the slot-loop menu (12) must pick the ROW-mode
    src-dense probe (one [Ks, M] row gather over [cells, mult_cap]) and
    stay bit-equal to the host pyramid."""
    import gmf_tpu.sparse.device_maps as dm

    modes = []
    real = dm.device_kernel_map_srcdense

    def recording(*a, **k):
        modes.append(k.get("row_mode", False))
        return real(*a, **k)

    monkeypatch.setattr(dm, "device_kernel_map_srcdense", recording)
    src = rng.randint(0, 2, (500, 3)).astype(np.int32)  # ~60 per src part
    tgt = rng.randint(0, 10, (500, 3)).astype(np.int32)
    coords = np.unique(np.concatenate([src, tgt], axis=1), axis=0)
    mult = np.unique(coords[:, :3], axis=0, return_counts=True)[1].max()
    assert mult > 12, f"fixture multiplicity too low ({mult})"
    host = pyramid_to_arrays(build_pyramid(
        coords, 4, conv1_kernel_size=3, granule=64))
    dev = build_pyramid_arrays_device(
        coords, 4, conv1_kernel_size=3, granule=64)
    assert any(modes), "row-mode src-dense probe never engaged"
    for k in sorted(host):
        np.testing.assert_array_equal(
            np.asarray(dev[k]), np.asarray(host[k]), err_msg=k)


def test_srcdense_probe_engages(rng, monkeypatch):
    """Gate regression guard: on a small-frame low-multiplicity 6-D
    input the direct-address src-dense probe must actually be CHOSEN
    (bit-equality alone stays green if every probe silently falls back
    to the 50x sorted join)."""
    import gmf_tpu.sparse.device_maps as dm

    calls = {"n": 0}
    real = dm.device_kernel_map_srcdense

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(dm, "device_kernel_map_srcdense", counting)
    coords = np.unique(
        rng.randint(0, 8, (400, 6)).astype(np.int32), axis=0)
    host = pyramid_to_arrays(build_pyramid(
        coords, 4, conv1_kernel_size=3, granule=128))
    dev = build_pyramid_arrays_device(
        coords, 4, conv1_kernel_size=3, granule=128)
    assert calls["n"] > 0, "src-dense probe never engaged"
    for k in sorted(host):
        np.testing.assert_array_equal(
            np.asarray(dev[k]), np.asarray(host[k]), err_msg=k)
