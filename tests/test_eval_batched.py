"""Batched / data-parallel eval path: equality with the serial path.

VERDICT r2 item 1: the multi-device DP inference path must exist as a
measured code path — pairs collected into bucket-padded batches, run
through ONE jitted mesh-sharded apply, with stats rows identical to the
serial per-pair loop. The reference's eval loop is strictly one pair per
forward (GMF_PointDSC/evaluation/test_3DMatch.py:24-119); this is its
TPU-native replacement.

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import jax
import pytest

from gmf_tpu.eval.harness import evaluate_pairs
from gmf_tpu.eval.registration import PointDSCRegistrar
from gmf_tpu.eval.solvers import make_register_fn
from gmf_tpu.models import PointDSC
from gmf_tpu.parallel.mesh import make_mesh

# timing columns (model_time, data_time) legitimately differ between paths
NON_TIMING = [0, 1, 2, 3, 4, 5, 6, 7, 8, 11]
# discrete columns must be EXACT; RE (arccos-amplified) and TE get a small
# tolerance because XLA vectorizes reductions differently for batch shape
# [1, N] vs [B, N] on the same device (observed max 0.006 deg RE on CPU)
DISCRETE = [0, 3, 4, 5, 6, 7, 8, 11]


def assert_rows_match(a, b):
    np.testing.assert_array_equal(a[:, DISCRETE], b[:, DISCRETE])
    np.testing.assert_allclose(a[:, 1], b[:, 1], rtol=0, atol=0.02)  # RE deg
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=0, atol=1e-3)  # TE


def small_model():
    return PointDSC(num_layers=2, num_channels=32, ratio=0.1,
                    inlier_threshold=0.10, sigma_d=0.10, k=20,
                    nms_radius=0.10)


def make_eval_pair(rng, N, inlier_ratio=0.7):
    ang = float(rng.rand()) * 1.5
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = rng.rand(3).astype(np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3], T_gt[:3, 3] = R, t
    src = rng.rand(N, 3).astype(np.float32) * 2
    tgt = src @ R.T + t + 0.004 * rng.randn(N, 3).astype(np.float32)
    n_out = int(N * (1 - inlier_ratio))
    out_idx = rng.choice(N, n_out, replace=False)
    tgt[out_idx] = rng.rand(n_out, 3) * 2
    labels = np.ones(N, np.float32)
    labels[out_idx] = 0
    corr_pos = np.concatenate([src - src.mean(0, keepdims=True),
                               tgt - tgt.mean(0, keepdims=True)], -1)
    img = rng.rand(24, 32, 3).astype(np.float32)
    return {"corr_pos": corr_pos, "src_keypts": src, "tgt_keypts": tgt,
            "labels": labels, "gt_trans": T_gt, "p_image": img,
            "q_image": img}


@pytest.fixture(scope="module")
def setup():
    model = small_model()
    rng = np.random.RandomState(7)
    p = make_eval_pair(rng, 100)
    variables = model.init(
        jax.random.PRNGKey(0), p["corr_pos"][None], p["src_keypts"][None],
        p["tgt_keypts"][None], p["p_image"][None], p["q_image"][None])
    # pairs spanning two buckets (256 and 1000) to exercise grouping
    pairs = [make_eval_pair(np.random.RandomState(100 + i),
                            N=(150 if i % 3 else 400))
             for i in range(7)]
    return model, variables, pairs


def _rows(register_fn, pairs, **kw):
    return evaluate_pairs(register_fn, iter(pairs), re_thresh=15.0,
                          te_thresh_cm=30.0, scene_index=3, **kw)


def test_batched_matches_serial(setup):
    model, variables, pairs = setup
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    fn = make_register_fn(reg)
    serial = _rows(fn, pairs)
    batched = _rows(fn, pairs, batch_size=4)
    assert serial.shape == batched.shape == (7, 12)
    # rows come back in input order with identical stats
    assert_rows_match(batched, serial)
    # every pair must actually register (geometry-driven machinery)
    assert serial[:, 0].all() and batched[:, 0].all()


def test_mesh_sharded_matches_unsharded_batch(setup):
    """DP over the 8-device mesh vs the same batch on one device: labels
    must be BIT-identical; transforms agree to float ulps (the local
    shard shape [B/8, N] vs [B, N] lets XLA vectorize reductions
    differently, observed max 8e-7)."""
    model, variables, pairs = setup
    mesh = make_mesh(n_data=8)
    reg_plain = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    reg_mesh = PointDSCRegistrar(model, variables, buckets=(256, 1000),
                                 mesh=mesh)
    same_bucket = [p for p in pairs if p["corr_pos"].shape[0] == 150]
    plain = reg_plain.register_batch(same_bucket)
    shard = reg_mesh.register_batch(same_bucket)
    for (t0, l0), (t1, l1) in zip(plain, shard):
        np.testing.assert_allclose(t0, t1, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(l0, l1)


def test_mesh_sharded_eval_rows_match_serial(setup):
    model, variables, pairs = setup
    mesh = make_mesh(n_data=8)
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000),
                            mesh=mesh)
    fn = make_register_fn(reg)
    serial_fn = make_register_fn(
        PointDSCRegistrar(model, variables, buckets=(256, 1000)))
    serial = _rows(serial_fn, pairs)
    sharded = _rows(fn, pairs, batch_size=8)
    assert_rows_match(sharded, serial)


def test_batch_pad_rows_do_not_leak(setup):
    """Batch padded to a multiple of n_data with copies of sample 0:
    a 3-pair batch on an 8-device mesh must equal the 3 singles."""
    model, variables, pairs = setup
    mesh = make_mesh(n_data=8)
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000),
                            mesh=mesh)
    subset = pairs[:3]
    batch = reg.register_batch(subset)
    for pair, (t, l) in zip(subset, batch):
        t1, l1 = reg(pair)
        np.testing.assert_allclose(t, t1, rtol=0, atol=1e-4)
        np.testing.assert_array_equal(l, l1)


def test_register_batch_solver_post_steps_apply(setup):
    """make_register_fn's RANSAC/ICP post-steps run per pair on the
    batched path too."""
    model, variables, pairs = setup
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    fn = make_register_fn(reg, solver="RANSAC", inlier_threshold=0.10,
                          ransac_iters=500)
    assert hasattr(fn, "register_batch")
    serial = _rows(fn, pairs[:4])
    batched = _rows(fn, pairs[:4], batch_size=4)
    assert_rows_match(batched, serial)


def test_workers_prefetch_matches_serial(setup):
    """Threaded pair prefetch must change only the timing columns."""
    model, variables, pairs = setup
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    fn = make_register_fn(reg)

    class DS:  # the indexable dataset protocol the CLIs pass
        def __len__(self):
            return len(pairs)

        def __getitem__(self, i):
            return dict(pairs[i])

    serial = _rows(fn, pairs)
    pre = evaluate_pairs(fn, DS(), re_thresh=15.0, te_thresh_cm=30.0,
                         scene_index=3, workers=3)
    pre_b = evaluate_pairs(fn, DS(), re_thresh=15.0, te_thresh_cm=30.0,
                           scene_index=3, workers=3, batch_size=4)
    assert_rows_match(pre, serial)
    assert_rows_match(pre_b, serial)


def test_inflight_pipeline_matches_serial(setup):
    """inflight>1 (dispatch_batch/fetch_batch split) must change only the
    timing columns — every batch is still fetched and scored in order.
    Also PINS that the pipeline actually engages (the harness silently
    falls back when the register_fn lacks the async split — a vacuous
    pass otherwise)."""
    model, variables, pairs = setup
    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    fn = make_register_fn(reg)
    assert hasattr(fn, "dispatch_batch") and hasattr(fn, "fetch_batch")
    serial = _rows(fn, pairs, batch_size=4)
    calls = {"n": 0}
    real_dispatch = fn.dispatch_batch

    def counting(pairs_):
        calls["n"] += 1
        return real_dispatch(pairs_)

    fn.dispatch_batch = counting
    for depth in (2, 3):
        calls["n"] = 0
        piped = _rows(fn, pairs, batch_size=4, inflight=depth)
        assert calls["n"] > 0, "pipeline never engaged"
        assert_rows_match(piped, serial)


def test_inflight_pipeline_raw_path(setup):
    """Pipelined raw-descriptor batches: the sample writeback must land
    before scoring (fetch side), rows identical to unpipelined raw."""
    model, variables, _ = setup
    rng = np.random.RandomState(5)

    def raw_pair(seed):
        r = np.random.RandomState(seed)
        p = make_eval_pair(r, 120)
        # descriptors that make mutual 1-NN mostly recover the GT pairing
        d = r.randn(120, 16).astype(np.float32)
        return {
            "src_keypts": p["src_keypts"], "tgt_keypts": p["tgt_keypts"],
            "src_desc": d + 0.05 * r.randn(120, 16).astype(np.float32),
            "tgt_desc": d + 0.05 * r.randn(120, 16).astype(np.float32),
            "gt_trans": p["gt_trans"], "p_image": p["p_image"],
            "q_image": p["q_image"],
        }

    reg = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    fn = make_register_fn(reg)
    pairs_a = [raw_pair(200 + i) for i in range(5)]
    pairs_b = [raw_pair(200 + i) for i in range(5)]
    base = _rows(fn, pairs_a, batch_size=3)
    piped = _rows(fn, pairs_b, batch_size=3, inflight=2)
    assert_rows_match(piped, base)
    # writeback happened on both (samples gained matched rows + labels)
    for s in pairs_a + pairs_b:
        assert "labels" in s and len(s["src_keypts"]) == len(s["labels"])


def assert_rows_match_scaled(a, b):
    """Like assert_rows_match, but TE gets a relative term too: the
    fragment-chain pairs below carry metre-scale translations, where
    reduction-order float noise exceeds a fixed 1e-3 cm."""
    np.testing.assert_array_equal(a[:, DISCRETE], b[:, DISCRETE])
    np.testing.assert_allclose(a[:, 1], b[:, 1], rtol=0, atol=0.02)
    np.testing.assert_allclose(a[:, 2], b[:, 2], rtol=1e-4, atol=1e-3)


def _fragment_pairs(rng, n_frag=4, N=120, D=16):
    """Raw-descriptor pairs that SHARE fragments (the real 3DMatch
    pattern: redkitchen is 60 fragments in 506 pairs) so the device
    fragment cache has reuse to exploit."""
    base = rng.rand(N, 3).astype(np.float32) * 2
    desc = rng.randn(N, D).astype(np.float32)
    frags = []
    for i in range(n_frag):
        ang = 0.4 * i
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        t = rng.rand(3).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3], T[:3, 3] = R, t
        frags.append({
            "keypts": (base @ R.T + t).astype(np.float32),
            "desc": (desc + 0.05 * rng.randn(N, D)).astype(np.float32),
            "image": rng.rand(24, 32, 3).astype(np.float32),
            "T": T,
        })
    pairs = []
    for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3), (0, 3), (2, 1)]:
        fi, fj = frags[i], frags[j]
        pairs.append({
            "src_keypts": fi["keypts"], "tgt_keypts": fj["keypts"],
            "src_desc": fi["desc"], "tgt_desc": fj["desc"],
            "gt_trans": (fj["T"] @ np.linalg.inv(fi["T"])).astype(np.float32),
            "p_image": fi["image"], "q_image": fj["image"],
            "src_key": f"frag_{i}", "tgt_key": f"frag_{j}",
        })
    return pairs


def test_fragment_cache_matches_uncached(setup):
    """Raw path with the device fragment cache: identical stats rows to
    the uncached raw path, with each fragment device_put once."""
    from gmf_tpu.eval.registration import DeviceFragmentCache

    model, variables, _ = setup
    rng = np.random.RandomState(11)
    pairs_a = _fragment_pairs(rng)
    rng = np.random.RandomState(11)
    pairs_b = _fragment_pairs(rng)

    reg_plain = PointDSCRegistrar(model, variables, buckets=(256,))
    base = _rows(make_register_fn(reg_plain), pairs_a, batch_size=3)

    cache = DeviceFragmentCache()
    reg_cached = PointDSCRegistrar(model, variables, buckets=(256,),
                                   frag_cache=cache)
    cached = _rows(make_register_fn(reg_cached), pairs_b, batch_size=3)
    assert_rows_match_scaled(cached, base)
    # 4 fragments, 7 pairs => 14 side lookups, only 4 misses
    assert cache.misses == 4 and cache.hits == 10
    assert len(cache) == 4


def test_fragment_cache_sharded(setup):
    """Cache + mesh-sharded raw dispatch on the 8-virtual-device mesh."""
    from gmf_tpu.eval.registration import DeviceFragmentCache

    model, variables, _ = setup
    rng = np.random.RandomState(12)
    pairs_a = _fragment_pairs(rng)
    rng = np.random.RandomState(12)
    pairs_b = _fragment_pairs(rng)

    reg_plain = PointDSCRegistrar(model, variables, buckets=(256,))
    base = _rows(make_register_fn(reg_plain), pairs_a, batch_size=4)

    mesh = make_mesh(n_data=4)
    cache = DeviceFragmentCache()
    reg = PointDSCRegistrar(model, variables, buckets=(256,), mesh=mesh,
                            frag_cache=cache)
    rows = _rows(make_register_fn(reg), pairs_b, batch_size=4, inflight=2)
    assert_rows_match_scaled(rows, base)
    assert cache.misses == 4


def test_fragment_cache_eviction(setup):
    """A tiny byte budget forces LRU eviction; results stay correct."""
    from gmf_tpu.eval.registration import DeviceFragmentCache

    model, variables, _ = setup
    rng = np.random.RandomState(13)
    pairs_a = _fragment_pairs(rng)
    rng = np.random.RandomState(13)
    pairs_b = _fragment_pairs(rng)

    reg_plain = PointDSCRegistrar(model, variables, buckets=(256,))
    base = _rows(make_register_fn(reg_plain), pairs_a, batch_size=2)

    one_entry = 256 * (3 + 16 + 1) * 4 + 24 * 32 * 3 * 4 + 64
    cache = DeviceFragmentCache(max_bytes=2 * one_entry)
    reg = PointDSCRegistrar(model, variables, buckets=(256,),
                            frag_cache=cache)
    rows = _rows(make_register_fn(reg), pairs_b, batch_size=2)
    assert_rows_match_scaled(rows, base)
    assert len(cache) <= 2 and cache.misses > 4  # rebuilt after eviction
