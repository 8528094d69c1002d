"""Micro-batching RegistrationService vs direct registrar calls."""

import threading

import numpy as np
import pytest

import jax

from gmf_tpu.eval.registration import PointDSCRegistrar
from gmf_tpu.eval.serving import RegistrationService
from gmf_tpu.models import PointDSC

from test_eval_batched import make_eval_pair, small_model


@pytest.fixture(scope="module")
def service_setup():
    model = small_model()
    rng = np.random.RandomState(11)
    p = make_eval_pair(rng, 100)
    variables = model.init(
        jax.random.PRNGKey(0), p["corr_pos"][None], p["src_keypts"][None],
        p["tgt_keypts"][None], p["p_image"][None], p["q_image"][None])
    registrar = PointDSCRegistrar(model, variables, buckets=(256, 1000))
    return registrar


def test_service_matches_direct(service_setup):
    """Concurrent submits through the service == direct registrar calls
    (same transforms to float ulps, same labels)."""
    registrar = service_setup
    pairs = [make_eval_pair(np.random.RandomState(300 + i),
                            N=(150 if i % 2 else 400)) for i in range(10)]
    direct = [registrar(dict(p)) for p in pairs]

    with RegistrationService(registrar, max_batch=4,
                             max_wait_ms=50.0) as svc:
        futs = [svc.submit(dict(p)) for p in pairs]
        got = [f.result(timeout=120) for f in futs]

    for (dt, dl), (st, sl) in zip(direct, got):
        np.testing.assert_allclose(np.asarray(st), np.asarray(dt),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(sl), np.asarray(dl))


def test_service_deadline_flush(service_setup):
    """A lone request must complete via the max_wait deadline without
    ever filling a batch."""
    registrar = service_setup
    pair = make_eval_pair(np.random.RandomState(42), N=200)
    with RegistrationService(registrar, max_batch=64,
                             max_wait_ms=20.0) as svc:
        trans, labels = svc.submit(pair).result(timeout=120)
    assert np.all(np.isfinite(np.asarray(trans)))
    assert len(labels) == 200


def test_service_threaded_clients(service_setup):
    """Many client threads submitting concurrently all get answers."""
    registrar = service_setup
    results = {}

    with RegistrationService(registrar, max_batch=4,
                             max_wait_ms=15.0) as svc:

        def client(i):
            p = make_eval_pair(np.random.RandomState(500 + i), N=150)
            results[i] = svc.register(p)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
    assert len(results) == 8
    for trans, labels in results.values():
        assert np.all(np.isfinite(np.asarray(trans)))


def test_service_rejects_after_close(service_setup):
    registrar = service_setup
    svc = RegistrationService(registrar, max_batch=2, max_wait_ms=5.0)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(make_eval_pair(np.random.RandomState(0), N=100))


def test_service_malformed_sample_fails_its_future_only(service_setup):
    """A bad sample must fail ITS future; the collector survives and
    keeps serving good requests."""
    registrar = service_setup
    with RegistrationService(registrar, max_batch=4,
                             max_wait_ms=15.0) as svc:
        bad = svc.submit({"not_a_sample": 1})
        good_pair = make_eval_pair(np.random.RandomState(7), N=150)
        good = svc.submit(good_pair)
        with pytest.raises(Exception):
            bad.result(timeout=60)
        trans, labels = good.result(timeout=120)
        assert np.all(np.isfinite(np.asarray(trans)))


def test_service_mesh_sharded(service_setup):
    """Serving over the 8-virtual-device DP mesh: coalesced dispatches
    shard on the data axis; results match the unsharded service."""
    from gmf_tpu.parallel.mesh import make_mesh

    registrar = service_setup
    mesh_reg = PointDSCRegistrar(
        registrar.model, registrar.variables, buckets=(256, 1000),
        mesh=make_mesh(n_data=8))
    pairs = [make_eval_pair(np.random.RandomState(700 + i), N=150)
             for i in range(8)]
    direct = [registrar(dict(p)) for p in pairs]
    with RegistrationService(mesh_reg, max_batch=8,
                             max_wait_ms=20.0) as svc:
        futs = [svc.submit(dict(p)) for p in pairs]
        got = [f.result(timeout=180) for f in futs]
    for (dt, dl), (st, sl) in zip(direct, got):
        np.testing.assert_allclose(np.asarray(st), np.asarray(dt),
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(sl), np.asarray(dl))
