"""Background-thread prefetch (data/prefetch.py)."""

import numpy as np
import pytest


def test_prefetch_order_and_passthrough():
    from gmf_tpu.data.prefetch import prefetch_iter

    items = list(range(100))
    assert list(prefetch_iter(iter(items), depth=3)) == items
    # depth<=0 is the identity
    assert list(prefetch_iter(iter(items), depth=0)) == items


def test_prefetch_propagates_exceptions():
    from gmf_tpu.data.prefetch import prefetch_iter

    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    out = []
    with pytest.raises(ValueError, match="boom"):
        for x in prefetch_iter(gen(), depth=2):
            out.append(x)
    assert out == [1, 2]


def test_prefetch_abandonment_retires_producer():
    """Breaking out of the consumer must unblock and retire the
    producer thread (no leak of the thread or its buffered items)."""
    import threading
    import time

    from gmf_tpu.data.prefetch import prefetch_iter

    started = threading.active_count()
    produced = []

    def slow_gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iter(slow_gen(), depth=2)
    for x in it:
        if x >= 3:
            break  # abandon mid-stream with the queue full
    it.close()  # trigger the generator's finally (GC would, eventually)
    deadline = time.time() + 10.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= started
    # the producer stopped early instead of draining all 1000 items
    assert len(produced) < 100


def test_trainer_prefetch_same_metrics(rng):
    """Trainer(prefetch=2) must reproduce the serial epoch exactly."""
    import jax

    from gmf_tpu.data import make_correspondence_problem
    from gmf_tpu.models import PointDSC
    from gmf_tpu.train.trainer import TrainConfig, Trainer

    batches = [make_correspondence_problem(
        np.random.RandomState(100 + i), num_corr=64, batch=8,
        image_hw=(24, 32)) for i in range(3)]

    model = PointDSC(num_layers=1, num_channels=16, k=10)
    cfg = TrainConfig(max_epoch=1, batch_size=8, lr=1e-3)

    def make(prefetch):
        return Trainer(model, cfg, list(batches), list(batches[:1]),
                       rng_seed=0, steps_per_epoch=3, prefetch=prefetch)

    t0 = make(0)
    m0 = t0.train_epoch(0)
    t1 = make(2)
    m1 = t1.train_epoch(0)
    for k in m0:
        np.testing.assert_allclose(m0[k], m1[k], rtol=1e-6, err_msg=k)
