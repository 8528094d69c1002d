"""Micro-batching registration service (production serving front-end).

The reference has no serving story — its eval loop is a batch job, one
pair per forward (GMF_PointDSC/evaluation/test_3DMatch.py:24-119). On
TPU the economics invert: a single dispatch amortizes over a pair batch
(bench.py: b=64 is ~5x the b=4 throughput at N=5000), so a service
should coalesce concurrent requests into one bucket-padded dispatch.

``RegistrationService`` does exactly that:

- ``submit(sample) -> Future`` from any thread;
- a collector thread groups samples by shape bucket and flushes a group
  when it reaches ``max_batch`` or its oldest request has waited
  ``max_wait_ms`` (latency bound);
- each flush is ONE (optionally mesh-sharded) dispatch through
  ``PointDSCRegistrar.dispatch_batch``; up to ``inflight`` dispatches
  stay pending so the device never idles through the fetch gap;
- ``warmup(buckets)`` precompiles the per-bucket executables so first
  requests don't pay the 30-240 s XLA compile.

Results are identical to direct ``registrar(sample)`` calls — batching
only changes when work is dispatched, never what is computed
(tests/test_serving.py pins this).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Sequence

import numpy as np


class RegistrationService:
    """Thread-safe micro-batching wrapper around a PointDSCRegistrar.

    Args:
      registrar: a ``gmf_tpu.eval.registration.PointDSCRegistrar``.
      max_batch: flush a bucket group at this many requests.
      max_wait_ms: flush a non-full group once its oldest request has
        waited this long (tail-latency bound).
      inflight: dispatches kept pending before forcing a fetch.
    """

    def __init__(self, registrar, max_batch: int = 16,
                 max_wait_ms: float = 10.0, inflight: int = 2):
        self.registrar = registrar
        self.max_batch = int(max_batch)
        self.max_wait = max_wait_ms / 1000.0
        self.inflight = max(1, int(inflight))
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._submit_lock = threading.Lock()  # serializes submit vs close
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- client API ----------------------------------------------------------

    def submit(self, sample: Dict[str, np.ndarray]) -> "Future":
        """Enqueue one pair; the Future resolves to (trans, labels)."""
        with self._submit_lock:
            # under the lock, the shutdown sentinel cannot slip between
            # the check and the put — nothing lands after it unprocessed
            if self._stop.is_set():
                raise RuntimeError("service is closed")
            fut: Future = Future()
            self._q.put((sample, fut, time.perf_counter()))
        return fut

    def register(self, sample: Dict[str, np.ndarray]):
        """Blocking convenience: submit + wait."""
        return self.submit(sample).result()

    def warmup(self, buckets: Sequence[int], image_hw=(120, 160)) -> None:
        """Precompile each bucket's executable with dummy pairs.

        Always compiles at batch == max_batch — dispatch() pads every
        flush to exactly that shape, so this is the one executable real
        traffic uses per bucket."""
        b = self.max_batch
        for n in buckets:
            rng = np.random.RandomState(0)
            src = rng.rand(n, 3).astype(np.float32)
            pair = {
                "corr_pos": np.concatenate([src, src], -1),
                "src_keypts": src, "tgt_keypts": src.copy(),
                "labels": np.ones(n, np.float32),
                "gt_trans": np.eye(4, dtype=np.float32),
                "p_image": np.zeros(image_hw + (3,), np.float32),
                "q_image": np.zeros(image_hw + (3,), np.float32),
            }
            self.registrar.register_batch([dict(pair) for _ in range(b)])

    def close(self, timeout: float = None) -> None:
        """Drain pending work and stop the collector thread.

        Waits until the drain completes (a first-request XLA compile can
        take minutes — see warmup()). Pass a numeric ``timeout`` to bound
        the wait; if the collector is still draining when it expires, a
        ``TimeoutError`` is raised rather than silently abandoning
        in-flight Futures."""
        with self._submit_lock:
            self._stop.set()
            self._q.put(None)  # wake the collector; last item ever queued
        self._thread.join(timeout=timeout)
        if self._thread.is_alive():
            raise TimeoutError(
                f"collector still draining after {timeout}s; outstanding "
                "futures will resolve when the drain finishes")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- collector -----------------------------------------------------------

    def _run(self):
        groups: Dict = {}      # bucket -> [(sample, fut, t_enqueue)]
        pending: List = []     # (group, handle)
        reg = self.registrar

        def dispatch(bucket):
            group = groups.pop(bucket, [])
            if not group:
                return
            # pad every dispatch to max_batch with copies of sample 0 so
            # ONE executable serves each bucket regardless of how full
            # the group was at flush time (batch rows are independent in
            # eval mode; pad-row results are discarded below)
            samples = [s for s, _, _ in group]
            samples += [dict(samples[0])
                        for _ in range(self.max_batch - len(samples))]
            try:
                handle = reg.dispatch_batch(samples)
            except Exception as e:  # propagate to the callers
                for _, fut, _ in group:
                    fut.set_exception(e)
                return
            pending.append((group, handle))
            if len(pending) >= self.inflight:
                fetch_one()

        def fetch_one():
            group, handle = pending.pop(0)
            try:
                results = reg.fetch_batch(handle)
            except Exception as e:
                for _, fut, _ in group:
                    fut.set_exception(e)
                return
            for (_, fut, _), res in zip(group, results):
                fut.set_result(res)

        def enqueue(item) -> None:
            sample, fut, t = item
            try:
                b = reg.eval_bucket([sample])
            except Exception as e:  # malformed sample: fail ITS future
                fut.set_exception(e)
                return
            groups.setdefault(b, []).append((sample, fut, t))
            if len(groups[b]) >= self.max_batch:
                dispatch(b)

        def drain_and_exit():
            # close() raced with late submit()s: anything enqueued after
            # the sentinel still gets processed, nothing hangs
            while True:
                try:
                    late = self._q.get_nowait()
                except queue.Empty:
                    break
                if late is not None:
                    enqueue(late)
            for b in list(groups):
                dispatch(b)
            while pending:
                fetch_one()

        try:
            while True:
                # deadline of the oldest queued request across groups
                now = time.perf_counter()
                deadline = min((g[0][2] + self.max_wait
                                for g in groups.values() if g),
                               default=None)
                timeout = (max(1e-4, deadline - now) if deadline is not None
                           else (0.05 if pending else None))
                try:
                    item = self._q.get(timeout=timeout)
                except queue.Empty:
                    item = False  # timeout tick
                if item is None and self._stop.is_set():
                    drain_and_exit()
                    return
                if item:
                    enqueue(item)
                # flush any group past its latency deadline
                now = time.perf_counter()
                for b in [b for b, g in groups.items()
                          if g and now - g[0][2] >= self.max_wait]:
                    dispatch(b)
                # idle: drain one pending fetch so results don't sit forever
                if not item and pending:
                    fetch_one()
        except BaseException as e:  # collector must never die silently
            # under _submit_lock: a concurrent submit() either finished
            # its put before we drain below (we fail its future here) or
            # observes _stop afterwards and raises — nothing can land in
            # the queue after the final drain and hang forever
            with self._submit_lock:
                self._stop.set()
                for g in groups.values():
                    for _, fut, _ in g:
                        if not fut.done():
                            fut.set_exception(e)
                for group, _ in pending:
                    for _, fut, _ in group:
                        if not fut.done():
                            fut.set_exception(e)
                while True:
                    try:
                        late = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if late is not None and not late[1].done():
                        late[1].set_exception(e)
            raise
