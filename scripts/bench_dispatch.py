"""Host-side dispatch latency of jitted calls through the TPU relay.

register()'s phases B/D/E issue ~40 jitted dispatches per pair; if each
dispatch costs ~10-20 ms of HOST time (serialized, regardless of device
overlap), dispatch latency — not device compute — bounds single-pair
latency on this relay-attached box. This measures it:

  tiny    — x + 1 on a [8] array (pure dispatch floor)
  medium  — one [4096, 256] matmul (a typical probe-sized op)
  manyarg — tiny compute but 16 array args (arg-marshalling cost)

Each timed WITHOUT a sync (dispatch-to-return), then the queue is
drained once; the drain/N bound cross-checks device-side cost.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    print(f"backend: {jax.default_backend()}")

    @jax.jit
    def tiny(x):
        return x + 1.0

    @jax.jit
    def medium(a, b):
        return a @ b

    @jax.jit
    def manyarg(*xs):
        return sum(x[0] for x in xs)

    key = jax.random.PRNGKey(0)
    x8 = jnp.zeros((8,), jnp.float32)
    a = jax.random.normal(key, (4096, 256))
    b = jax.random.normal(key, (256, 256))
    xs = tuple(jnp.zeros((128, 64), jnp.float32) for _ in range(16))

    for name, fn, fargs in (("tiny", tiny, (x8,)),
                            ("medium", medium, (a, b)),
                            ("manyarg", manyarg, xs)):
        out = fn(*fargs)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        outs = [fn(*fargs) for _ in range(args.reps)]
        t_disp = (time.perf_counter() - t0) / args.reps * 1e3
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[:1]
        t_drain = (time.perf_counter() - t0) * 1e3
        print(f"{name:8s} dispatch {t_disp:7.2f} ms/call   "
              f"queue drain after {args.reps} calls: {t_drain:7.1f} ms")

    # host->device transfer latency (one [cap,3] f32 like solve inputs)
    h = np.zeros((22528, 3), np.float32)
    d = jnp.asarray(h); np.asarray(d[:1])
    t0 = time.perf_counter()
    ds = [jnp.asarray(h) for _ in range(args.reps)]
    t_put = (time.perf_counter() - t0) / args.reps * 1e3
    np.asarray(ds[-1][:1])
    print(f"transfer [22528,3] f32: {t_put:7.2f} ms/put")


if __name__ == "__main__":
    main()
