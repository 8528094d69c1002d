"""Microbench: the split/split2 6-D probe at surface-scan shapes.

probes_surface shows self_2/down_2 ~1.0 s and self_3 ~1.6 s at 30k rows
— far above what gather counts predict. This isolates the probe cost on
REAL surface-like level coords, sweeping the knobs (chains, chains_t,
compact/int32, shift) so the dominant term is measured, not guessed.

Timing uses R dispatches + one fetch (relay floor amortized).
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
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gmf_tpu.models.dgr import DGRConfig
    from gmf_tpu.sparse import device_maps as dm
    from gmf_tpu.sparse.kernel_map import (
        _pad_cap, downsample_coords, hypercube_offsets)
    from gmf_tpu.sparse.voxelize import sparse_quantize

    cfg = DGRConfig()
    rng = np.random.RandomState(0)
    side = (args.pts * 0.9) ** 0.5 * cfg.voxel_size
    xy = rng.rand(args.pts, 2) * side
    z = (0.3 * side * (np.sin(xy[:, 0] * 4 / side)
                       + np.cos(xy[:, 1] * 5 / side)))
    xyz0 = np.concatenate([xy, z[:, None]], 1).astype(np.float32)
    c0, _ = sparse_quantize(xyz0, cfg.voxel_size, return_index=True)
    nn01 = rng.permutation(len(c0)).astype(np.int32)
    corr6d = np.concatenate([c0, c0[nn01]], axis=1)
    uniq, _ = sparse_quantize(corr6d.astype(np.float64), 1.0)
    lc = [uniq.astype(np.int32)]
    for l in range(1, 4):
        lc.append(downsample_coords(lc[l - 1], 2, 2 ** (l - 1)))
    l = args.level
    c = lc[l]
    stride = 2 ** l
    cap = _pad_cap(len(c), cfg.corr_cap_granule)
    cp = np.zeros((cap, 6), np.int32)
    cp[: len(c)] = c
    mask = (np.arange(cap) < len(c)).astype(np.float32)
    cp_d = jnp.asarray(cp)
    mask_d = jnp.asarray(mask)
    k3s = jnp.asarray(hypercube_offsets(3, 3, stride))

    # the builder's live plan (device_maps.plan_split_probe) — rank and
    # mult come from the same code register() runs
    _ch, _cht, _sp, mult, rank = dm.plan_split_probe(c)
    print(f"backend: {jax.default_backend()}  level {l}: n={len(c)} "
          f"cap={cap} src-mult={mult}  live plan: chains={_ch}+{_cht}")

    def timeit(fn):
        out = fn()
        np.asarray(out[:1, :1])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn()
        np.asarray(out[:1, :1])
        return (time.perf_counter() - t0) / args.reps

    ch_s = dm.SPLIT_RANK_CAP // 3 + 1
    src_pass = (rank < dm.SPLIT_RANK_CAP).astype(np.float32)
    excess = rank >= dm.SPLIT_RANK_CAP
    _, tcounts = np.unique(c[excess][:, 3:], axis=0, return_counts=True)
    ch_t = -(-int(tcounts.max()) // 3) if excess.any() else 0
    ch_t = ch_t + 1 if ch_t >= 2 else ch_t
    sp = np.zeros(cap, np.float32)
    sp[: len(c)] = src_pass
    sp_d = jnp.asarray(sp)
    sh = stride.bit_length() - 1

    variants = [
        ("split2 i32 shift", dict(chains=ch_s, chains_t=ch_t,
                                  compact=True, shift=sh)),
        ("split2 i32 raw  ", dict(chains=ch_s, chains_t=ch_t,
                                  compact=True, shift=0)),
        ("split2 i64 shift", dict(chains=ch_s, chains_t=ch_t,
                                  compact=False, shift=sh)),
    ]
    big_chains = -(-mult // 3) + 1
    if big_chains <= 24:
        variants.append(
            (f"split1 ch={big_chains:2d} i32", dict(chains=big_chains,
                                                    compact=True,
                                                    shift=sh)))
    for name, kw in variants:
        if "chains_t" in kw:
            fn = lambda kw=kw: dm.device_kernel_map_split2(
                cp_d, cp_d, k3s, k3s, mask_d, mask_d, sp_d,
                sentinel=cap, **kw)
        else:
            fn = lambda kw=kw: dm.device_kernel_map_split(
                cp_d, cp_d, k3s, k3s, mask_d, mask_d, sentinel=cap, **kw)
        dt = timeit(fn)
        print(f"{name}: {dt * 1e3:8.1f} ms")

    # row-mode src-dense probe (one [Ks, M] row gather over the
    # [cells, mult_cap] table) at the same level shapes
    for R in (16, 32, 64, 128):
        if R < mult:
            continue
        in3 = (c[:, :3] >> sh)
        t3 = (c[:, 3:] >> sh)
        lo3 = np.minimum(in3.min(0), in3.min(0) - 1)
        spans3 = in3.max(0).astype(np.int64) - lo3 + 1
        cells = 1 << max(int(np.ceil(np.log2(int(np.prod(spans3))))), 4)
        tlo = np.minimum(t3.min(0), t3.min(0) - 1)
        tspans = t3.max(0).astype(np.int64) - tlo + 1
        tcells = int(np.prod(tspans))
        IB = max(int(np.ceil(np.log2(max(cap, 2)))), 1)
        packed = tcells < (1 << (31 - IB))
        rank_pad = np.zeros(cap, np.int32)
        rank_pad[: len(c)] = rank.astype(np.int32)
        fn = lambda R=R, cells=cells, packed=packed: \
            dm.device_kernel_map_srcdense(
                cp_d, cp_d, k3s, k3s, mask_d, mask_d,
                jnp.asarray(rank_pad), mult_cap=R, cells=cells,
                sentinel=cap, packed=packed, shift=sh, row_mode=True)
        dt = timeit(fn)
        print(f"srcrows R={R:3d} {'pck' if packed else 'raw'} "
              f"(cells 2^{cells.bit_length() - 1}): {dt * 1e3:8.1f} ms")
        break


if __name__ == "__main__":
    main()
