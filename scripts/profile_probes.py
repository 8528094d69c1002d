"""Per-probe timing of the 6-D pyramid build (phase D of register()).

profile_dgr_register.py shows the phase split; this drills into D: each
kernel-map probe of the 6-D pyramid is timed individually (with a host
fetch as the sync point), plus primitive-rate microbenches (flat gather,
table-build scatter, inversion scatter) so probe times can be compared
against what the hardware should do.

Scope: times the CHAINED-HASH split probes with the builder's live plan
(device_maps.plan_split_probe) and lattice-shift keys. The builder may
route individual maps to the direct-address srcdense/srcrows/dense
tiers instead — those are measured by scripts/bench_gather_tiers.py and
scripts/bench_compact_map.py; the full-pyramid number printed first is
always the shipped configuration end to end.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=3):
    fn()  # warm/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=40000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gmf_tpu.models.dgr import DGRConfig
    from gmf_tpu.sparse.device_maps import build_pyramid_arrays_device
    from gmf_tpu.sparse.voxelize import sparse_quantize

    cfg = DGRConfig()
    rng = np.random.RandomState(0)
    box = (args.pts * 0.7) ** (1 / 3) * cfg.voxel_size
    xyz0 = (rng.rand(args.pts, 3) * box).astype(np.float32)
    coords0 = np.unique(
        np.floor(xyz0 / cfg.voxel_size).astype(np.int32), axis=0)
    n = len(coords0)
    nn01 = rng.permutation(n).astype(np.int32)  # random matches (worst case)
    corr6d = np.concatenate([coords0, coords0[nn01]], axis=1)
    uniq, _, _ = sparse_quantize(corr6d.astype(np.float64), 1.0,
                                 return_index=True, return_inverse=True)
    uniq = uniq.astype(np.int32)
    print(f"backend: {jax.default_backend()}  voxels={n} uniq6d={len(uniq)}")

    # ---- full pyramid build, end to end --------------------------------
    def full_build():
        arrs = build_pyramid_arrays_device(
            uniq, 4, conv1_kernel_size=3, granule=cfg.corr_cap_granule)
        jax.device_get(arrs["self_map_0"][0, :8])
        return arrs

    t_full = timeit(full_build, n=3)
    print(f"full 6-D pyramid build: {t_full:.3f} s")

    # ---- per-probe timing ----------------------------------------------
    from gmf_tpu.sparse.device_maps import _int32_frame_fits
    from gmf_tpu.sparse import device_maps as dm
    from gmf_tpu.sparse.kernel_map import _pad_cap, downsample_coords

    lc = [uniq]
    for l in range(1, 4):
        lc.append(downsample_coords(lc[l - 1], 2, 2 ** (l - 1)))

    # replicate the builder's padding + split plan
    granule = cfg.corr_cap_granule
    cap_l, cpad_l, mask_l = [], [], []
    for c in lc:
        cap = _pad_cap(len(c), granule)
        cp = np.zeros((cap, 6), np.int32)
        cp[: len(c)] = c
        cap_l.append(cap)
        cpad_l.append(jnp.asarray(cp))
        mask_l.append(jnp.asarray(
            (np.arange(cap) < len(c)).astype(np.float32)))

    # the builder's OWN plan — no drifting replica
    plans = [dm.plan_split_probe(c) for c in lc]

    from gmf_tpu.sparse.kernel_map import hypercube_offsets

    def probe(l_in, l_out, t_stride):
        chains, chains_t, src_pass = plans[l_in][:3]
        in_c, out_c = lc[l_in], lc[l_out]
        slack = t_stride
        shift = t_stride.bit_length() - 1  # lattice-shift keys (builder)
        k3s = jnp.asarray(hypercube_offsets(3, 3, t_stride))
        comp = (_int32_frame_fits(in_c[:, :3], out_c[:, :3], slack,
                                  cap_l[l_in], with_rows=True,
                                  lattice=t_stride)
                and _int32_frame_fits(in_c[:, 3:], out_c[:, 3:], slack,
                                      cap_l[l_in], with_rows=chains_t > 0,
                                      lattice=t_stride))
        if chains_t:
            sp = np.zeros(cap_l[l_in], np.float32)
            sp[: len(src_pass)] = src_pass
            return dm.device_kernel_map_split2(
                cpad_l[l_in], cpad_l[l_out], k3s, k3s, mask_l[l_in],
                mask_l[l_out], jnp.asarray(sp), sentinel=cap_l[l_in],
                chains=chains, chains_t=chains_t, compact=comp,
                shift=shift)
        return dm.device_kernel_map_split(
            cpad_l[l_in], cpad_l[l_out], k3s, k3s, mask_l[l_in],
            mask_l[l_out], sentinel=cap_l[l_in], chains=chains,
            compact=comp, shift=shift)

    jobs = []
    for l in range(4):
        jobs.append((f"self_{l}", l, l, 2 ** l))
        if l + 1 < 4:
            jobs.append((f"down_{l}", l, l + 1, 2 ** l))
    for name, li, lo, st in jobs:
        ch, cht = plans[li][0], plans[li][1]
        if ch == 0:
            print(f"  {name}: full-probe fallback in the live plan — "
                  "not timed by this script")
            continue
        t = timeit(lambda li=li, lo=lo, st=st: jax.device_get(
            probe(li, lo, st)[0, :8]))
        print(f"  {name}: {t * 1e3:7.1f} ms  (M={cap_l[lo]}, "
              f"chains={ch}+{cht})")

    # prune fetch + inversion scatter
    nbr0 = probe(0, 1, 1)
    t = timeit(lambda: jax.device_get(jnp.any(nbr0 != cap_l[0], axis=1)))
    print(f"  prune-vector fetch (down_0): {t * 1e3:7.1f} ms")

    K, M = 160, cap_l[0]
    down = jnp.asarray(
        rng.randint(0, cap_l[0] + 1, (K, cap_l[1])).astype(np.int32))

    def invert():
        up = jnp.full((K, cap_l[0]), cap_l[1], jnp.int32)
        rows = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], down.shape)
        cols = jnp.broadcast_to(
            jnp.arange(cap_l[1], dtype=jnp.int32)[None, :], down.shape)
        up = up.at[rows, down].set(cols, mode="drop")
        return jax.device_get(up[0, :8])

    print(f"  inversion scatter [{K},{cap_l[1]}] -> [{K},{cap_l[0]}]: "
          f"{timeit(invert) * 1e3:7.1f} ms")

    # ---- primitive rates -----------------------------------------------
    T = 1 << 18
    table = jnp.asarray(rng.randint(0, 2 ** 31, (T,)).astype(np.int32))
    qidx = jnp.asarray(
        rng.randint(0, T, (27, cap_l[0])).astype(np.int32))

    @jax.jit
    def g1(t, q):
        return t[q].sum()

    t = timeit(lambda: jax.device_get(g1(table, qidx)))
    print(f"  flat gather 27x{cap_l[0]} from [{T}] i32: {t * 1e3:7.1f} ms "
          f"({27 * cap_l[0] / t / 1e6:.0f} M elem/s)")

    n_scat = cap_l[0]
    h = jnp.asarray(rng.randint(0, T, (n_scat,)).astype(np.int32))
    e = jnp.asarray(rng.randint(0, 2 ** 31, (n_scat,)).astype(np.int32))

    @jax.jit
    def s1(h, e):
        return jnp.full((T,), jnp.int32(-1)).at[h].set(e, mode="drop").sum()

    t = timeit(lambda: jax.device_get(s1(h, e)))
    print(f"  table-build scatter [{n_scat}] -> [{T}]: {t * 1e3:7.1f} ms "
          f"({n_scat / t / 1e6:.0f} M elem/s)")

    # [Ks,Kt,M] broadcast-compare round (the split probe's verify)
    tk = jnp.asarray(rng.randint(0, 1 << 20, (27, M)).astype(np.int32))
    qt = jnp.asarray(rng.randint(0, 1 << 20, (27, M)).astype(np.int32))
    idx0 = jnp.zeros((27, 27, M), jnp.int32)

    @jax.jit
    def verify(tk, qt, idx):
        m3 = tk[:, None, :] == qt[None, :, :]
        idx = jnp.where(m3, tk[:, None, :], idx)
        return idx.sum()

    t = timeit(lambda: jax.device_get(verify(tk, qt, idx0)))
    print(f"  verify broadcast [27,27,{M}]: {t * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
