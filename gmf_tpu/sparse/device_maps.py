"""Device-side kernel-map construction (TPU-native coordinate manager).

The host builders (kernel_map.py, cpp/kernelmap) probe K x M coordinate
keys — ~230M probes for a 27k-voxel 6-D pyramid, seconds-to-minutes on
weak hosts. This module does the same lookup ON DEVICE: coordinates are
packed into int64 keys (scoped x64; TPU emulates int64 with int32 pairs,
which is fine — the cost is gathers, not arithmetic), the input keys are
sorted once, and all K x M queries resolve with one vectorized binary
search (log2(N) gather rounds). The resulting neighbor tables are born on
device and feed the gather-GEMM conv without crossing the host boundary.

Memory note: the naive formulation materializes [K, M, D] int64 query
coords (729 x 28k x 6 x 8B ~ 1 GB in 6-D). We instead compose query keys
from [M] base keys + [K] offset keys and run the per-dimension range
check as K x M broadcasts inside a static loop over D, so the largest
live tensor is [K, M] int64.

Exactness: identical output to kernel_map.build_kernel_map (same kept-
offset order, same sentinel convention) — tests/test_device_maps.py
asserts bit-equality against the host builder, and
tests/test_device_pyramid.py asserts the full pyramid dict matches
pyramid_to_arrays(build_pyramid(...)).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.sparse.kernel_map import (
    _pad_cap,
    downsample_coords,
    hypercross_offsets,
    hypercube_offsets,
)


# Fibonacci-style multiplicative hash constants (distinct odd 64-bit)
_HASH_MULTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0xFF51AFD7ED558CCD)
_HASH_MULTS32 = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D)
_EMPTY_KEY = -(2 ** 62)  # packed query keys are bounded far above this
_EMPTY_KEY32 = -(2 ** 30)


def _int32_frame_fits(in_coords: np.ndarray, out_coords: np.ndarray,
                      slack: int, cap: int, with_rows: bool = True,
                      lattice: int = 1) -> bool:
    """Host-side check that packed keys for this (in, out, offsets) frame
    fit int32 — conservatively bounds the device-computed packing frame.

    ``slack`` = max |offset| per dimension. ``with_rows``: the hash-table
    entries pack (key << IB | row), so keys must fit 31 - IB bits; t-part
    verify keys are compared bare and only need 31 bits.

    int32 keys halve gather bytes and skip the TPU's int64 emulation —
    the probes are gather-bound, so this is ~2x on the hot path.

    ``lattice``: level-l coords are multiples of 2^l; keys are packed
    from the lattice-divided values (the probes shift them down), so the
    frame shrinks by lattice^D — this is what lets coarse levels keep
    int32 keys at surface-scan scale.
    """
    if len(in_coords) == 0 or len(out_coords) == 0:
        return False
    in_coords = in_coords // lattice
    out_coords = out_coords // lattice
    slack = slack // lattice
    lo = np.minimum(in_coords.min(0), out_coords.min(0) - slack)
    spans = np.maximum(in_coords.max(0).astype(np.int64) - lo + 1, 1)
    prod = 1
    for s in spans:
        prod *= int(s)
        if prod >= 2 ** 40:
            return False
    bits = 31
    if with_rows:
        bits -= max(int(np.ceil(np.log2(max(cap, 2)))), 1)
    return prod < (1 << bits)


def device_kernel_map(in_coords, out_coords, offsets, in_valid_mask,
                      out_valid_mask, sentinel: int, method: str = "hash",
                      compact: bool = False, dense_cells: int = 0,
                      lattice: int = 1, lane_group: int = 1):
    """Public wrapper: runs the jitted body under a scoped x64 context so
    the int64 key packing is real (JAX defaults to 32-bit ints).

    lane_group (dense path only): hypercube offset lists enumerate the
    LAST dimension fastest, so each group of ``kernel_size`` consecutive
    offsets probes CONSECUTIVE cells of the dense table. Passing
    lane_group=kernel_size replaces kernel_size scalar gathers per group
    with ONE row gather from a shifted-replica [cells, G] table — TPU row
    gathers run ~3.5x faster per descriptor than scalar gathers (v5e:
    490M rows/s vs 141M elem/s, scripts/profile_probes.py). Callers must
    guarantee the last-dim offsets are the consecutive run
    (-r..r)*lattice per group (true for hypercube_offsets)."""
    with jax.enable_x64():
        return _device_kernel_map(in_coords, out_coords, offsets,
                                  in_valid_mask, out_valid_mask,
                                  sentinel=sentinel, method=method,
                                  compact=compact, dense_cells=dense_cells,
                                  lattice=lattice, lane_group=lane_group)


def _dense_cells_bound(in_coords: np.ndarray, out_coords: np.ndarray,
                       slack: int, lattice: int = 1) -> int:
    """Host-side cell count of the packed joint frame (coords are host
    arrays in the builder), rounded up to a power of two so the jitted
    dense-table probe compiles once per bucket instead of per pair.

    ``lattice``: level coords live on a stride-2^l lattice in original
    units; the dense table indexes lattice CELLS, so spans divide by it.
    """
    if len(in_coords) == 0 or len(out_coords) == 0:
        return 0
    in_coords = in_coords // lattice
    out_coords = out_coords // lattice
    slack = slack // lattice
    lo = np.minimum(in_coords.min(0), out_coords.min(0) - slack)
    spans = np.maximum(in_coords.max(0).astype(np.int64) - lo + 1, 1)
    prod = 1
    for s in spans:
        prod *= int(s)
        if prod > 2 ** 40:
            return 0
    return 1 << max(int(np.ceil(np.log2(prod))), 4)


@partial(jax.jit,
         static_argnames=("sentinel", "method", "compact", "dense_cells",
                          "lattice", "lane_group"))
def _device_kernel_map(in_coords, out_coords, offsets, in_valid_mask,
                       out_valid_mask, sentinel: int, method: str = "hash",
                       compact: bool = False, dense_cells: int = 0,
                       lattice: int = 1, lane_group: int = 1):
    """Dense per-offset neighbor table, computed on device.

    Args:
      in_coords:  [N, D] int32 (padded rows allowed; mask them invalid).
      out_coords: [M, D] int32.
      offsets:    [K, D] int32.
      in_valid_mask: [N] 1/0; invalid rows never match.
      out_valid_mask: [M] 1/0; invalid rows get all-sentinel columns.
      sentinel: value for missing neighbors (the padded feature table's
        zero row index by the engine's convention).
      method: 'hash' (3-table displacement hash, 3 flat HBM gathers per
        query; falls back in-graph to the sorted path on the ~never event
        of an unplaceable key) or 'sort' (binary search, log2(N) gather
        rounds — measured 4x slower on v5e at 6-D scale).
      compact: run the hash tables/probes on int32 keys (caller must
        guarantee the packing frame fits via ``_int32_frame_fits``; an
        in-graph key_fits check still falls back to the exact sorted path
        if violated). ~2x on the gather-bound probe.

    Returns nbr [K, M] int32.
    """
    N, D = in_coords.shape
    K = offsets.shape[0]
    M = out_coords.shape[0]
    if lattice > 1:
        # level coords / offsets are exact multiples of the lattice
        # stride; packing lattice cells keeps the dense table small
        in_coords = in_coords // lattice
        out_coords = out_coords // lattice
        offsets = offsets // lattice
    # joint packing frame (computed on device from the data)
    big = jnp.int32(1 << 20)
    in_valid = in_valid_mask > 0
    out_valid = out_valid_mask > 0
    lo = jnp.minimum(
        jnp.min(jnp.where(in_valid[:, None], in_coords, big), axis=0),
        jnp.min(jnp.where(out_valid[:, None], out_coords, big), axis=0)
        + jnp.min(offsets, axis=0),
    ).astype(jnp.int64)
    hi_in = jnp.max(jnp.where(in_valid[:, None], in_coords, -big), axis=0)
    spans = jnp.maximum(hi_in.astype(jnp.int64) - lo + 1, 1)   # [D]
    strides = jnp.concatenate([
        jnp.cumprod(spans[::-1])[::-1][1:], jnp.ones((1,), jnp.int64)])

    # input keys (invalid rows get an unmatchable key; their pre-mask
    # packed value may wrap int64 — discarded by the where)
    keys = jnp.sum((in_coords.astype(jnp.int64) - lo) * strides, axis=-1)
    keys = jnp.where(in_valid, keys, jnp.int64(2 ** 62))

    # query keys composed from [M] base + [K] offset keys (never [K,M,D])
    out_rel = out_coords.astype(jnp.int64) - lo                 # [M, D]
    out_key = jnp.sum(out_rel * strides, axis=-1)               # [M]
    off64 = offsets.astype(jnp.int64)
    off_key = jnp.sum(off64 * strides, axis=-1)                 # [K]
    qkeys = out_key[None, :] + off_key[:, None]                 # [K, M]

    in_range = out_valid[None, :]
    for d in range(D):  # static tiny loop; per-dim check kills aliasing
        col = out_rel[:, d]                                     # [M]
        od = off64[:, d:d + 1]                                  # [K, 1]
        in_range = in_range & (col[None, :] >= -od) & (
            col[None, :] < spans[d] - od)

    def sorted_path(_):
        order = jnp.argsort(keys)
        keys_s = keys[order]
        pos = jnp.searchsorted(keys_s, qkeys.ravel()).reshape(qkeys.shape)
        pos = jnp.minimum(pos, N - 1)
        hit = (keys_s[pos] == qkeys) & in_range
        return jnp.where(hit, order[pos].astype(jnp.int32), sentinel)

    if method == "sort":
        return sorted_path(None)

    if dense_cells:
        # ---- direct-address dense table --------------------------------
        # When the packed joint frame is small (host-checked via
        # _dense_cells_bound: coarse 6-D levels are ~8^3 x 8^3 = 262k
        # cells; every 3-D level fits too), index a [cells] table by the
        # key itself: ONE gather per query, no chains, no multiplicity
        # sensitivity, no aliasing (no hashing). 3x fewer gathers than
        # the 3-table hash and immune to the dense-coarse-level regime
        # that breaks chained hashing (r3: level-2 self map 1.18 s hash
        # -> ~0.3 s dense at 22k voxels).
        guard = jnp.prod(spans) > dense_cells    # host/device frame skew

        def dense_path(_):
            kv = jnp.where(in_valid, keys, jnp.int64(dense_cells))
            rows = jnp.arange(N, dtype=jnp.int32)
            G = lane_group
            if G > 1 and K % G == 0:
                # Shifted-replica table tG[c, t] = table[c + t]: the G
                # last-dim offsets of one group probe consecutive cells,
                # so ONE row gather of [G] answers all of them (~3.5x
                # fewer descriptors; see device_kernel_map docstring).
                # The low clip is exact: if ANY lane t of a group is in
                # range then q0 >= -t >= -pad and q0 <= cells-1, so the
                # clip never moves a group that has a valid lane; fully
                # out-of-range groups are masked by in_range.
                pad = G - 1
                t1 = jnp.full((dense_cells + 2 * pad,),
                              jnp.int32(sentinel)).at[kv + pad].set(
                    rows, mode="drop")
                tG = jnp.stack(
                    [jax.lax.dynamic_slice_in_dim(t1, t, dense_cells + pad)
                     for t in range(G)], axis=1)
                q0 = out_key[None, :] + off_key[::G, None]   # [K//G, M]
                base = (jnp.clip(q0, -pad, dense_cells - 1) + pad
                        ).astype(jnp.int32)
                hit = tG[base]                   # [K//G, M, G] row gather
                hit = jnp.swapaxes(hit, 1, 2).reshape(K, M)
                return jnp.where(in_range, hit, sentinel)
            table = jnp.full((dense_cells,), jnp.int32(sentinel)).at[
                kv].set(rows, mode="drop")
            q = jnp.clip(qkeys, 0, dense_cells - 1)
            hit = table[q]                               # [K, M] gather
            return jnp.where(in_range, hit, sentinel)

        return jax.lax.cond(guard, sorted_path, dense_path, None)

    # ---- 3-table displacement hash ----------------------------------
    # Each table has one slot per bucket; an entry packs (key << IB | row)
    # into one integer so a probe is ONE flat [K, M] gather + shift-compare
    # (a [*, slots] bucket layout would lane-pad the minor dim 8 -> 128 on
    # TPU: 16x the HBM traffic — measured OOM at 6-D scale). Keys losing
    # a slot race cascade to the next table; the <=2e-6-probability
    # leftover (and any key too wide to pack with its row id) flips the
    # in-graph cond to the exact binary-search path.
    IB = max(int(np.ceil(np.log2(max(N, 2)))), 1)   # row-id bits
    b = max(int(np.ceil(np.log2(max(8 * N, 16)))), 4)
    T = 1 << b
    key_bits = (31 if compact else 62) - IB
    key_fits = jnp.max(jnp.where(in_valid, keys, 0)) < (
        jnp.int64(1) << key_bits)
    if compact:
        kdtype, empty, mults = jnp.int32, _EMPTY_KEY32, _HASH_MULTS32
    else:
        kdtype, empty, mults = jnp.int64, _EMPTY_KEY, _HASH_MULTS
    keys_c = keys.astype(kdtype)
    qkeys_c = qkeys.astype(kdtype)
    rows = jnp.arange(N, dtype=kdtype)
    entries = (keys_c << IB) | rows

    def hash_of(k, mult):
        if compact:
            u = k.astype(jnp.uint32) * jnp.uint32(mult)
            return (u >> jnp.uint32(32 - b)).astype(jnp.int32)
        u = k.astype(jnp.uint64) * jnp.uint64(mult)
        return (u >> jnp.uint64(64 - b)).astype(jnp.int32)

    tables = []
    pending = in_valid
    for mult in mults:
        h = jnp.where(pending, hash_of(keys_c, mult), T)  # OOB -> drop
        t = jnp.full((T,), kdtype(empty)).at[h].set(entries, mode="drop")
        placed = pending & (t[jnp.minimum(h, T - 1)] == entries)
        pending = pending & ~placed
        tables.append(t)
    overflow = jnp.any(pending) | ~key_fits

    def hash_path(_):
        hit = jnp.zeros(qkeys.shape, bool)
        idx = jnp.zeros(qkeys.shape, jnp.int32)
        for t, mult in zip(tables, mults):
            e = t[hash_of(qkeys_c, mult)]           # [K, M] flat gather
            h = (e >> IB) == qkeys_c
            idx = jnp.where(h & ~hit,
                            (e & ((1 << IB) - 1)).astype(jnp.int32), idx)
            hit = hit | h
        return jnp.where(hit & in_range, idx, sentinel)

    return jax.lax.cond(overflow, sorted_path, hash_path, None)


def device_kernel_map_split(in_coords, out_coords, offs_s, offs_t,
                            in_valid_mask, out_valid_mask, sentinel: int,
                            chains: int = 1, compact: bool = False,
                            shift: int = 0):
    """Separable 2x3-D probe for 6-D correspondence coordinates.

    A 6-D voxel is a (src, tgt) coordinate pair and the hypercube offset
    list factorizes row-major: offset k = k_s * |offs_t| + k_t. Instead of
    hashing all 729 x M query keys (3 int64 gathers each — the DGR E2E
    bottleneck), hash only the 27 x M SRC-part keys, then verify the
    TGT part with ONE gathered int32 key compared against all 27 t-offsets
    by broadcast (no further gathers): ~27x(3+3)/729x3 = 13.5x fewer
    gathered elements at chains=1.

    Duplicate src-keys (possible at coarse pyramid levels where distinct
    6-D voxels share a downsampled src part) cascade through
    ``chains x 3`` hash tables; pick ``chains >= ceil(max_multiplicity/3)``
    (host-known — the level coords are built on host). Unplaceable keys
    flip an in-graph cond to the exact full-key binary search, so the map
    stays exact for ANY input.

    Two-pass mode (``chains_t > 0``): rows where ``src_pass == 0`` go
    into TGT-part chained tables instead, probed with the Kt x M tgt
    query keys and verified against the src part by broadcast. The host
    routes each src-key group's first few rows src-side and the EXCESS
    rows tgt-side, so a handful of very hot src keys (coarse-level
    multiplicity 50+) no longer force either a huge chain count or the
    13.5x-more-gathers full 729-offset probe — probe cost stays
    ~(chains + chains_t) table rounds. r3 measurement at 22k voxels:
    the level-2 self map drops 1.18 s (full) -> ~0.3 s (two-pass).

    Returns nbr [(Ks*Kt), M] int32 — bit-identical to
    ``device_kernel_map(in, out, cartesian(offs_s, offs_t), ...)``.
    """
    with jax.enable_x64():
        return _device_kernel_map_split(
            in_coords, out_coords, offs_s, offs_t, in_valid_mask,
            out_valid_mask, sentinel=sentinel, chains=chains,
            compact=compact, shift=shift)


def device_kernel_map_split2(in_coords, out_coords, offs_s, offs_t,
                             in_valid_mask, out_valid_mask, src_pass,
                             sentinel: int, chains: int, chains_t: int,
                             compact: bool = False, shift: int = 0):
    """Two-pass split probe (see device_kernel_map_split docstring).

    src_pass: [N] 1/0 — rows hashed by SRC part (1) vs TGT part (0).
    chains / chains_t: chain counts for the two table sets.
    """
    with jax.enable_x64():
        return _device_kernel_map_split(
            in_coords, out_coords, offs_s, offs_t, in_valid_mask,
            out_valid_mask, sentinel=sentinel, chains=chains,
            chains_t=chains_t, src_pass=src_pass, compact=compact,
            shift=shift)


@partial(jax.jit,
         static_argnames=("sentinel", "chains", "chains_t", "compact",
                          "shift"))
def _device_kernel_map_split(in_coords, out_coords, offs_s, offs_t,
                             in_valid_mask, out_valid_mask, sentinel: int,
                             chains: int = 1, chains_t: int = 0,
                             src_pass=None, compact: bool = False,
                             shift: int = 0):
    if shift:
        # Level-l coords (and stride-scaled offsets) are multiples of
        # 2^shift: arithmetic right shift = exact floor division, and
        # the packed frame shrinks 2^(D*shift) — often the difference
        # between int32 keys and int64 emulation.
        in_coords = in_coords >> shift
        out_coords = out_coords >> shift
        offs_s = offs_s >> shift
        offs_t = offs_t >> shift
    N = in_coords.shape[0]
    M = out_coords.shape[0]
    Ks, Ds = offs_s.shape
    Kt, Dt = offs_t.shape
    in_valid = in_valid_mask > 0
    out_valid = out_valid_mask > 0
    big = jnp.int32(1 << 20)

    def frame(in_c, out_c, offs):
        """Packing frame over one coordinate half (same rule as the full
        builder: cover in-coords and the query range)."""
        lo = jnp.minimum(
            jnp.min(jnp.where(in_valid[:, None], in_c, big), axis=0),
            jnp.min(jnp.where(out_valid[:, None], out_c, big), axis=0)
            + jnp.min(offs, axis=0),
        ).astype(jnp.int64)
        hi = jnp.max(jnp.where(in_valid[:, None], in_c, -big), axis=0)
        spans = jnp.maximum(hi.astype(jnp.int64) - lo + 1, 1)
        strides = jnp.concatenate([
            jnp.cumprod(spans[::-1])[::-1][1:], jnp.ones((1,), jnp.int64)])
        return lo, spans, strides

    s_in, t_in = in_coords[:, :Ds], in_coords[:, Ds:]
    s_out, t_out = out_coords[:, :Ds], out_coords[:, Ds:]
    s_lo, s_spans, s_strides = frame(s_in, s_out, offs_s)
    t_lo, t_spans, t_strides = frame(t_in, t_out, offs_t)

    s_keys = jnp.sum((s_in.astype(jnp.int64) - s_lo) * s_strides, axis=-1)
    s_keys = jnp.where(in_valid, s_keys, jnp.int64(2 ** 62))
    t_keys = jnp.sum((t_in.astype(jnp.int64) - t_lo) * t_strides, axis=-1)

    s_out_rel = s_out.astype(jnp.int64) - s_lo
    t_out_rel = t_out.astype(jnp.int64) - t_lo
    s_out_key = jnp.sum(s_out_rel * s_strides, axis=-1)           # [M]
    t_out_key = jnp.sum(t_out_rel * t_strides, axis=-1)           # [M]
    s_off_key = jnp.sum(offs_s.astype(jnp.int64) * s_strides, axis=-1)
    t_off_key = jnp.sum(offs_t.astype(jnp.int64) * t_strides, axis=-1)
    qk_s = s_out_key[None, :] + s_off_key[:, None]                # [Ks, M]
    # t target keys for every (kt, j): computed, never gathered
    qk_t = t_out_key[None, :] + t_off_key[:, None]                # [Kt, M]

    s_range = out_valid[None, :]
    for d in range(Ds):
        col = s_out_rel[:, d]
        od = offs_s.astype(jnp.int64)[:, d:d + 1]
        s_range = s_range & (col[None, :] >= -od) & (
            col[None, :] < s_spans[d] - od)
    t_range = jnp.ones((Kt, M), bool)
    for d in range(Dt):
        col = t_out_rel[:, d]
        od = offs_t.astype(jnp.int64)[:, d:d + 1]
        t_range = t_range & (col[None, :] >= -od) & (
            col[None, :] < t_spans[d] - od)

    # ---- exact fallback: full 6-D sorted join (only the cond branch
    # taken pays for its gathers) ----
    def sorted_path(_):
        span_t_total = jnp.prod(t_spans)
        keys6 = jnp.where(in_valid, s_keys * span_t_total + t_keys,
                          jnp.int64(2 ** 62))
        q6 = (qk_s * span_t_total)[:, None, :] + qk_t[None, :, :]
        q6 = q6.reshape(Ks * Kt, M)
        rng6 = (s_range[:, None, :] & t_range[None, :, :]).reshape(
            Ks * Kt, M)
        order = jnp.argsort(keys6)
        keys_sorted = keys6[order]
        pos = jnp.searchsorted(keys_sorted, q6.ravel()).reshape(q6.shape)
        pos = jnp.minimum(pos, N - 1)
        hit = (keys_sorted[pos] == q6) & rng6
        return jnp.where(hit, order[pos].astype(jnp.int32), sentinel)

    # ---- chained displacement hash over the SRC keys ----
    IB = max(int(np.ceil(np.log2(max(N, 2)))), 1)
    b = max(int(np.ceil(np.log2(max(8 * N, 16)))), 4)
    T = 1 << b
    key_bits = (31 if compact else 62) - IB
    key_fits = jnp.max(jnp.where(in_valid, s_keys, 0)) < (
        jnp.int64(1) << key_bits)
    if compact:
        # src-part keys are 3-D and almost always fit int32 even when the
        # joint 6-D key cannot: half the gather bytes, no x64 emulation.
        kdtype, empty, mults = jnp.int32, _EMPTY_KEY32, _HASH_MULTS32
        key_fits = key_fits & (jnp.max(jnp.abs(t_keys)) < 2 ** 31 - 1)
    else:
        kdtype, empty, mults = jnp.int64, _EMPTY_KEY, _HASH_MULTS
    s_keys_c = s_keys.astype(kdtype)
    qk_s_c = qk_s.astype(kdtype)
    t_keys_c = t_keys.astype(kdtype)
    qk_t_c = qk_t.astype(kdtype)
    rows = jnp.arange(N, dtype=kdtype)
    entries = (s_keys_c << IB) | rows

    def hash_of(k, mult):
        if compact:
            u = k.astype(jnp.uint32) * jnp.uint32(mult)
            return (u >> jnp.uint32(32 - b)).astype(jnp.int32)
        u = k.astype(jnp.uint64) * jnp.uint64(mult)
        return (u >> jnp.uint64(64 - b)).astype(jnp.int32)

    src_sel = in_valid if src_pass is None else (in_valid & (src_pass > 0))

    tables = []
    pending = src_sel
    for c in range(chains):
        for mult in mults:
            h = jnp.where(pending, hash_of(s_keys_c, mult), T)
            t = jnp.full((T,), kdtype(empty)).at[h].set(
                entries, mode="drop")
            placed = pending & (t[jnp.minimum(h, T - 1)] == entries)
            pending = pending & ~placed
            tables.append((t, mult))
    overflow = jnp.any(pending) | ~key_fits

    # tgt-part chained tables for the rows routed off the src side
    t_tables = []
    if chains_t:
        # tgt keys enter entries too: they must also fit the packed width
        key_fits = key_fits & (
            jnp.max(jnp.where(in_valid, t_keys, 0))
            < (jnp.int64(1) << key_bits))
        t_keys_valid = jnp.where(in_valid, t_keys,
                                 jnp.int64(2 ** 62)).astype(kdtype)
        entries_t = (t_keys_valid << IB) | rows
        pending_t = in_valid & ~src_sel
        for c in range(chains_t):
            for mult in mults:
                h = jnp.where(pending_t, hash_of(t_keys_valid, mult), T)
                t = jnp.full((T,), kdtype(empty)).at[h].set(
                    entries_t, mode="drop")
                placed = pending_t & (t[jnp.minimum(h, T - 1)]
                                      == entries_t)
                pending_t = pending_t & ~placed
                t_tables.append((t, mult))
        overflow = overflow | jnp.any(pending_t) | ~key_fits

    def hash_path(_):
        idx = jnp.full((Ks, Kt, M), sentinel, jnp.int32)
        found = jnp.zeros((Ks, Kt, M), bool)
        for t, mult in tables:
            e = t[hash_of(qk_s_c, mult)]                      # [Ks, M] gather
            s_hit = ((e >> IB) == qk_s_c) & s_range
            cand = (e & ((1 << IB) - 1)).astype(jnp.int32)
            cand_safe = jnp.where(s_hit, cand, 0)
            tk = t_keys_c[cand_safe]                          # [Ks, M] gather
            # broadcast compare against all Kt t-offsets: no more gathers
            m3 = (s_hit[:, None, :] & t_range[None, :, :]
                  & (tk[:, None, :] == qk_t_c[None, :, :]))   # [Ks, Kt, M]
            idx = jnp.where(m3 & ~found, cand_safe[:, None, :], idx)
            found = found | m3
        for t, mult in t_tables:                     # symmetric tgt probe
            e = t[hash_of(qk_t_c, mult)]                      # [Kt, M] gather
            t_hit = ((e >> IB) == qk_t_c) & t_range
            cand = (e & ((1 << IB) - 1)).astype(jnp.int32)
            cand_safe = jnp.where(t_hit, cand, 0)
            sk = s_keys_c[cand_safe]                          # [Kt, M] gather
            m3 = (t_hit[None, :, :] & s_range[:, None, :]
                  & (sk[None, :, :] == qk_s_c[:, None, :]))   # [Ks, Kt, M]
            idx = jnp.where(m3 & ~found, cand_safe[None, :, :], idx)
            found = found | m3
        return idx.reshape(Ks * Kt, M)

    return jax.lax.cond(overflow, sorted_path, hash_path, None)


def device_kernel_map_srcdense(in_coords, out_coords, offs_s, offs_t,
                               in_valid_mask, out_valid_mask, src_rank,
                               mult_cap: int, cells: int, sentinel: int,
                               packed: bool, shift: int = 0,
                               row_mode: bool = False):
    """Separable 6-D probe via a DIRECT-ADDRESS 3-D src-part table.

    The split probe (device_kernel_map_split) resolves src-part
    candidates through 3 x chains hash tables — 2 gathers per table
    round, 6*chains gathers per query at the fine levels. Here the src
    part addresses a dense [cells * mult_cap] table directly (the 3-D
    src frame is tiny: ~36k cells at 3DMatch level 0), with the
    multiplicity slot precomputed ON HOST (src_rank — the level coords
    are host arrays, so the rank-within-src-cell is a cheap np.unique).
    Each probe is then ONE gather per multiplicity slot:

      packed=True:  table entry = (tgt_key << row_bits) | row — the tgt
                    verification key rides along, so NO second gather.
      packed=False: two flat int32 tables (row, tgt_key) — 2 gathers —
                    for frames whose tgt key exceeds 31 - row_bits bits.

    mult_cap rounds of [27, M] small-table gathers replace the split
    probe's 3*chains rounds of 2 gathers: at 22k voxels / level 1
    (mult 8 vs chains 4) that is 4.9M vs 14.6M gathered elements, all
    against a <=64 MB table (the TPU gather-rate cliff for big tables is
    the reason the [cells6] joint dense table loses at level <= 1: its
    2^25-cell table is 134 MB * 3 lane replicas).

    src_rank: [N] int32 — rank of each in-row within its src cell
    (invalid rows >= mult_cap). Host-exact, so no overflow cond is
    needed; an in-graph frame guard still falls back to the full sorted
    join if the device-computed frame exceeds ``cells``.

    row_mode=True: the table is laid out [cells, mult_cap] and the probe
    issues ONE [Ks, M] ROW gather (all mult_cap slots of a src cell ride
    one gather descriptor as contiguous lanes) instead of mult_cap scalar
    gather rounds. The per-(kt) match is then a broadcast reduce over the
    slot lanes. Since probe cost is gather-DESCRIPTOR bound (~40 M/s
    measured on v5e at surface scale), this turns the coarse-level
    multiplicity (50-80 at a 30k-voxel surface scan, the reference's
    MinkowskiEngine coordinate-manager worst case) from a x(mult/3) round
    multiplier into a constant. Mirrors the reference's kernel-map
    semantics at core/deep_global_registration.py:248-260 (6-D inlier
    conv input) with no behavioral change: output remains bit-identical.

    Returns nbr [(Ks*Kt), M] int32, identical to device_kernel_map with
    cartesian(offs_s, offs_t).
    """
    with jax.enable_x64():
        return _device_kernel_map_srcdense(
            in_coords, out_coords, offs_s, offs_t, in_valid_mask,
            out_valid_mask, src_rank, mult_cap=mult_cap, cells=cells,
            sentinel=sentinel, packed=packed, shift=shift,
            row_mode=row_mode)


@partial(jax.jit,
         static_argnames=("mult_cap", "cells", "sentinel", "packed",
                          "shift", "row_mode"))
def _device_kernel_map_srcdense(in_coords, out_coords, offs_s, offs_t,
                                in_valid_mask, out_valid_mask, src_rank,
                                mult_cap: int, cells: int, sentinel: int,
                                packed: bool, shift: int = 0,
                                row_mode: bool = False):
    if shift:
        in_coords = in_coords >> shift
        out_coords = out_coords >> shift
        offs_s = offs_s >> shift
        offs_t = offs_t >> shift
    N = in_coords.shape[0]
    M = out_coords.shape[0]
    Ks, Ds = offs_s.shape
    Kt, Dt = offs_t.shape
    in_valid = in_valid_mask > 0
    out_valid = out_valid_mask > 0
    big = jnp.int32(1 << 20)

    def frame(in_c, out_c, offs):
        lo = jnp.minimum(
            jnp.min(jnp.where(in_valid[:, None], in_c, big), axis=0),
            jnp.min(jnp.where(out_valid[:, None], out_c, big), axis=0)
            + jnp.min(offs, axis=0),
        ).astype(jnp.int64)
        hi = jnp.max(jnp.where(in_valid[:, None], in_c, -big), axis=0)
        spans = jnp.maximum(hi.astype(jnp.int64) - lo + 1, 1)
        strides = jnp.concatenate([
            jnp.cumprod(spans[::-1])[::-1][1:], jnp.ones((1,), jnp.int64)])
        return lo, spans, strides

    s_in, t_in = in_coords[:, :Ds], in_coords[:, Ds:]
    s_out, t_out = out_coords[:, :Ds], out_coords[:, Ds:]
    s_lo, s_spans, s_strides = frame(s_in, s_out, offs_s)
    t_lo, t_spans, t_strides = frame(t_in, t_out, offs_t)

    s_keys = jnp.sum((s_in.astype(jnp.int64) - s_lo) * s_strides, axis=-1)
    t_keys = jnp.sum((t_in.astype(jnp.int64) - t_lo) * t_strides, axis=-1)
    s_out_rel = s_out.astype(jnp.int64) - s_lo
    t_out_rel = t_out.astype(jnp.int64) - t_lo
    s_out_key = jnp.sum(s_out_rel * s_strides, axis=-1)
    t_out_key = jnp.sum(t_out_rel * t_strides, axis=-1)
    s_off_key = jnp.sum(offs_s.astype(jnp.int64) * s_strides, axis=-1)
    t_off_key = jnp.sum(offs_t.astype(jnp.int64) * t_strides, axis=-1)
    qk_s = s_out_key[None, :] + s_off_key[:, None]              # [Ks, M]
    qk_t = t_out_key[None, :] + t_off_key[:, None]              # [Kt, M]

    s_range = out_valid[None, :]
    for d in range(Ds):
        col = s_out_rel[:, d]
        od = offs_s.astype(jnp.int64)[:, d:d + 1]
        s_range = s_range & (col[None, :] >= -od) & (
            col[None, :] < s_spans[d] - od)
    t_range = jnp.ones((Kt, M), bool)
    for d in range(Dt):
        col = t_out_rel[:, d]
        od = offs_t.astype(jnp.int64)[:, d:d + 1]
        t_range = t_range & (col[None, :] >= -od) & (
            col[None, :] < t_spans[d] - od)

    def sorted_path(_):
        span_t_total = jnp.prod(t_spans)
        keys6 = jnp.where(in_valid, s_keys * span_t_total + t_keys,
                          jnp.int64(2 ** 62))
        q6 = (qk_s * span_t_total)[:, None, :] + qk_t[None, :, :]
        q6 = q6.reshape(Ks * Kt, M)
        rng6 = (s_range[:, None, :] & t_range[None, :, :]).reshape(
            Ks * Kt, M)
        order = jnp.argsort(keys6)
        keys_sorted = keys6[order]
        pos = jnp.searchsorted(keys_sorted, q6.ravel()).reshape(q6.shape)
        pos = jnp.minimum(pos, N - 1)
        hit = (keys_sorted[pos] == q6) & rng6
        return jnp.where(hit, order[pos].astype(jnp.int32), sentinel)

    # host-exact gate re-checked in-graph (padded/degenerate inputs);
    # padded rows carry rank >= mult_cap by convention and are excluded
    guard = (jnp.prod(s_spans) > cells) | (
        jnp.max(jnp.where(in_valid, src_rank, -1)) >= mult_cap)

    IB = max(int(np.ceil(np.log2(max(N, 2)))), 1)
    rows = jnp.arange(N, dtype=jnp.int32)
    slot = jnp.where(in_valid & (src_rank < mult_cap),
                     s_keys.astype(jnp.int32) * mult_cap + src_rank,
                     jnp.int32(cells) * mult_cap)        # OOB -> dropped
    qcell = (jnp.clip(qk_s, 0, cells - 1) * mult_cap).astype(jnp.int32)
    qk_t32 = qk_t.astype(jnp.int32)

    def srcrows_path(_):
        """One [Ks, M] ROW gather over a [cells, mult_cap] table; the
        mult_cap slots arrive as lanes. Rank order = slot order, so the
        first-match convention is preserved by a min-reduce over
        rank*N + row (6-D coords are unique in the pyramid, so at most
        one slot matches a given (ks, j, kt) anyway)."""
        base = jnp.clip(qk_s, 0, cells - 1).astype(jnp.int32)   # [Ks, M]
        if packed:
            entries = ((t_keys.astype(jnp.int32) << IB) | rows)
            table = jnp.full((cells, mult_cap), jnp.int32(-1)).at[
                slot // mult_cap, slot % mult_cap].set(entries, mode="drop")
            e = table[base]                          # [Ks, M, R] row gather
            ok = e >= 0
            tk = e >> IB
            cand = e & ((1 << IB) - 1)
        else:
            row_t = jnp.full((cells, mult_cap), jnp.int32(-1)).at[
                slot // mult_cap, slot % mult_cap].set(rows, mode="drop")
            tk_t = jnp.full((cells, mult_cap), jnp.int32(-1)).at[
                slot // mult_cap, slot % mult_cap].set(
                t_keys.astype(jnp.int32), mode="drop")
            cand = row_t[base]                       # [Ks, M, R] row gather
            tk = tk_t[base]                          # [Ks, M, R] row gather
            ok = cand >= 0
        ok = ok & s_range[:, :, None]
        # rank-ordered pick: slot r holds rank r, value r*N + row
        rank_val = (jnp.arange(mult_cap, dtype=jnp.int32) * N)[None, None]
        big32 = jnp.int32(2 ** 31 - 1)
        cols = []
        for kt in range(Kt):
            m = ok & (tk == qk_t32[kt][None, :, None])   # [Ks, M, R]
            v = jnp.min(jnp.where(m, rank_val + cand, big32), axis=-1)
            hit = (v != big32) & t_range[kt][None, :]
            cols.append(jnp.where(hit, v % N, sentinel))
        return jnp.stack(cols, axis=1).reshape(Ks * Kt, M)

    def srcdense_path(_):
        idx = jnp.full((Ks, Kt, M), sentinel, jnp.int32)
        found = jnp.zeros((Ks, Kt, M), bool)
        if packed:
            entries = ((t_keys.astype(jnp.int32) << IB) | rows)
            table = jnp.full((cells * mult_cap,), jnp.int32(-1)
                             ).at[slot].set(entries, mode="drop")
            for c in range(mult_cap):
                e = table[qcell + c]                     # [Ks, M] gather
                ok = s_range & (e >= 0)
                tk = e >> IB
                cand = e & ((1 << IB) - 1)
                m3 = (ok[:, None, :] & t_range[None, :, :]
                      & (tk[:, None, :] == qk_t32[None, :, :]))
                idx = jnp.where(m3 & ~found, cand[:, None, :], idx)
                found = found | m3
        else:
            row_t = jnp.full((cells * mult_cap,), jnp.int32(-1)
                             ).at[slot].set(rows, mode="drop")
            tk_t = jnp.full((cells * mult_cap,), jnp.int32(-1)
                            ).at[slot].set(t_keys.astype(jnp.int32),
                                           mode="drop")
            for c in range(mult_cap):
                cand = row_t[qcell + c]                  # [Ks, M] gather
                tk = tk_t[qcell + c]                     # [Ks, M] gather
                ok = s_range & (cand >= 0)
                m3 = (ok[:, None, :] & t_range[None, :, :]
                      & (tk[:, None, :] == qk_t32[None, :, :]))
                idx = jnp.where(m3 & ~found, cand[:, None, :], idx)
                found = found | m3
        return idx.reshape(Ks * Kt, M)

    return jax.lax.cond(guard, sorted_path,
                        srcrows_path if row_mode else srcdense_path, None)


# ---------------------------------------------------------------------------
# Full pyramid on device (drop-in for pyramid_to_arrays(build_pyramid(...)))
# ---------------------------------------------------------------------------


def _prune_and_pad_device(nbr, cap_in: int, kernel_volume: int,
                          prune: bool, granule: int = 32, nonempty=None):
    """Device-side equivalent of host prune_empty + _pad_offsets.

    Keeps the same offset order and the same bucket rule
    (target = min(ceil(K'/granule)*granule, K_full)); padded offset rows
    read an all-sentinel row (zero contribution) with kept-id 0. Needs a
    [K]-bool host fetch to pick the kept set (the maps stay on device) —
    callers building several maps should precompute all `nonempty`
    vectors and fetch them in one batch, so every probe is dispatched
    before the first host sync.
    """
    K = nbr.shape[0]
    if not prune:
        return nbr, jnp.arange(K, dtype=jnp.int32)
    if nonempty is None:
        nonempty = np.array(jnp.any(nbr != cap_in, axis=1))  # tiny fetch
    else:
        nonempty = np.array(nonempty)
    nonempty[kernel_volume // 2] = True                     # keep center
    kept = np.nonzero(nonempty)[0].astype(np.int32)
    target = min(-(-len(kept) // granule) * granule, K)
    if len(kept) == K and target == K:
        # nothing pruned (dense occupancy): the gather below would be an
        # identity — skip the [K, M] HBM round trip entirely
        return nbr, jnp.arange(K, dtype=jnp.int32)
    rows = np.full((target,), K, np.int32)                  # K = sentinel row
    rows[: len(kept)] = kept
    kept_pad = np.zeros((target,), np.int32)
    kept_pad[: len(kept)] = kept
    nbr_ext = jnp.concatenate(
        [nbr, jnp.full((1, nbr.shape[1]), cap_in, jnp.int32)], axis=0)
    return nbr_ext[jnp.asarray(rows)], jnp.asarray(kept_pad)


SPLIT_RANK_CAP = 6              # rows per src key kept src-side


def plan_split_probe(c: np.ndarray):
    """Separable SRC/TGT probe plan for one 6-D level's coordinates.

    Returns ``(chains, chains_t, src_pass, src_mult, rank)``:
    ``chains == 0`` → full 729-offset probe fallback; ``chains_t == 0``
    → single src-side pass (src_pass is None); otherwise the two-pass
    probe with ``src_pass`` as the float row-routing mask. ``rank`` is
    each row's rank within its 3-D src cell (consumed by the
    direct-address srcdense/srcrows tiers), ``src_mult`` the max cell
    multiplicity.

    This is THE plan ``build_pyramid_arrays_device`` ships; the probe
    benchmarks (scripts/profile_probes.py, scripts/bench_split_probe.py)
    call it too so they measure the live configuration instead of a
    drifting replica.
    """
    _, gid, counts = np.unique(c[:, :3], axis=0, return_inverse=True,
                               return_counts=True)
    gid = gid.reshape(-1)
    order0 = np.argsort(gid, kind="stable")
    sg0 = gid[order0]
    starts0 = np.r_[0, np.nonzero(np.diff(sg0))[0] + 1]
    seg0 = np.diff(np.r_[starts0, len(c)])
    rank = np.empty(len(c), np.int32)
    rank[order0] = (np.arange(len(c)) -
                    np.repeat(starts0, seg0)).astype(np.int32)
    mult = int(counts.max())
    chains = -(-mult // 3)
    # +1 chain of slack when duplicates exist: ceil(mult/3) is exactly
    # tight, so a single slot-race loss to an unrelated key would leave
    # a row unplaced and flip the WHOLE map to the sorted fallback
    # (measured 6 s at 30k voxels — 50x the hash path). Three spare
    # slots make that ~impossible.
    chains = chains + 1 if chains >= 2 else chains
    if chains <= 4:
        return chains, 0, None, mult, rank
    # two-pass routing: rows past SPLIT_RANK_CAP within their src cell
    # go to TGT-part chained tables (6-D keys are unique, so excess rows
    # almost always have low tgt-part multiplicity)
    src_pass = (rank < SPLIT_RANK_CAP).astype(np.float32)
    excess = rank >= SPLIT_RANK_CAP
    ch_s = SPLIT_RANK_CAP // 3 + 1              # slots cover cap + slack
    if not excess.any():
        return ch_s, 0, None, mult, rank
    _, tcounts = np.unique(c[excess][:, 3:], axis=0, return_counts=True)
    ch_t = -(-int(tcounts.max()) // 3)
    ch_t = ch_t + 1 if ch_t >= 2 else ch_t
    if ch_s + ch_t > 13:
        return 0, 0, None, mult, rank           # full probe fallback
    return ch_s, ch_t, src_pass, mult, rank


def build_pyramid_arrays_device(
        coords: np.ndarray, num_levels: int, conv1_kernel_size: int = 3,
        dim: Optional[int] = None, region: str = "hypercube",
        granule: int = 512, caps: Optional[Sequence[int]] = None,
        compact_conv: bool = False, compact_dense_frac: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Build the jittable pyramid dict with all kernel maps ON DEVICE.

    Drop-in replacement for pyramid_to_arrays(build_pyramid(...)): the
    host only downsamples coords per level (a cheap sort-unique over <30k
    rows) and, in high-D, fetches one [K] count vector per map to prune
    empty offsets. The K x M neighbor probing — the 6-D bottleneck (~230M
    probes) — runs as sorted-key binary search on the accelerator, and
    the maps are born where the conv consumes them.

    compact_conv (high-D only): emit two-tier compacted schedules
    (``{name}_cmp`` keys, sparse/compact.py) instead of pruned dense
    maps — the same per-offset counts fetched for pruning size the
    compaction, so no extra host sync. Up schedules derive from down
    schedules by in/out swap (no inversion scatter, no extra probe).
    """
    dim = dim if dim is not None else coords.shape[1]
    offs_fn = (hypercube_offsets if region == "hypercube" else
               hypercross_offsets)
    prune = dim > 3

    level_coords = [coords.astype(np.int32)]
    for l in range(1, num_levels):
        level_coords.append(
            downsample_coords(level_coords[l - 1], 2, 2 ** (l - 1)))

    n_l, cap_l, cpad_l, mask_l = [], [], [], []
    for l, c in enumerate(level_coords):
        n = len(c)
        cap = caps[l] if caps is not None else _pad_cap(n, granule)
        c_pad = np.zeros((cap, dim), np.int32)
        c_pad[:n] = c
        mask = (np.arange(cap) < n).astype(np.float32)
        n_l.append(n)
        cap_l.append(cap)
        cpad_l.append(jnp.asarray(c_pad))
        mask_l.append(jnp.asarray(mask))

    # 6-D hypercube maps use the separable SRC/TGT probe when the in-side
    # src-part multiplicity allows (host-known: level coords are built
    # here). chains*3 hash tables hold up to chains*3 duplicates of one
    # src key; beyond SPLIT_RANK_CAP duplicates the EXCESS rows of each
    # hot src key are routed to TGT-part chained tables instead (the
    # two-pass probe) — the 6-D keys are unique, so excess rows almost
    # always have low tgt-part multiplicity. This keeps coarse levels
    # (multiplicity 50+) on the cheap split probe instead of the
    # 13.5x-more-gathers full 729-offset probe (r3: level-2 self map
    # 1.18 s -> ~0.3 s at 22k voxels).
    import os as _os0
    import time as _time0
    _t_plan = _time0.perf_counter()
    split_plan = []             # (chains, chains_t, src_pass or None)
    src_info = []               # (max src multiplicity, rank-in-cell [n])
    for l, c in enumerate(level_coords):
        if not (dim == 6 and region == "hypercube" and len(c)):
            split_plan.append((0, 0, None))
            src_info.append(None)
            continue
        chains, chains_t, src_pass, mult, rank0 = plan_split_probe(c)
        src_info.append((mult, rank0))
        split_plan.append((chains, chains_t, src_pass))
    if _os0.environ.get("GMF_PROBE_PROFILE") == "1":
        print(f"  [build] host plan (downsample+split plan) "
              f"{(_time0.perf_counter() - _t_plan) * 1e3:7.1f} ms")

    # Joint dense-table budget, set by GATHER RATE, not HBM. Measured on
    # this v5e (scripts/bench_gather_tiers.py, outputs/r3_tpu_sweep/
    # gather_tiers.txt): scalar gathers run a flat ~114 Mdesc/s up to
    # 64 MB tables and drop to ~68 Mdesc/s at 128 MB+ — the cliff is at
    # 128 MB, not 16 MB as r3's first estimate assumed. 2^24 cells x
    # int32 = 64 MB stays in the fast zone and covers the 30k-voxel
    # surface scan's conv1 frame (~2^23 cells), which previously fell to
    # the 3-round hash probe (826 ms vs ~35 ms dense at uniform).
    DENSE_CELL_BUDGET = 1 << 24

    # src-dense probe gates: table entries (3-D src cells x multiplicity
    # slots) stay <= 2^24 (64 MB, same measured gather-rate zone) and the
    # per-slot loop stays short. mult_cap buckets to a small menu so the
    # jitted probe compiles once per bucket, not once per pair.
    SRCDENSE_ENTRY_BUDGET = 1 << 24
    SRCDENSE_MULT_MENU = (1, 2, 4, 6, 8, 12)
    # Row-mode tier: multiplicity beyond the slot-loop menu switches to
    # the [cells, R] row-gather table (one descriptor per probe, R slots
    # per descriptor) instead of R scalar rounds. Measured: row gathers
    # cost ~2x LESS per descriptor than scalar gathers at any R <= 128
    # for tables <= 64 MB (~240 Mdesc/s = up to 32 Gelem/s), so the
    # coarse-level multiplicity (50-80 at surface scans) stops being a
    # round multiplier entirely.
    SRCROWS_MULT_MENU = (4, 8, 16, 32, 64, 128)
    # NOT extended past 128 (r5): at random-match level 3 (M ~84k,
    # mult max 236) an R=256 row table means a [27, M, 256] gather
    # intermediate swept 27 times by the tgt-offset loop (~6e10 VPU
    # ops, ~15 s) — measurably worse than the 4.3 s split-chain path
    # those shapes fall back to (srcdense_rowmode_ab_warm.txt).
    SRCROWS_ENTRY_BUDGET = 1 << 24

    def _bound3(in_3, out_3, slack):
        lo = np.minimum(in_3.min(0), out_3.min(0) - slack)
        spans = np.maximum(in_3.max(0).astype(np.int64) - lo + 1, 1)
        prod = 1
        for s in spans:
            prod *= int(s)
            if prod > 2 ** 40:
                return 0
        return prod

    def _srcdense_probe(l_in, l_out, t_stride):
        """3-D src-part direct-address probe (device_kernel_map_srcdense)
        when the in-level's src multiplicity and 3-D frame allow; None
        otherwise."""
        if src_info[l_in] is None:
            return None
        mult, rank = src_info[l_in]
        # Row-mode default (r5): ON from multiplicity 2 up. The r5
        # serialized warm A/B at KITTI LiDAR scale
        # (outputs/r5_tpu/srcdense_rowmode_ab_warm.txt,
        # scripts/profile_srcdense_random.py) measured rowmode
        # neutral-to-better in BOTH match regimes — oracle 2.28 vs
        # 2.33 s full build (probe sum 446 vs 618 ms), random 8.01 vs
        # 8.24 s — and r4's 3DMatch-scale A/B was neutral. The r4
        # "rowmode-random regression" (8.64 vs 7.73) compared ACROSS
        # rounds (r3 baseline vs r4 rowmode, different sessions); the
        # same-session A/B shows no regression. GMF_SRCDENSE_ROWMODE_MIN
        # still overrides in either direction per deployment.
        import os as _os2

        _min = int(_os2.environ.get("GMF_SRCDENSE_ROWMODE_MIN", "2"))
        row_mode = mult >= _min or mult > SRCDENSE_MULT_MENU[-1]
        if row_mode:
            if mult > SRCROWS_MULT_MENU[-1]:
                return None
            mult_cap = next(m for m in SRCROWS_MULT_MENU if m >= mult)
            entry_budget = SRCROWS_ENTRY_BUDGET
        else:
            mult_cap = next(m for m in SRCDENSE_MULT_MENU if m >= mult)
            entry_budget = SRCDENSE_ENTRY_BUDGET
        in_c, out_c = level_coords[l_in], level_coords[l_out]
        # Coords sit on the stride-t lattice: probe in lattice units
        # (shift right) so frames shrink t^3 per half — this is what
        # keeps the direct-address table (and the packed int32 entry)
        # viable at coarse levels of large scans.
        sh = int(t_stride).bit_length() - 1
        in_3, out_3 = in_c[:, :3] >> sh, out_c[:, :3] >> sh
        in_t, out_t = in_c[:, 3:] >> sh, out_c[:, 3:] >> sh
        slack = 1
        cells = _bound3(in_3, out_3, slack)
        if not cells or cells * mult_cap > entry_budget:
            return None
        cells = 1 << max(int(np.ceil(np.log2(cells))), 4)
        if cells * mult_cap > entry_budget:
            return None
        tcells = _bound3(in_t, out_t, slack)
        if not tcells or tcells >= 2 ** 31:
            return None
        IB = max(int(np.ceil(np.log2(max(cap_l[l_in], 2)))), 1)
        packed = tcells < (1 << (31 - IB))
        rank_pad = np.zeros(cap_l[l_in], np.int32)
        rank_pad[: len(rank)] = rank
        k3s = jnp.asarray(hypercube_offsets(3, 3, t_stride))
        return device_kernel_map_srcdense(
            cpad_l[l_in], cpad_l[l_out], k3s, k3s, mask_l[l_in],
            mask_l[l_out], jnp.asarray(rank_pad), mult_cap=mult_cap,
            cells=cells, sentinel=cap_l[l_in], packed=packed, shift=sh,
            row_mode=row_mode)

    def probe(l_in, l_out, kernel_size, t_stride):
        chains, chains_t, src_pass = split_plan[l_in]
        in_c, out_c = level_coords[l_in], level_coords[l_out]
        slack = t_stride * (kernel_size // 2)
        if kernel_size == 3 and dim == 6 and region == "hypercube":
            sd = _srcdense_probe(l_in, l_out, t_stride)
            if sd is not None:
                return sd
        cells = _dense_cells_bound(in_c, out_c, slack, lattice=t_stride)
        if 0 < cells <= DENSE_CELL_BUDGET:
            k = offs_fn(kernel_size, dim, t_stride)
            return device_kernel_map(
                cpad_l[l_in], cpad_l[l_out], jnp.asarray(k), mask_l[l_in],
                mask_l[l_out], sentinel=cap_l[l_in], dense_cells=cells,
                lattice=t_stride,
                lane_group=kernel_size if region == "hypercube" else 1)
        if kernel_size == 3 and chains >= 1:
            k3s = jnp.asarray(offs_fn(3, 3, t_stride))
            # probes shift coords into lattice units (exact: level
            # coords are stride multiples), shrinking frames t^3 per
            # half so int32 keys survive at surface-scan scale
            sh = int(t_stride).bit_length() - 1
            # two-pass packs TGT keys with row ids too -> with_rows on
            # both frames; single-pass only needs bare tgt compare keys
            comp = (_int32_frame_fits(in_c[:, :3], out_c[:, :3], slack,
                                      cap_l[l_in], with_rows=True,
                                      lattice=t_stride)
                    and _int32_frame_fits(in_c[:, 3:], out_c[:, 3:], slack,
                                          cap_l[l_in],
                                          with_rows=chains_t > 0,
                                          lattice=t_stride))
            if chains_t:
                sp = np.zeros(cap_l[l_in], np.float32)
                sp[: len(src_pass)] = src_pass
                return device_kernel_map_split2(
                    cpad_l[l_in], cpad_l[l_out], k3s, k3s, mask_l[l_in],
                    mask_l[l_out], jnp.asarray(sp),
                    sentinel=cap_l[l_in], chains=chains,
                    chains_t=chains_t, compact=comp, shift=sh)
            return device_kernel_map_split(
                cpad_l[l_in], cpad_l[l_out], k3s, k3s, mask_l[l_in],
                mask_l[l_out], sentinel=cap_l[l_in], chains=chains,
                compact=comp, shift=sh)
        k = offs_fn(kernel_size, dim, t_stride)
        comp = _int32_frame_fits(in_c, out_c, slack, cap_l[l_in],
                                 with_rows=True, lattice=t_stride)
        return device_kernel_map(
            cpad_l[l_in], cpad_l[l_out], jnp.asarray(k), mask_l[l_in],
            mask_l[l_out], sentinel=cap_l[l_in], compact=comp,
            lattice=t_stride)

    # Phase 1: dispatch EVERY probe before the first host fetch — the
    # prune decision needs a [K]-bool from each map, and fetching eagerly
    # would idle the device through one relay round trip per map.
    # GMF_PROBE_PROFILE=1 breaks that pipelining to time each probe
    # individually (diagnostics only — adds one sync per map).
    import os as _os
    import time as _time
    _prof = _os.environ.get("GMF_PROBE_PROFILE") == "1"

    def _probe_job(name, l_in, l_out, ksz, stride):
        t0 = _time.perf_counter()
        nbr = probe(l_in, l_out, ksz, stride)
        if _prof:
            t1 = _time.perf_counter()
            jax.device_get(nbr[:1, :1])
            print(f"  [probe] {name:8s} K={nbr.shape[0]:4d} "
                  f"M={nbr.shape[1]:6d} dispatch {(t1 - t0) * 1e3:6.1f} ms "
                  f"exec+sync {(_time.perf_counter() - t1) * 1e3:7.1f} ms")
        return nbr

    jobs = []   # (array key, level of the input side, kernel volume, nbr)
    for l in range(num_levels):
        kv = len(offs_fn(3, dim, 1))
        jobs.append((f"self_{l}", l, kv,
                     _probe_job(f"self_{l}", l, l, 3, 2 ** l)))
        if l + 1 < num_levels:
            jobs.append((f"down_{l}", l, kv,
                         _probe_job(f"down_{l}", l, l + 1, 3, 2 ** l)))
    if conv1_kernel_size != 3:
        kv1 = len(offs_fn(conv1_kernel_size, dim, 1))
        jobs.append(("conv1", 0, kv1,
                     _probe_job("conv1", 0, 0, conv1_kernel_size, 1)))

    # Phase 2: one batched fetch of all prune vectors (per-offset hit
    # counts — `> 0` is the prune bool; the counts themselves size the
    # compact schedules, so compaction costs no extra sync).
    counts = {}
    if prune:
        _t_counts = _time.perf_counter()
        counts = jax.device_get({
            name: jnp.sum(nbr != cap_l[l_in], axis=1, dtype=jnp.int32)
            for name, l_in, _, nbr in jobs})
        if _prof:
            print(f"  [build] counts fetch (syncs all probes) "
                  f"{(_time.perf_counter() - _t_counts) * 1e3:7.1f} ms")

    if compact_conv and prune:
        from gmf_tpu.sparse.compact import build_compact_schedules

        nbr_by = {name: (l_in, nbr) for name, l_in, _, nbr in jobs}
        # All per-map compactions fuse into ONE device dispatch (per-map
        # dispatches paid ~8 relay round trips per pyramid and ran as
        # separate executables in the inlier net's critical path).
        sched_jobs, sched_keys = [], []
        for l in range(num_levels):
            _, nbr = nbr_by[f"self_{l}"]
            sched_jobs.append((nbr, counts[f"self_{l}"], cap_l[l],
                               cap_l[l], False, compact_dense_frac))
            sched_keys.append((f"self_cmp_{l}", None))
            if l + 1 < num_levels:
                _, nbr = nbr_by[f"down_{l}"]
                sched_jobs.append((nbr, counts[f"down_{l}"], cap_l[l],
                                   cap_l[l + 1], True, compact_dense_frac))
                sched_keys.append((f"down_cmp_{l}", f"up_cmp_{l}"))
        if conv1_kernel_size != 3:
            _, nbr = nbr_by["conv1"]
            sched_jobs.append((nbr, counts["conv1"], cap_l[0], cap_l[0],
                               False, compact_dense_frac))
            sched_keys.append(("conv1_cmp", None))
        _t_cmp = _time.perf_counter()
        scheds = build_compact_schedules(sched_jobs)
        if _prof:
            t1 = _time.perf_counter()
            for leaf in jax.tree_util.tree_leaves(scheds):
                jax.device_get(jnp.ravel(leaf)[:1])
            print(f"  [build] compact schedules dispatch "
                  f"{(t1 - _t_cmp) * 1e3:7.1f} ms exec+sync "
                  f"{(_time.perf_counter() - t1) * 1e3:7.1f} ms")
        arrays: Dict[str, jnp.ndarray] = {}
        for l in range(num_levels):
            arrays[f"mask_{l}"] = mask_l[l]
        for (key, up_key), sched in zip(sched_keys, scheds):
            if up_key is None:
                arrays[key] = sched
            else:
                arrays[key], arrays[up_key] = sched
        if conv1_kernel_size == 3:
            arrays["conv1_cmp"] = arrays["self_cmp_0"]
        return arrays

    pruned = {
        name: _prune_and_pad_device(
            nbr, cap_l[l_in], kv, prune,
            nonempty=None if name not in counts else counts[name] > 0)
        for name, l_in, kv, nbr in jobs}

    arrays = {}
    for l in range(num_levels):
        arrays[f"mask_{l}"] = mask_l[l]
        arrays[f"self_map_{l}"], arrays[f"self_kept_{l}"] = pruned[
            f"self_{l}"]
        if l + 1 < num_levels:
            down, down_kept = pruned[f"down_{l}"]
            arrays[f"down_map_{l}"] = down
            arrays[f"down_kept_{l}"] = down_kept
            # The transpose map is the exact inverse of the forward map:
            # pair (i_fine, j_coarse) at offset a in `down` is pair
            # (j_coarse, i_fine) at offset a of the NEGATED offset list —
            # which is precisely how the host builds it (build_kernel_map
            # with -k3; same kept set, since a reversed pair exists iff
            # the forward one does). Deriving by scatter saves one full
            # K x M probe per level.
            up = jnp.full((down.shape[0], cap_l[l]), cap_l[l + 1],
                          jnp.int32)
            rows = jnp.broadcast_to(
                jnp.arange(down.shape[0], dtype=jnp.int32)[:, None],
                down.shape)
            cols = jnp.broadcast_to(
                jnp.arange(cap_l[l + 1], dtype=jnp.int32)[None, :],
                down.shape)
            # sentinel fine indices (== cap_l[l]) fall out of bounds ->
            # dropped; padded offset rows are all-sentinel -> no writes.
            up = up.at[rows, down].set(cols, mode="drop")
            arrays[f"up_map_{l}"] = up
            arrays[f"up_kept_{l}"] = down_kept
    if conv1_kernel_size == 3:
        # identical offset set at level 0 -> identical map (the 6-D
        # inlier net's case); skip the most expensive probe of the build
        arrays["conv1_map"] = arrays["self_map_0"]
        arrays["conv1_kept"] = arrays["self_kept_0"]
    else:
        arrays["conv1_map"], arrays["conv1_kept"] = pruned["conv1"]
    return arrays
