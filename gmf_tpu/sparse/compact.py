"""Compacted tile schedules for the 6-D sparse convolution.

The dense kernel-map conv (conv.py) gathers K' x M rows per map even
though 6-D maps are 0.3-5% occupied — ~230M gathered rows per inlier-net
forward at 22k correspondences, ~95% of them the zero sentinel
(scripts/measure_block_occupancy.py). This module turns a dense map into
an exact two-tier schedule:

  dense tier — offsets with >= M/2 hits keep their original [Kd, M]
               rows and run the scan-accumulate conv (no scatter; the
               accumulator never leaves VMEM). A compact row pays ~2
               HBM row touches (gather + scatter) vs 1 dense, hence
               the M/2 rule.
  tile tier  — every other offset's hit list is split into fixed-width
               tiles of T columns: (in_idx [Nt, T], out_idx [Nt, T],
               kept [Nt]) with kept the tile's offset id (repeats
               allowed). Partial tiles pad with (cap_in, cap_out) —
               the input zero row in, the output trash row out.

The FIXED tile width is what keeps jit happy across pairs: the only
shape variables are the pow2-bucketed tile count and dense-tier size,
so the big inlier-net executable is reused across pairs instead of
retracing on every new occupancy histogram (a variable per-group
bucket design recompiled the net per pair).

The conv consumes tiles as gather -> batched GEMM -> scatter-add
(conv.py sparse_conv_compact). Schedule construction runs in ONE
jitted dispatch per map (per-group dispatches paid ~100 tunnel round
trips — seconds on a relay-attached TPU), and only the hit COLUMNS are
scattered; in_idx derives from them by an element gather out of the
dense map (TPU element scatters run ~5x slower than gathers).

Up (transpose) schedules are derived from down schedules for free:
pair (j_coarse <- i_fine) lists are the SAME pairs with in/out swapped
— no extra probing or compaction.

Replaces the per-offset in/out pair lists MinkowskiEngine's GPU conv
builds in C++ (SURVEY.md §2.5); the reference's torch path never needed
this because ME scatters with CUDA atomics.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 128          # fixed tile width (lane-dim friendly GEMM batches)
SEG_GRANULE = 8     # dense-tier / compact-row counts pad to this


def _pow2_bucket(x: int, lo: int = SEG_GRANULE) -> int:
    b = lo
    while b < x:
        b <<= 1
    return b


def plan_tiles(counts: np.ndarray, m: int, tile: int = TILE,
               dense_frac: float = 0.5
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partition active offsets into a dense tier + fixed-width tiles.

    Args:
      counts: [K] per-offset hit counts (host ints).
      m: output width of the map (cap_out).
      dense_frac: offsets with count >= dense_frac * m stay dense. A
        dense row costs one gathered row; a compact row costs a gather
        PLUS a scatter-add touch, and TPU scatters run slower than
        gathers, so the break-even sits below 0.5 (tuned on-chip via
        scripts/profile_inlier_convs.py --dense-frac).

    Returns (dense_ids [Kd], compact_ids [Kc], tiles_per_id [Kc]) — ids
    index the ORIGINAL offset axis, count-descending.
    """
    counts = np.asarray(counts)
    ids = np.nonzero(counts > 0)[0]
    order = np.argsort(-counts[ids], kind="stable")
    ids = ids[order].astype(np.int32)
    c = counts[ids]
    dense = c >= dense_frac * m
    return (ids[dense], ids[~dense],
            (-(-c[~dense] // tile)).astype(np.int32))


def _compact_map_body(nbr, ids, sizes, tile_base, kd_pad: int, kc_pad: int,
                      nt_pad: int, tile: int, cap_in: int, cap_out: int,
                      with_up: bool):
    """Whole-map compaction (trace-level body; see _compact_map).

    Args:
      nbr: [K, M] dense neighbor table, sentinel = cap_in.
      ids: [kd_pad + kc_pad] offset ids, dense tier first, each segment
        zero-padded.
      sizes: [2] true segment sizes (kd, kc).
      tile_base: [kc_pad] starting tile index per compact offset
        (cumsum of tiles_per_id; padded rows point at tile nt_pad).
      with_up: also emit the transpose dense tier [kd_pad, cap_in]
        (inversion-scatter; tile transposes are an index swap, free).

    Returns (dense_rows, dense_kept, up_dense, in_idx [nt_pad, tile],
    out_idx [nt_pad, tile], tile_kept [nt_pad]); padded slots gather the
    zero row and scatter to the trash row, contributing nothing.
    """
    M = nbr.shape[1]
    dense_rows = dense_kept = up_dense = None
    if kd_pad:
        dids = ids[:kd_pad]
        dmask = jnp.arange(kd_pad, dtype=jnp.int32) < sizes[0]
        dense_rows = jnp.where(dmask[:, None], nbr[dids], cap_in)
        dense_kept = jnp.where(dmask, dids, 0)
        if with_up:
            r = jnp.broadcast_to(
                jnp.arange(kd_pad, dtype=jnp.int32)[:, None],
                dense_rows.shape)
            c = jnp.broadcast_to(
                jnp.arange(M, dtype=jnp.int32)[None, :], dense_rows.shape)
            # up sentinel = cap_out (the UP conv's input capacity);
            # sentinel fwd in-indices (== cap_in) fall out of bounds
            # of the [.., cap_in] scatter and drop.
            up_dense = jnp.full((kd_pad, cap_in), cap_out,
                                jnp.int32).at[r, dense_rows].set(
                                    c, mode="drop")
    if kc_pad == 0 or nt_pad == 0:
        empty = jnp.zeros((0, tile), jnp.int32)
        return (dense_rows, dense_kept, up_dense, empty, empty,
                jnp.zeros((0,), jnp.int32))

    cids = ids[kd_pad:kd_pad + kc_pad]
    cmask = jnp.arange(kc_pad, dtype=jnp.int32) < sizes[1]
    rows = jnp.where(cmask[:, None], nbr[cids], cap_in)   # [kc_pad, M]
    # Two-level rank-select for the q-th hit of a row. A flat binary
    # search on the [kc_pad, M] row cumsum pays log2(M) element-gather
    # rounds against a ~92 MB table — TPU gathers from big tables run
    # ~8-48M elem/s vs ~170M from small ones, and that search WAS the
    # compaction cost (self_2: 327 ms at 22k voxels). Instead:
    #   level 1: binary search over per-row 128-column BLOCK cumsums
    #            ([kc_pad, B] ~ 0.7 MB) — log2(B) small-table rounds;
    #   level 2: rank-select inside the block from bit-packed hit words
    #            ([kc_pad, B, 4] u32 ~ 2.8 MB): 4 word gathers + pure
    #            VPU population_count binary search (no gathers).
    # One final big-table gather reads the winning in-index.
    BW, WB = 128, 32                       # block width, word bits
    Mp = -(-M // BW) * BW
    hit = rows != cap_in                   # [kc_pad, M]
    if Mp != M:
        hit = jnp.concatenate(
            [hit, jnp.zeros((kc_pad, Mp - M), bool)], axis=1)
    nwords = Mp // WB
    bits = hit.reshape(kc_pad, nwords, WB)
    words = jnp.zeros((kc_pad, nwords), jnp.uint32)
    for k in range(WB):                    # static pack loop, VPU-only
        words = words | (bits[:, :, k].astype(jnp.uint32) << k)
    wpop = jax.lax.population_count(words).astype(jnp.int32)
    B = Mp // BW
    blk_cnt = wpop.reshape(kc_pad, B, BW // WB).sum(axis=2)
    blk_cum = jnp.cumsum(blk_cnt, axis=1)              # [kc_pad, B]
    words_flat = words.reshape(-1)                     # [kc_pad * nwords]

    # tile -> compact-row table via searchsorted on tile_base (monotone,
    # padded rows all point at tile nt_pad so empty tiles resolve to the
    # last real row — their slots find no hit and pack as empty anyway).
    t_row = jnp.searchsorted(tile_base, jnp.arange(nt_pad, dtype=jnp.int32),
                             side="right").astype(jnp.int32) - 1
    t_row = jnp.clip(t_row, 0, kc_pad - 1)
    tile_kept = cids[t_row]
    q = ((jnp.arange(nt_pad, dtype=jnp.int32) - tile_base[t_row])[:, None]
         * tile + jnp.arange(tile, dtype=jnp.int32)[None, :]) + 1
    r2 = t_row[:, None]                                # [nt_pad, 1]
    # level 1: smallest block b with blk_cum[r, b] >= q. A binary search
    # pays log2(B) serial gather rounds; B is small (M/128), so ONE row
    # gather of the tile's cum row + a broadcast compare-count resolves
    # all 128 slots in a single VPU pass (~6x faster at 22k-corr scale).
    cum_rows = blk_cum[t_row]                          # [nt_pad, B]
    if B > 32:
        # Hierarchical compare-count (r5): the flat sweep is
        # O(nt * tile * B) and at KITTI scale (M = 86016 -> B = 672)
        # it dominated the whole 6-D pyramid build (~2 s across the
        # maps, r5_tpu harness). Count SUPER-blocks of SB=8 first
        # (cum at each super-block END, padded with the row total so
        # pad blocks never under-count), then compare only the chosen
        # super-block's SB cums — O(nt * tile * (B/SB + SB)) plus one
        # SB-wide take_along_axis. Exact: every block in an earlier
        # super-block has cum <= its end-cum < q, later ones >= q.
        SB = 8
        Bp = -(-B // SB) * SB
        cum_p = (cum_rows if Bp == B else jnp.concatenate(
            [cum_rows, jnp.broadcast_to(cum_rows[:, -1:],
                                        (nt_pad, Bp - B))], axis=1))
        sup = cum_p.reshape(nt_pad, Bp // SB, SB)[:, :, -1]
        sblk = jnp.sum((sup[:, None, :] < q[:, :, None]).astype(jnp.int32),
                       axis=-1)                        # [nt_pad, tile]
        sblk_c = jnp.minimum(sblk, Bp // SB - 1)
        widx = (sblk_c[:, :, None] * SB
                + jnp.arange(SB, dtype=jnp.int32)[None, None, :])
        win = jnp.take_along_axis(
            cum_p, widx.reshape(nt_pad, tile * SB),
            axis=-1).reshape(nt_pad, tile, SB)
        blk = sblk_c * SB + jnp.sum(
            (win < q[:, :, None]).astype(jnp.int32), axis=-1)
    else:
        blk = jnp.sum(
            (cum_rows[:, None, :] < q[:, :, None]).astype(jnp.int32),
            axis=-1)                                   # [nt_pad, tile]
    empty = blk >= B
    blk = jnp.minimum(blk, B - 1)
    c0 = jnp.where(
        blk > 0,
        jnp.take_along_axis(cum_rows, jnp.maximum(blk - 1, 0), axis=-1),
        0)
    qb = q - c0                                        # rank in block
    # level 2a: pick the word among the block's 4 via popcount prefix
    wbase = r2 * nwords + blk * (BW // WB)
    w0 = words_flat[wbase]
    w1 = words_flat[wbase + 1]
    w2 = words_flat[wbase + 2]
    w3 = words_flat[wbase + 3]
    p0 = jax.lax.population_count(w0).astype(jnp.int32)
    p01 = p0 + jax.lax.population_count(w1).astype(jnp.int32)
    p012 = p01 + jax.lax.population_count(w2).astype(jnp.int32)
    wsel = ((qb > p0).astype(jnp.int32) + (qb > p01)
            + (qb > p012))
    w = jnp.where(wsel == 0, w0,
                  jnp.where(wsel == 1, w1, jnp.where(wsel == 2, w2, w3)))
    qw = qb - jnp.where(wsel == 0, 0,
                        jnp.where(wsel == 1, p0,
                                  jnp.where(wsel == 2, p01, p012)))
    # level 2b: qw-th set bit of w — binary search on masked popcount:
    # smallest y with popcnt(w & ((1<<y)-1)) >= qw; bit position = y-1.
    bit_lo = jnp.zeros_like(qw)
    bit_hi = jnp.full_like(qw, WB)
    ones = jnp.uint32(0xFFFFFFFF)
    for _ in range(6):
        mid = (bit_lo + bit_hi) // 2
        mask = jnp.where(mid >= WB, ones, ~(ones << mid.astype(jnp.uint32)))
        cnt = jax.lax.population_count(w & mask).astype(jnp.int32)
        right = cnt < qw
        bit_lo = jnp.where(right, mid + 1, bit_lo)
        bit_hi = jnp.where(right, bit_hi, mid)
    col = blk * BW + wsel * WB + jnp.clip(bit_lo - 1, 0, WB - 1)
    col = jnp.minimum(col, M - 1)
    in_idx = jnp.where(empty, cap_in, rows[r2, col])   # one big gather
    out_idx = jnp.where(empty, cap_out, col)
    return dense_rows, dense_kept, up_dense, in_idx, out_idx, tile_kept


_compact_map = partial(jax.jit, static_argnames=(
    "kd_pad", "kc_pad", "nt_pad", "tile", "cap_in", "cap_out",
    "with_up"))(_compact_map_body)


@partial(jax.jit, static_argnames=("cfgs",))
def _compact_maps_fused(nbrs, ids_l, sizes_l, base_l, cfgs):
    """All maps' compactions in ONE dispatch.

    A per-map _compact_map dispatch pays the host->relay dispatch latency
    once per map (~8 maps per 6-D pyramid) and forces the device to run
    them as separate executables; fusing them into a single jit removes
    that overhead and lets XLA schedule the whole batch. ``cfgs`` is a
    hashable tuple of per-map static configs (kd_pad, kc_pad, nt_pad,
    tile, cap_in, cap_out, with_up).
    """
    return tuple(
        _compact_map_body(nbrs[i], ids_l[i], sizes_l[i], base_l[i], *cfg)
        for i, cfg in enumerate(cfgs))


def _plan(counts, cap_out: int, tile: int, dense_frac: float):
    """Host-side schedule plan from per-offset hit counts.

    Returns (ids, sizes, base, kd_pad, kc_pad, nt_pad) ready for
    _compact_map_body.
    """
    dense_ids, compact_ids, tiles_per = plan_tiles(counts, int(cap_out),
                                                   tile=tile,
                                                   dense_frac=dense_frac)
    kd, kc, nt = len(dense_ids), len(compact_ids), int(tiles_per.sum())
    # Dense-tier rows are full map width, so padding kd=1 (the usual
    # identity-only case) up to 8 wastes 7 x M gathered rows per conv —
    # bucket from 1 there; tile/offset counts keep the coarser granule.
    kd_pad = _pow2_bucket(kd, lo=1) if kd else 0
    kc_pad = _pow2_bucket(kc) if kc else 0
    nt_pad = _pow2_bucket(nt) if nt else 0
    ids = np.zeros(kd_pad + kc_pad, np.int32)
    ids[:kd] = dense_ids
    ids[kd_pad:kd_pad + kc] = compact_ids
    base = np.full(max(kc_pad, 1), nt_pad, np.int32)
    base[:kc] = np.cumsum(tiles_per) - tiles_per
    return (ids, np.array([kd, kc], np.int32),
            base[:kc_pad] if kc_pad else base[:0], kd_pad, kc_pad, nt_pad)


def _pack_sched(raw, kd_pad: int, nt_pad: int, with_transpose: bool):
    """Assemble the schedule dict(s) from a _compact_map_body result."""
    dense_rows, dense_kept, up_dense, in_idx, out_idx, kept = raw
    groups = ((in_idx, out_idx, kept),) if nt_pad else ()
    sched: Dict = {
        "dense": None if not kd_pad else (dense_rows, dense_kept),
        "groups": groups}
    if not with_transpose:
        return sched
    up: Dict = {
        "dense": None if up_dense is None else (up_dense, dense_kept),
        "groups": tuple((o, i, k) for i, o, k in groups)}
    return sched, up


def build_compact_schedules(jobs, tile: int = TILE):
    """Batched schedule construction: ONE device dispatch for all maps.

    Args:
      jobs: sequence of (nbr [K, M], counts [K], cap_in, cap_out,
        with_transpose, dense_frac) tuples — one per kernel map.

    Returns a list matching ``jobs``: sched, or (sched, up_sched) where
    with_transpose was set. Semantically identical to calling
    build_compact_schedule per job; the only difference is dispatch
    count (tests/test_compact_conv.py pins the equivalence).
    """
    nbrs, ids_l, sizes_l, base_l, cfgs, meta = [], [], [], [], [], []
    for nbr, counts, cap_in, cap_out, with_transpose, dense_frac in jobs:
        ids, sizes, base, kd_pad, kc_pad, nt_pad = _plan(
            counts, int(cap_out), tile, dense_frac)
        nbrs.append(jnp.asarray(nbr))
        ids_l.append(jnp.asarray(ids))
        sizes_l.append(jnp.asarray(sizes))
        base_l.append(jnp.asarray(base))
        cfgs.append((kd_pad, kc_pad, nt_pad, tile, int(cap_in),
                     int(cap_out), bool(with_transpose) and kd_pad > 0))
        meta.append((kd_pad, nt_pad, with_transpose))
    raws = _compact_maps_fused(tuple(nbrs), tuple(ids_l), tuple(sizes_l),
                               tuple(base_l), tuple(cfgs))
    return [_pack_sched(raw, kd_pad, nt_pad, wt)
            for raw, (kd_pad, nt_pad, wt) in zip(raws, meta)]


def build_compact_schedule(nbr, counts: np.ndarray, cap_in: int,
                           cap_out: int, tile: int = TILE,
                           with_transpose: bool = False,
                           dense_frac: float = 0.5):
    """Build the two-tier schedule for one dense map.

    Args:
      nbr: [K, M] device (or host) neighbor table, sentinel = cap_in.
      counts: [K] host per-offset hit counts (sum over valid columns).
      cap_in / cap_out: input and output capacities (sentinel values).
      with_transpose: also return the up-conv schedule derived from
        this one (same pairs, in/out swapped — no extra probing).

    Returns sched — {"dense": (rows [Kd, M], kept [Kd]) | None,
    "groups": ((in_idx [Nt, T], out_idx [Nt, T], kept [Nt]),)} with all
    index arrays on device; kept ids index the FULL offset axis — or
    (sched, up_sched) when with_transpose.
    """
    ids, sizes, base, kd_pad, kc_pad, nt_pad = _plan(
        counts, int(cap_out), tile, dense_frac)
    raw = _compact_map(
        jnp.asarray(nbr), jnp.asarray(ids), jnp.asarray(sizes),
        jnp.asarray(base),
        kd_pad=kd_pad, kc_pad=kc_pad, nt_pad=nt_pad, tile=tile,
        cap_in=int(cap_in), cap_out=int(cap_out),
        with_up=with_transpose and kd_pad > 0)
    return _pack_sched(raw, kd_pad, nt_pad, with_transpose)


def transpose_schedule(sched: Dict, cap_in: int, cap_out: int) -> Dict:
    """Up-conv schedule from a down-conv schedule (same pairs, in/out
    swapped; ME indexes transpose kernels by the forward offset, so kept
    ids carry over — see device_maps.build_pyramid_arrays_device).

    cap_in / cap_out are the UP conv's capacities (coarse in, fine out).
    A dense tier of the forward schedule becomes [Kd, cap_out] rows by
    inversion-scatter (sentinel-heavy rows drop, like the dense up maps).

    Prefer ``build_compact_schedule(..., with_transpose=True)`` — it
    fuses this inversion into the map's single compaction dispatch.
    """
    out: Dict = {"dense": None, "groups": ()}
    if sched["dense"] is not None:
        rows, kept = sched["dense"]                     # [Kd, M_coarse]
        Kd, Mc = rows.shape
        up = jnp.full((Kd, cap_out), cap_in, jnp.int32)
        r = jnp.broadcast_to(
            jnp.arange(Kd, dtype=jnp.int32)[:, None], rows.shape)
        c = jnp.broadcast_to(
            jnp.arange(Mc, dtype=jnp.int32)[None, :], rows.shape)
        up = up.at[r, rows].set(c, mode="drop")
        out["dense"] = (up, kept)
    out["groups"] = tuple(
        (out_idx, in_idx, kept) for in_idx, out_idx, kept in
        sched["groups"])
    return out


def schedule_row_stats(sched: Dict) -> Tuple[int, int]:
    """(dense-tier rows, compact rows) — for logging / cost checks."""
    d = 0
    if sched["dense"] is not None:
        d = int(np.prod(sched["dense"][0].shape))
    c = sum(int(np.prod(g[0].shape)) for g in sched["groups"])
    return d, c
