"""12-column per-pair evaluation engine with scene/pair aggregation.

Parity: GMF_PointDSC/evaluation/test_3DMatch.py:24-194 — per-pair stats
row layout (column indices identical to the reference):

  0 success   1 RE(deg)   2 TE(cm)   3 input inlier #   4 input inlier ratio
  5 output inlier #   6 precision   7 recall   8 F1
  9 model_time(s)  10 data_time(s)  11 scene_index

Aggregation matches the reference exactly: scene-level means with RE/TE
averaged over *successful* pairs only; then scene-average and all-pair
rollups (ref :156-194).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterable, List

import numpy as np

STAT_COLUMNS = [
    "success", "re_deg", "te_cm", "input_inlier_num", "input_inlier_ratio",
    "output_inlier_num", "precision", "recall", "f1", "model_time",
    "data_time", "scene_index",
]


@dataclasses.dataclass
class PairStats:
    """One evaluation row; ``to_row`` yields the reference's 12-col array."""

    success: bool
    re_deg: float
    te_cm: float
    input_inlier_num: int
    input_inlier_ratio: float
    output_inlier_num: int
    precision: float
    recall: float
    f1: float
    model_time: float
    data_time: float
    scene_index: int

    def to_row(self) -> np.ndarray:
        return np.array([
            float(self.success), self.re_deg, self.te_cm,
            self.input_inlier_num, self.input_inlier_ratio,
            self.output_inlier_num, self.precision, self.recall, self.f1,
            self.model_time, self.data_time, self.scene_index,
        ])


def compute_pair_stats(pred_trans, gt_trans, src_keypts, tgt_keypts,
                       pred_labels, gt_labels, re_thresh: float,
                       te_thresh_cm: float, model_time: float = 0.0,
                       data_time: float = 0.0, scene_index: int = 0,
                       mask=None) -> PairStats:
    """Stats for one pair from NumPy arrays (unbatched or [1, ...])."""
    def squeeze(x):
        x = np.asarray(x)
        return x[0] if x.ndim and x.shape[0] == 1 and x.ndim > 1 else x

    T, Tg = np.asarray(pred_trans).reshape(4, 4), np.asarray(gt_trans).reshape(4, 4)
    src = squeeze(src_keypts).reshape(-1, 3)
    pred = np.asarray(pred_labels).reshape(-1)
    gt = np.asarray(gt_labels).reshape(-1)
    if mask is not None:
        m = np.asarray(mask).reshape(-1) > 0
        src, pred, gt = src[m], pred[m], gt[m]

    tr = float(np.trace(T[:3, :3].T @ Tg[:3, :3]))
    re = float(np.degrees(np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))))
    te = float(np.linalg.norm(T[:3, 3] - Tg[:3, 3]) * 100.0)
    success = (re < re_thresh) and (te < te_thresh_cm)

    pred_bin = pred > 0
    tp = float(np.sum(pred_bin * gt))
    precision = tp / max(np.sum(pred_bin), 1e-8)
    recall = tp / max(np.sum(gt), 1e-8)
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)

    return PairStats(
        success=success, re_deg=re, te_cm=te,
        input_inlier_num=int(np.sum(gt)),
        input_inlier_ratio=float(np.mean(gt)) if gt.size else 0.0,
        output_inlier_num=int(np.sum(gt[pred_bin])),
        precision=precision, recall=recall, f1=f1,
        model_time=model_time, data_time=data_time,
        scene_index=scene_index,
    )


def _iter_with_data_time(pairs: Iterable[Dict], workers: int = 0,
                         depth: int = 4):
    """Yield ``(pair, data_time_s)``.

    ``workers == 0``: plain serial iteration; data_time is the gap since
    the previous yield (the reference's data-timer semantics,
    evaluation/test_3DMatch.py:31-36).

    ``workers > 0`` and ``pairs`` indexable (a dataset): ``workers``
    threads prefetch ``pairs[i]`` concurrently with bounded lookahead —
    the TPU answer to the reference's 16-worker torch DataLoader
    (evaluation/test_3DMatch.py:247-252). Host data prep (npz IO, image
    decode, host matching) overlaps device dispatch; results come back
    in input order. data_time is each item's actual prep duration
    measured inside its worker (wall overlap makes gap-timing
    meaningless here). NumPy IO/BLAS release the GIL, so threads scale
    on multi-core eval hosts.
    """
    import time

    if workers and hasattr(pairs, "__len__") and hasattr(pairs, "__getitem__"):
        import collections
        from concurrent.futures import ThreadPoolExecutor

        n = len(pairs)

        def fetch(i):
            t0 = time.perf_counter()
            p = pairs[i]
            return p, time.perf_counter() - t0

        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = collections.deque()
            lookahead = min(workers + depth, n)
            for i in range(lookahead):
                futs.append(ex.submit(fetch, i))
            nxt = lookahead
            while futs:
                pair, dt = futs.popleft().result()
                if nxt < n:
                    futs.append(ex.submit(fetch, nxt))
                    nxt += 1
                yield pair, dt
        return

    t_last = time.perf_counter()
    for pair in pairs:
        yield pair, time.perf_counter() - t_last
        t_last = time.perf_counter()


def evaluate_pairs(register_fn: Callable, pairs: Iterable[Dict],
                   re_thresh: float = 15.0, te_thresh_cm: float = 30.0,
                   scene_index: int = 0, batch_size: int = 1,
                   workers: int = 0, inflight: int = 1) -> np.ndarray:
    """Run ``register_fn(pair) -> (pred_trans, pred_labels)`` over pairs.

    Each pair dict needs src_keypts, tgt_keypts, gt_trans, labels (and
    whatever register_fn consumes). Returns the [num_pairs, 12] stats array.

    With ``batch_size > 1`` and a register_fn exposing ``register_batch``
    (make_register_fn over a PointDSCRegistrar), pairs are collected into
    same-bucket groups and registered as ONE batched — optionally
    mesh-sharded — dispatch per group; rows come back in input order with
    model_time amortized over the batch. This is the measured batched/DP
    throughput path; the reference's loop is strictly one pair per
    forward (evaluation/test_3DMatch.py:24-119).

    ``workers > 0`` prefetches pairs with a thread pool when ``pairs``
    is an indexable dataset (see ``_iter_with_data_time``).

    ``inflight > 1`` keeps up to that many batched dispatches in flight
    (registrar ``dispatch_batch``/``fetch_batch`` split): the device
    computes batch k+1 while the host fetches and scores batch k. Every
    result is still fetched and scored — only idle relay/stats gaps are
    hidden. model_time then reports each batch's host-blocking time
    (dispatch + fetch wait) per pair, so summed model_time stays a
    faithful lower bound of device-side wall time.
    """
    import time

    if batch_size > 1 and hasattr(register_fn, "register_batch"):
        return _evaluate_pairs_batched(register_fn, pairs, re_thresh,
                                       te_thresh_cm, scene_index,
                                       batch_size, workers, inflight)
    if inflight > 1:
        import warnings

        warnings.warn(
            f"inflight={inflight} has no effect without batch_size > 1 "
            "and a batch-capable register_fn — running the serial path",
            stacklevel=2)

    rows: List[np.ndarray] = []
    for pair, data_time in _iter_with_data_time(pairs, workers):
        t0 = time.perf_counter()
        pred_trans, pred_labels = register_fn(pair)
        pred_trans = np.asarray(pred_trans)
        model_time = time.perf_counter() - t0
        stats = compute_pair_stats(
            pred_trans, pair["gt_trans"], pair["src_keypts"],
            pair["tgt_keypts"], np.asarray(pred_labels), pair["labels"],
            re_thresh, te_thresh_cm, model_time, data_time, scene_index,
            mask=pair.get("corr_mask"),
        )
        rows.append(stats.to_row())
    return np.stack(rows) if rows else np.zeros((0, 12))


def _evaluate_pairs_batched(register_fn: Callable, pairs: Iterable[Dict],
                            re_thresh: float, te_thresh_cm: float,
                            scene_index: int, batch_size: int,
                            workers: int = 0, inflight: int = 1) -> np.ndarray:
    """Bucket-grouped batched evaluation (one dispatch per group); with
    ``inflight > 1`` and a registrar exposing dispatch_batch/fetch_batch,
    up to that many dispatches stay in flight."""
    import collections
    import time

    rows: Dict[int, np.ndarray] = {}
    groups: Dict[int, List] = {}  # bucket -> [(orig_idx, pair, data_time)]
    eval_bucket = getattr(register_fn, "eval_bucket",
                          lambda ps: ps[0]["corr_pos"].shape[0])
    can_pipeline = (inflight > 1 and hasattr(register_fn, "dispatch_batch")
                    and hasattr(register_fn, "fetch_batch"))
    pending = collections.deque()  # (group, handle, dispatch_secs)

    def score(group, results, model_time):
        for (i, pair, dt), (trans, labels) in zip(group, results):
            stats = compute_pair_stats(
                np.asarray(trans), pair["gt_trans"], pair["src_keypts"],
                pair["tgt_keypts"], np.asarray(labels), pair["labels"],
                re_thresh, te_thresh_cm, model_time, dt, scene_index,
                mask=pair.get("corr_mask"))
            rows[i] = stats.to_row()

    def drain_one():
        group, handle, disp_s = pending.popleft()
        t0 = time.perf_counter()
        results = register_fn.fetch_batch(handle)
        # host-blocking time only: dispatch + fetch wait (overlapped
        # device compute is deliberately NOT double-counted)
        score(group, results, (disp_s + time.perf_counter() - t0)
              / len(group))

    def flush(bucket: int):
        group = groups.pop(bucket, [])
        if not group:
            return
        t0 = time.perf_counter()
        if can_pipeline:
            handle = register_fn.dispatch_batch([p for _, p, _ in group])
            pending.append((group, handle, time.perf_counter() - t0))
            if len(pending) >= inflight:
                drain_one()
        else:
            results = register_fn.register_batch([p for _, p, _ in group])
            score(group, results, (time.perf_counter() - t0) / len(group))

    count = 0
    for pair, data_time in _iter_with_data_time(pairs, workers):
        b = eval_bucket([pair])
        groups.setdefault(b, []).append((count, pair, data_time))
        count += 1
        if len(groups[b]) >= batch_size:
            flush(b)
    for b in list(groups):
        flush(b)
    while pending:
        drain_one()
    return (np.stack([rows[i] for i in range(count)]) if count
            else np.zeros((0, 12)))


def aggregate_scenes(all_stats: Dict[str, np.ndarray]) -> Dict:
    """Scene-level and pair-level rollups (ref :156-194).

    RE/TE averages use successful pairs only, as in the reference.
    """
    scene_vals = []
    per_scene = {}
    for scene, stats in all_stats.items():
        if stats.shape[0] == 0:
            continue
        vals = stats.mean(0)
        ok = stats[stats[:, 0] == 1]
        if ok.shape[0]:
            vals[1], vals[2] = ok[:, 1].mean(), ok[:, 2].mean()
        scene_vals.append(vals)
        per_scene[scene] = vals
    scene_avg = np.mean(scene_vals, axis=0) if scene_vals else np.zeros(12)

    allpair = np.concatenate(list(all_stats.values()), axis=0)
    pair_avg = allpair.mean(0) if allpair.shape[0] else np.zeros(12)
    ok = allpair[allpair[:, 0] == 1]
    re_ok = ok[:, 1].mean() if ok.shape[0] else float("nan")
    te_ok = ok[:, 2].mean() if ok.shape[0] else float("nan")

    return {
        "per_scene": per_scene,
        "scene_avg": scene_avg,
        "pair_avg": pair_avg,
        "recall_pct": pair_avg[0] * 100.0,
        "re_deg": re_ok,
        "te_cm": te_ok,
        "num_pairs": int(allpair.shape[0]),
        "all_stats": allpair,
    }


def format_report(agg: Dict) -> str:
    """Render the reference's log lines (ref :185-191)."""
    a = agg["pair_avg"]
    lines = [
        f"All {agg['num_pairs']} pairs, Mean Reg Recall={agg['recall_pct']:.2f}%, "
        f"Mean Re={agg['re_deg']:.2f}, Mean Te={agg['te_cm']:.2f}",
        f"\tInput:  Mean Inlier Num={a[3]:.2f}(ratio={a[4] * 100:.2f}%)",
        f"\tOutput: Mean Inlier Num={a[5]:.2f}(precision={a[6] * 100:.2f}%, "
        f"recall={a[7] * 100:.2f}%, f1={a[8] * 100:.2f}%)",
        f"\tMean model time: {a[9]:.2f}s, Mean data time: {a[10]:.2f}s",
    ]
    return "\n".join(lines)
