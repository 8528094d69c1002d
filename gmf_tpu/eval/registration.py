"""PointDSC registration engine for evaluation: bucketed jitted inference.

Wraps a PointDSC model + variables into a ``register(sample) -> (trans,
labels)`` callable for the eval harness. Samples are padded to static
bucket sizes (collate.BUCKETS) so XLA compiles once per bucket — the TPU
answer to the reference's per-pair dynamic shapes
(evaluation/test_3DMatch.py:24-119).

Batched + data-parallel path: ``register_batch`` stacks several pairs
into one [B, N, ...] dispatch, optionally sharded over the 'data' axis of
a jax.sharding.Mesh — each device registers B/n_data pairs and XLA
gathers the [B, 4, 4] transforms. This is the measured multi-chip
pairs/sec lever (SURVEY.md §2.6): the reference evaluates strictly one
pair per forward (evaluation/test_3DMatch.py:24-119), the TPU path
amortizes dispatch and scales over ICI with zero model changes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.data.collate import BUCKETS, next_bucket, pad_to_bucket


class DeviceFragmentCache:
    """Device-resident fragment arrays for the raw-descriptor eval path.

    On this class of deployment the host→device link is the eval
    bottleneck, not compute: each raw-path pair ships two descriptor
    stacks plus two images (~2 MB/pair at 5k points), and in the real
    3DMatch/LoMatch benchmarks every fragment participates in many pairs
    (redkitchen: 60 fragments, 506 pairs — ~17 pairs per fragment). The
    reference's eval loop re-reads and re-ships both fragments for every
    pair (evaluation/test_3DMatch.py:24-119, via ThreeDMatch.py:163-217);
    here each fragment's padded (keypts, desc, mask) and image are
    ``jax.device_put`` ONCE and batches are assembled by stacking cached
    device arrays, so steady-state H2D is just the [4,4] GT transforms.

    Keys are (fragment_id, bucket) — the same fragment padded to two
    different buckets is two entries (cheap; LRU evicts). Eviction is
    least-recently-used by total byte budget. Thread-safe.
    """

    def __init__(self, max_bytes: int = 4 << 30):
        from gmf_tpu.utils.lru import ByteLRU

        self._lru = ByteLRU(max_bytes)

    def get(self, key, build):
        """Return the cached device pytree for ``key``, building (and
        device_put-ing) it from ``build() -> host pytree`` on miss."""
        def build_entry():
            host = build()
            nbytes = sum(np.asarray(x).nbytes
                         for x in jax.tree_util.tree_leaves(host))
            return jax.device_put(host), nbytes

        return self._lru.get(key, build_entry)

    @property
    def hits(self):
        return self._lru.hits

    @property
    def misses(self):
        return self._lru.misses

    def __len__(self):
        return len(self._lru)


class PointDSCRegistrar:
    """Jitted per-bucket PointDSC inference.

    Args:
      model, variables: the flax module + params/batch_stats.
      buckets: static correspondence-count buckets.
      mesh: optional ('data', 'model') Mesh. When given, batched calls
        shard the pair batch over the data axis (params replicated);
        single-pair calls stay unsharded.
    """

    def __init__(self, model, variables, buckets: Sequence[int] = BUCKETS,
                 mesh=None, match_inlier_threshold: float = 0.10,
                 match_mutual: bool = True, match_in_dim: int = 6,
                 frag_cache: Optional[DeviceFragmentCache] = None):
        if mesh is not None and getattr(model, "compat_cache_shards", 0) == 1:
            # the compat-cache "auto" gate sizes the PER-CHIP footprint;
            # a mesh-sharded apply traces at the global batch, so tell
            # the model how many data shards the batch splits over
            model = model.clone(compat_cache_shards=mesh.shape["data"])
        self.model = model
        self.variables = variables
        self.buckets = buckets
        self.mesh = mesh
        self.frag_cache = frag_cache

        def _register(variables, corr_pos, src, tgt, p_img, q_img, mask):
            out = model.apply(variables, corr_pos, src, tgt, p_img, q_img,
                              testing=True, corr_mask=mask)
            return out["final_trans"], out["final_labels"]

        self._register = jax.jit(_register)

        # raw-descriptor path: mutual 1-NN matching + labels + corr_pos
        # encoding run ON DEVICE inside the same dispatch (the reference
        # loaders pay this on the host per pair, ThreeDMatch.py:163-217)
        from gmf_tpu.data.correspondence import match_descriptors_device

        def _register_raw(variables, src_k, tgt_k, src_d, tgt_d, gt,
                          p_img, q_img, mask_s, mask_t):
            m = jax.vmap(
                lambda a, b, c, d, g, ms, mt: match_descriptors_device(
                    a, b, c, d, g, match_inlier_threshold, ms, mt,
                    use_mutual=match_mutual, in_dim=match_in_dim)
            )(src_k, tgt_k, src_d, tgt_d, gt, mask_s, mask_t)
            out = model.apply(variables, m["corr_pos"], m["src_keypts"],
                              m["tgt_keypts"], p_img, q_img, testing=True,
                              corr_mask=m["corr_mask"])
            # compact fetch: labels/corr_mask as bool and the int32 match
            # indices — the host reconstructs the matched coordinate rows
            # from its own copies (D2H drops ~11 MB -> ~3 MB per b=64
            # batch on this box's 34 MB/s tunnel)
            return (out["final_trans"], out["final_labels"],
                    m["labels"] > 0, m["corr_mask"] > 0, m["src_idx"])

        self._register_raw_impl = _register_raw
        self._register_raw = jax.jit(_register_raw)

        # fragment-cache batch assembly: ALL the stacking happens inside
        # ONE jitted call — eager per-op dispatch through a TPU relay
        # costs ~130 ms per multi-operand op regardless of size, so eight
        # eager jnp.stack calls would cost more than the transfers the
        # cache saves (measured: 8 eager stacks ~1 s/batch vs 35 ms for
        # this single 512-arg dispatch at b=64)
        def _assemble(src_es, tgt_es):
            def stk(es, k):
                return jnp.stack([e[k] for e in es])
            return (stk(src_es, "keypts"), stk(tgt_es, "keypts"),
                    stk(src_es, "desc"), stk(tgt_es, "desc"),
                    stk(src_es, "image"), stk(tgt_es, "image"),
                    stk(src_es, "mask"), stk(tgt_es, "mask"))

        self._assemble_frags = jax.jit(_assemble)
        self._register_raw_sharded = None  # built on first sharded raw call
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            bat = NamedSharding(mesh, P("data"))
            self._n_data = mesh.shape["data"]
            # params replicated, every batch-leading array sharded on
            # 'data'; outputs gathered back sharded (host fetch assembles)
            self._register_sharded = jax.jit(
                _register,
                in_shardings=(repl, bat, bat, bat, bat, bat, bat),
                out_shardings=(bat, bat))
            self._variables_repl = jax.device_put(variables, repl)
        else:
            self._n_data = 1
            self._register_sharded = None
            self._variables_repl = None

    # -- single pair ---------------------------------------------------------

    def _pad_one(self, sample: Dict[str, np.ndarray], bucket: int = None):
        n = sample["corr_pos"].shape[0]
        buckets = list(self.buckets)
        if n > max(buckets):
            # never subsample at eval time — open a new bucket instead
            buckets.append(-(-n // 4096) * 4096)
        if bucket is not None:
            buckets = [bucket]
        return pad_to_bucket(
            {k: sample[k] for k in
             ("corr_pos", "src_keypts", "tgt_keypts", "labels")},
            buckets)

    def __call__(self, sample: Dict[str, np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        if "corr_pos" not in sample:
            (trans, labels), = self.register_batch([sample])
            return trans, labels
        n = sample["corr_pos"].shape[0]
        padded = self._pad_one(sample)
        trans, labels = self._register(
            self.variables,
            jnp.asarray(padded["corr_pos"])[None],
            jnp.asarray(padded["src_keypts"])[None],
            jnp.asarray(padded["tgt_keypts"])[None],
            jnp.asarray(sample["p_image"])[None],
            jnp.asarray(sample["q_image"])[None],
            jnp.asarray(padded["corr_mask"])[None],
        )
        m = min(n, padded["corr_pos"].shape[0])
        return np.asarray(trans)[0], np.asarray(labels)[0][:m]

    # -- batched / data-parallel ---------------------------------------------

    def _bucket_for(self, n: int) -> int:
        buckets = list(self.buckets)
        if n > max(buckets):
            buckets.append(-(-n // 4096) * 4096)
        return next_bucket(n, buckets)

    def eval_bucket(self, samples: Sequence[Dict[str, np.ndarray]]):
        """The shared bucket a group of samples would batch into.

        Raw-descriptor samples (no precomputed 'corr_pos') bucket on
        both cloud sizes — one compile per (src, tgt) bucket pair."""
        if "corr_pos" in samples[0]:
            return self._bucket_for(
                max(s["corr_pos"].shape[0] for s in samples))
        return (self._bucket_for(
                    max(s["src_keypts"].shape[0] for s in samples)),
                self._bucket_for(
                    max(s["tgt_keypts"].shape[0] for s in samples)))

    def register_batch(self, samples: Sequence[Dict[str, np.ndarray]]
                       ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Register many pairs in ONE dispatch (mesh-sharded when built
        with a mesh).

        All samples are padded to one shared bucket; the batch dim is
        padded up to a multiple of the mesh's data-axis size with copies
        of sample 0 (each batch row is independent in eval mode, so dummy
        rows cannot change real rows). Returns per-sample (trans [4,4],
        labels [n_i]) in input order.
        """
        return self.fetch_batch(self.dispatch_batch(samples))

    def dispatch_batch(self, samples: Sequence[Dict[str, np.ndarray]]):
        """Start one batched dispatch WITHOUT syncing on the result.

        Returns an opaque handle for ``fetch_batch``. JAX dispatch is
        async: issuing batch k+1 before fetching batch k keeps the
        device busy across the host's fetch/stats gap (this machine's
        TPU relay adds ~50 ms per sync) — the harness's pipeline depth
        rides on this split.
        """
        if not samples:
            return ("empty",)
        if "corr_pos" not in samples[0]:
            return self._dispatch_batch_raw(samples)
        bucket = self.eval_bucket(samples)
        padded = [self._pad_one(s, bucket=bucket) for s in samples]
        b_real = len(samples)
        b = -(-b_real // self._n_data) * self._n_data
        idx = list(range(b_real)) + [0] * (b - b_real)

        def stack(key, source):
            return jnp.asarray(np.stack([source[i][key] for i in idx]))

        args = (
            stack("corr_pos", padded), stack("src_keypts", padded),
            stack("tgt_keypts", padded),
            jnp.asarray(np.stack([samples[i]["p_image"] for i in idx])),
            jnp.asarray(np.stack([samples[i]["q_image"] for i in idx])),
            stack("corr_mask", padded),
        )
        if self._register_sharded is not None:
            trans, labels = self._register_sharded(self._variables_repl,
                                                   *args)
        else:
            trans, labels = self._register(self.variables, *args)
        return ("corr", samples, bucket, trans, labels)

    def fetch_batch(self, handle) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Sync on a ``dispatch_batch`` handle and unpack per-sample
        results (the raw path also writes matched rows back into the
        sample dicts here, so stats post-steps see host-path samples)."""
        kind = handle[0]
        if kind == "empty":
            return []
        if kind == "raw":
            return self._fetch_batch_raw(handle)
        _, samples, bucket, trans, labels = handle
        trans, labels = jax.device_get((trans, labels))
        out = []
        for i, s in enumerate(samples):
            n = min(s["corr_pos"].shape[0], bucket)
            out.append((np.asarray(trans[i]), np.asarray(labels[i])[:n]))
        return out

    def _dispatch_batch_raw(self, samples: Sequence[Dict[str, np.ndarray]]):
        """Batched registration from RAW per-cloud descriptors: mutual
        1-NN matching, GT labels, and corr_pos encoding all happen inside
        the (optionally mesh-sharded) device dispatch. The matching
        fetch side (``_fetch_batch_raw``) writes the compacted matched
        rows back into each sample dict (src_keypts/tgt_keypts/labels),
        so downstream solver post-steps and stats see exactly what the
        host-matching path would produce.
        """
        bs, bt = self.eval_bucket(samples)
        b_real = len(samples)
        b = -(-b_real // self._n_data) * self._n_data
        idx = list(range(b_real)) + [0] * (b - b_real)

        def pad_rows(x, bucket):
            x = np.asarray(x, np.float32)
            out = np.zeros((bucket,) + x.shape[1:], np.float32)
            out[: len(x)] = x
            return out

        cache = self.frag_cache
        if cache is not None and all(
                "src_key" in s and "tgt_key" in s for s in samples):
            # fragment-cached assembly: each fragment's padded arrays and
            # image cross the host→device link once; batches are stacks
            # of device-resident arrays (H2D per batch = gt_trans only)
            def side_entry(i, prefix, bucket):
                s = samples[i]

                def build(s=s, prefix=prefix, bucket=bucket):
                    k = np.asarray(s[prefix + "_keypts"], np.float32)
                    return {
                        "keypts": pad_rows(k, bucket),
                        "desc": pad_rows(s[prefix + "_desc"], bucket),
                        "mask": (np.arange(bucket) < len(k)
                                 ).astype(np.float32),
                        "image": np.asarray(
                            s["p_image" if prefix == "src" else "q_image"],
                            np.float32),
                    }
                return cache.get((s[prefix + "_key"], bucket), build)

            es = [side_entry(i, "src", bs) for i in idx]
            et = [side_entry(i, "tgt", bt) for i in idx]
            sk, tk, sd, td, pi, qi, ms, mt = self._assemble_frags(es, et)
            gt = jnp.asarray(np.stack(
                [np.asarray(samples[i]["gt_trans"], np.float32)
                 for i in idx]))
            args = (sk, tk, sd, td, gt, pi, qi, ms, mt)
        else:
            def stack_side(key, bucket):
                return jnp.asarray(np.stack(
                    [pad_rows(samples[i][key], bucket) for i in idx]))

            mask_s = np.zeros((b, bs), np.float32)
            mask_t = np.zeros((b, bt), np.float32)
            for row, i in enumerate(idx):
                mask_s[row, : samples[i]["src_keypts"].shape[0]] = 1.0
                mask_t[row, : samples[i]["tgt_keypts"].shape[0]] = 1.0
            args = (
                stack_side("src_keypts", bs), stack_side("tgt_keypts", bt),
                stack_side("src_desc", bs), stack_side("tgt_desc", bt),
                jnp.asarray(np.stack(
                    [np.asarray(samples[i]["gt_trans"], np.float32)
                     for i in idx])),
                jnp.asarray(np.stack([samples[i]["p_image"] for i in idx])),
                jnp.asarray(np.stack([samples[i]["q_image"] for i in idx])),
                jnp.asarray(mask_s), jnp.asarray(mask_t),
            )
        if self.mesh is not None:
            res = self._get_raw_sharded()(self._variables_repl, *args)
        else:
            res = self._register_raw(self.variables, *args)
        return ("raw", samples, res)

    def _fetch_batch_raw(self, handle) -> List[Tuple[np.ndarray, np.ndarray]]:
        _, samples, res = handle
        trans, pred, gt_labels, cmask, src_idx = jax.device_get(res)
        out = []
        for row, s in enumerate(samples):
            valid = np.asarray(cmask[row])          # [bucket] bool
            idx = np.asarray(src_idx[row])
            src_k = np.asarray(s["src_keypts"], np.float32)
            tgt_k = np.asarray(s["tgt_keypts"], np.float32)
            vn = valid[: len(src_k)]
            # reconstruct the matched rows from the host copies — the
            # device computed src_sel = src * mask and tgt_sel =
            # tgt[src_idx] * mask from bit-identical padded copies, so
            # indexing here reproduces them exactly without the D2H
            s["src_keypts"] = src_k[vn]
            s["tgt_keypts"] = tgt_k[idx[: len(src_k)][vn]]
            s["labels"] = np.asarray(
                gt_labels[row])[: len(src_k)][vn].astype(np.float32)
            s.pop("corr_mask", None)
            # the sample now holds COMPACTED rows — drop the fragment
            # keys so a (contract-violating) re-dispatch of this dict
            # rebuilds from the current arrays instead of hitting the
            # cache with stale full-fragment entries
            s.pop("src_key", None)
            s.pop("tgt_key", None)
            out.append((np.asarray(trans[row]),
                        np.asarray(pred[row])[valid]))
        return out

    def _get_raw_sharded(self):
        if self._register_raw_sharded is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            bat = NamedSharding(self.mesh, P("data"))
            self._register_raw_sharded = jax.jit(
                self._register_raw_impl,
                in_shardings=(repl,) + (bat,) * 9,
                out_shardings=(bat,) * 5)
        return self._register_raw_sharded
