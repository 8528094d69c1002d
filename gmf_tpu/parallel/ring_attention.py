"""Ring (sequence-parallel) compat-modulated attention over the mesh.

SURVEY.md §2.6 stretch goal: for ``num_node='all'`` megapairs whose [N, N]
attention exceeds one chip's HBM, shard the correspondence tokens over the
'data' mesh axis and rotate K/V/keypoint shards around the ring with
``ppermute`` while accumulating online-softmax statistics — the classic
ring-attention pattern, specialized to PointDSC's compatibility-modulated
logits (compat rebuilt per block from keypoints, like the Pallas kernel).

Pure jnp inside shard_map — XLA lowers the ppermute to ICI RDMA on TPU and
the same code runs on the virtual CPU mesh for testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def _block_logits(q, k, sq, sk, tq, tk, mask_k, sigma_sq, scale):
    qk = jnp.einsum("id,jd->ij", q, k,
                    precision=jax.lax.Precision.DEFAULT) * scale
    ds = jnp.sqrt(jnp.maximum(
        jnp.sum(sq * sq, 1)[:, None] + jnp.sum(sk * sk, 1)[None, :]
        - 2.0 * (sq @ sk.T), 0.0))
    dt = jnp.sqrt(jnp.maximum(
        jnp.sum(tq * tq, 1)[:, None] + jnp.sum(tk * tk, 1)[None, :]
        - 2.0 * (tq @ tk.T), 0.0))
    compat = jnp.maximum(1.0 - (ds - dt) ** 2 / sigma_sq, 0.0)
    s = compat * qk
    return jnp.where(mask_k[None, :] > 0, s, NEG_INF)


def ring_compat_attention(q, k, v, src_keypts, tgt_keypts, mask, mesh: Mesh,
                          axis: str = "data", sigma_d: float = 0.10):
    """Sequence-parallel compat attention.

    Args:
      q, k, v: [N, D] with N divisible by the mesh axis size.
      src_keypts, tgt_keypts: [N, 3]; mask: [N].
      mesh: the device mesh; tokens shard over ``axis``.

    Returns [N, D], numerically equal to the single-device attention.
    """
    n_dev = mesh.shape[axis]
    sigma_sq = float(sigma_d) ** 2
    scale = 1.0 / (q.shape[-1] ** 0.5)

    def local(q, k, v, s, t, m):
        # all inputs are the local shard [n_loc, ...]
        # derive the accumulators from q so shard_map tags them as varying
        # over the mesh axis (plain zeros would be unvarying constants and
        # the fori_loop carry types would mismatch)
        m_i = q[:, :1] * 0.0 - jnp.inf
        l_i = q[:, :1] * 0.0
        acc = q * 0.0
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def step(i, carry):
            m_i, l_i, acc, kc, vc, sc, tc, mc = carry
            s_blk = _block_logits(q, kc, s, sc, t, tc, mc, sigma_sq, scale)
            m_curr = jnp.max(s_blk, axis=1, keepdims=True)
            m_next = jnp.maximum(m_i, m_curr)
            alpha = jnp.exp(m_i - m_next)
            p = jnp.exp(s_blk - m_next)
            l_next = alpha * l_i + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + p @ vc
            # rotate the K/V/coord shards one hop around the ring
            kc, vc, sc, tc, mc = [
                jax.lax.ppermute(x, axis, perm) for x in (kc, vc, sc, tc, mc)
            ]
            return m_next, l_next, acc, kc, vc, sc, tc, mc

        m_i, l_i, acc, *_ = jax.lax.fori_loop(
            0, n_dev, step, (m_i, l_i, acc, k, v, s, t, m))
        return acc / jnp.maximum(l_i, 1e-30)

    spec = P(axis)
    shard = partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=spec)
    return shard(local)(q, k, v, src_keypts, tgt_keypts, mask)
