"""ME-checkpoint conversion: structural match against SparseResUNet2 init."""

import numpy as np
import jax
import jax.numpy as jnp

from gmf_tpu.sparse.kernel_map import build_pyramid, hypercube_offsets
from gmf_tpu.sparse.resunet import SparseResUNet2, pyramid_to_arrays
from gmf_tpu.utils.convert_minkowski import (
    convert_sparse_resunet, me_offset_permutation,
)


def test_offset_permutation_is_bijection():
    for k, d in ((3, 3), (3, 6), (7, 3)):
        perm = me_offset_permutation(k, d)
        assert sorted(perm) == list(range(k ** d))
    # last-fastest convention must be the identity against our own order
    perm_last = me_offset_permutation(3, 3, me_fastest="last")
    np.testing.assert_array_equal(perm_last, np.arange(27))


def synthesize_me_state_dict(channels, tr_channels, dim, conv1_k, in_ch,
                             out_ch):
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, i, o, k):
        sd[f"{name}.kernel"] = rng.randn(k ** dim, i, o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.bn.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(c, np.float32)

    C, TR = channels, tr_channels
    conv("conv1", in_ch, C[0], conv1_k)
    bn("norm1", C[0])
    for blk, c in (("block1", C[0]), ("block2", C[1]), ("block3", C[2]),
                   ("block4", C[3]), ("block4_tr", TR[3]),
                   ("block3_tr", TR[2]), ("block2_tr", TR[1])):
        conv(f"{blk}.conv1", c, c, 3)
        bn(f"{blk}.norm1", c)
        conv(f"{blk}.conv2", c, c, 3)
        bn(f"{blk}.norm2", c)
    conv("conv2", C[0], C[1], 3); bn("norm2", C[1])
    conv("conv3", C[1], C[2], 3); bn("norm3", C[2])
    conv("conv4", C[2], C[3], 3); bn("norm4", C[3])
    conv("conv4_tr", C[3], TR[3], 3); bn("norm4_tr", TR[3])
    conv("conv3_tr", C[2] + TR[3], TR[2], 3); bn("norm3_tr", TR[2])
    conv("conv2_tr", C[1] + TR[2], TR[1], 3); bn("norm2_tr", TR[1])
    sd["conv1_tr.kernel"] = rng.randn(C[0] + TR[1], TR[0]).astype(np.float32)
    sd["final.kernel"] = rng.randn(TR[0], out_ch).astype(np.float32)
    sd["final.bias"] = rng.randn(out_ch).astype(np.float32)
    return sd


def test_fcgf_tree_structure_and_forward(rng):
    channels, tr = (4, 8, 16, 32), (8, 8, 8, 16)
    model = SparseResUNet2(in_channels=1, out_channels=8, dim=3,
                           conv1_kernel_size=3, normalize_feature=True,
                           channels=channels, tr_channels=tr)
    coords = np.unique(rng.randint(0, 10, (80, 3)).astype(np.int32), axis=0)
    pyr = build_pyramid(coords, 4, conv1_kernel_size=3, granule=128)
    arrays = pyramid_to_arrays(pyr)
    feats = jnp.ones((pyr.levels[0].cap, 1))
    ref_vars = model.init(jax.random.PRNGKey(0), feats, arrays)

    sd = synthesize_me_state_dict(channels, tr, 3, 3, 1, 8)
    conv = convert_sparse_resunet(sd, dim=3, conv1_kernel_size=3)

    # same tree structure + shapes
    ref_flat = {"/".join(str(x) for x in k): v.shape for k, v in
                jax.tree_util.tree_flatten_with_path(ref_vars["params"])[0]}
    got_flat = {"/".join(str(x) for x in k): np.asarray(v).shape for k, v in
                jax.tree_util.tree_flatten_with_path(conv["params"])[0]}
    assert set(ref_flat) == set(got_flat), (
        set(ref_flat) ^ set(got_flat))
    for k in ref_flat:
        assert ref_flat[k] == got_flat[k], (k, ref_flat[k], got_flat[k])

    # converted weights actually run
    variables = jax.tree.map(jnp.asarray, conv)
    out = model.apply(variables, feats, arrays)
    assert np.all(np.isfinite(np.asarray(out)))
