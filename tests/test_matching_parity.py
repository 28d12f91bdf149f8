"""Differential + property tests: Sinkhorn matching, filters, match extraction."""

import numpy as np
import pytest

from conftest import requires_reference

import jax
import jax.numpy as jnp

from onnx_image_processing_tpu.ops import (
    sinkhorn_match,
    sinkhorn_match_with_scores,
    sinkhorn_match_with_filters,
    extract_mutual_matches,
    probability_ratio_filter,
    dustbin_margin_filter,
)


@pytest.fixture(scope="module")
def descs(rng=None):
    r = np.random.default_rng(7)
    d1 = r.normal(size=(2, 40, 64)).astype(np.float32)
    # d2: permuted noisy copy of d1 plus extras -> plausible matching structure
    perm = r.permutation(40)
    d2 = d1[:, perm] + 0.05 * r.normal(size=(2, 40, 64)).astype(np.float32)
    d2 = np.concatenate([d2, r.normal(size=(2, 10, 64)).astype(np.float32)], axis=1)
    return d1, d2


@requires_reference
@pytest.mark.parametrize("distance_type", ["l2", "l1"])
def test_sinkhorn_matches_reference(descs, distance_type):
    import torch
    from pytorch_model.matching.sinkhorn import SinkhornMatcher

    d1, d2 = descs
    ref = SinkhornMatcher(iterations=20, epsilon=0.5, unused_score=1.0,
                          distance_type=distance_type)
    with torch.no_grad():
        expected = ref(torch.from_numpy(d1), torch.from_numpy(d2)).numpy()

    got = np.asarray(sinkhorn_match(jnp.asarray(d1), jnp.asarray(d2), iterations=20,
                                    epsilon=0.5, unused_score=1.0,
                                    distance_type=distance_type))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


@requires_reference
def test_sinkhorn_with_scores_matches_reference(descs):
    import torch
    from pytorch_model.matching.sinkhorn import SinkhornMatcherWithScores

    d1, d2 = descs
    ref = SinkhornMatcherWithScores(iterations=15, epsilon=1.0)
    with torch.no_grad():
        p_e, s0_e, s1_e = ref(torch.from_numpy(d1), torch.from_numpy(d2))

    p, s0, s1 = sinkhorn_match_with_scores(jnp.asarray(d1), jnp.asarray(d2), iterations=15)
    np.testing.assert_allclose(np.asarray(p), p_e.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s0), s0_e.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1), s1_e.numpy(), atol=1e-4)


@requires_reference
@pytest.mark.parametrize("ratio,margin", [(2.0, None), (None, 0.2), (1.5, 0.1)])
def test_sinkhorn_with_filters_matches_reference(descs, ratio, margin):
    import torch
    from pytorch_model.matching.sinkhorn import SinkhornMatcherWithFilters

    d1, d2 = descs
    ref = SinkhornMatcherWithFilters(iterations=20, epsilon=0.5,
                                     ratio_threshold=ratio, dustbin_margin=margin)
    with torch.no_grad():
        p_e, v_e = ref(torch.from_numpy(d1), torch.from_numpy(d2))

    p, v = sinkhorn_match_with_filters(jnp.asarray(d1), jnp.asarray(d2), iterations=20,
                                       epsilon=0.5, ratio_threshold=ratio,
                                       dustbin_margin=margin)
    v_np, v_ref = np.asarray(v), v_e.numpy()
    assert (v_np == v_ref).mean() > 0.99  # near-threshold rows may flip
    agree_rows = v_np == v_ref  # (B, N)
    p_np, p_ref = np.asarray(p), p_e.numpy()
    np.testing.assert_allclose(p_np[:, :-1][agree_rows], p_ref[:, :-1][agree_rows], atol=1e-3)
    np.testing.assert_allclose(p_np[:, -1], p_ref[:, -1], atol=1e-3)


def test_sinkhorn_marginals():
    """Doubly-stochastic property: rows/cols sum to their marginals.

    With the dustbin row/column the Sinkhorn fixed point is degenerate and
    converges sublinearly (err ~ 1/iterations: 1.2e-2 @ 20, 3.6e-3 @ 100,
    7.8e-4 @ 500 on this fixture) — same behavior as the reference's unrolled
    loop; tolerances reflect that rate.
    """
    r = np.random.default_rng(0)
    d1 = r.normal(size=(1, 30, 32)).astype(np.float32)
    d2 = r.normal(size=(1, 20, 32)).astype(np.float32)
    n, m = 30, 20
    p = np.asarray(sinkhorn_match(jnp.asarray(d1), jnp.asarray(d2), iterations=100))
    np.testing.assert_allclose(p[0, :n].sum(axis=1), np.ones(n), atol=5e-3)
    # Column marginals are exact right after the final v-update.
    np.testing.assert_allclose(p[0].sum(axis=0)[:m], np.ones(m), atol=1e-4)
    np.testing.assert_allclose(p[0].sum(), n + m, rtol=1e-3)
    p500 = np.asarray(sinkhorn_match(jnp.asarray(d1), jnp.asarray(d2), iterations=500))
    np.testing.assert_allclose(p500[0, :n].sum(axis=1), np.ones(n), atol=1e-3)


@requires_reference
def test_match_extraction_matches_reference(descs):
    import torch
    from pytorch_model.matching.sinkhorn import SinkhornMatcher
    from pytorch_model.matching.match_extraction import MutualNearestNeighborMatcher

    d1, d2 = descs
    n, m = d1.shape[1], d2.shape[1]
    r = np.random.default_rng(3)
    k1 = r.uniform(0, 100, size=(2, n, 2)).astype(np.float32)
    k2 = r.uniform(0, 100, size=(2, m, 2)).astype(np.float32)

    with torch.no_grad():
        p_t = SinkhornMatcher(iterations=20, epsilon=0.5)(torch.from_numpy(d1), torch.from_numpy(d2))
        ref = MutualNearestNeighborMatcher(max_matches=50, threshold=0.1)
        mk1_e, mk2_e, s_e, v_e = ref(p_t, torch.from_numpy(k1), torch.from_numpy(k2))

    mk1, mk2, s, v = extract_mutual_matches(jnp.asarray(p_t.numpy()), jnp.asarray(k1),
                                            jnp.asarray(k2), max_matches=50, threshold=0.1)
    assert (np.asarray(v) == v_e.numpy()).all()
    nv = v_e.numpy()
    np.testing.assert_allclose(np.asarray(s)[nv], s_e.numpy()[nv], atol=1e-5)
    # torch.topk and lax.top_k break score ties in different orders (SURVEY.md §7),
    # so compare the *set* of (kpt1, kpt2) match pairs per batch row, not the order.
    for bi in range(v.shape[0]):
        row = np.asarray(nv[bi])
        ours = {tuple(np.round(np.concatenate([np.asarray(mk1)[bi, j],
                                               np.asarray(mk2)[bi, j]]), 4))
                for j in np.where(row)[0]}
        ref_set = {tuple(np.round(np.concatenate([mk1_e.numpy()[bi, j],
                                                  mk2_e.numpy()[bi, j]]), 4))
                   for j in np.where(row)[0]}
        assert ours == ref_set


@requires_reference
def test_numpy_outlier_filters_match_reference():
    from pytorch_model.matching.outlier_filters import (
        probability_ratio_filter as ref_ratio,
        dustbin_margin_filter as ref_dustbin,
    )

    r = np.random.default_rng(5)
    p_core = r.uniform(size=(100, 100)).astype(np.float32)
    p_full = r.uniform(size=(101, 101)).astype(np.float32)
    np.testing.assert_array_equal(probability_ratio_filter(p_core, 1.5), ref_ratio(p_core, 1.5))
    np.testing.assert_array_equal(dustbin_margin_filter(p_full, 0.2), ref_dustbin(p_full, 0.2))
    # K=1 edge case
    np.testing.assert_array_equal(probability_ratio_filter(np.ones((1, 1), np.float32)),
                                  ref_ratio(np.ones((1, 1), np.float32)))


def test_l1_cost_streamed_equals_direct():
    """The chunked L1 cost (used when (B,N,M,D) would blow past ~64MB) must
    equal the direct 4-D formulation bit-for-bit."""
    import onnx_image_processing_tpu.ops.sinkhorn as sk

    rng = np.random.default_rng(11)
    d1 = jnp.asarray(rng.normal(size=(2, 37, 19)).astype(np.float32))
    d2 = jnp.asarray(rng.normal(size=(2, 53, 19)).astype(np.float32))
    direct = np.asarray(sk._l1_cost(d1, d2))
    old = sk._L1_DIRECT_ELEMS
    try:
        sk._L1_DIRECT_ELEMS = 1  # force streaming with an awkward chunk split
        streamed = np.asarray(jax.jit(sk._l1_cost)(d1, d2))
    finally:
        sk._L1_DIRECT_ELEMS = old
    np.testing.assert_array_equal(direct, streamed)


def test_l1_flagship_1024_compiles():
    """The l1 flagship variant at the reference CI shape (1024 kpts, 512-D)
    must lower without a (1,1024,1024,512) intermediate in the HLO."""
    from onnx_image_processing_tpu import models

    fn = models.build("shi_tomasi_angle_sparse_bad_sinkhorn",
                      max_keypoints=1024, num_pairs=512, distance_type="l1",
                      use_pallas=False)
    args = [jax.ShapeDtypeStruct((1, 1, 480, 640), jnp.float32)] * 2
    lowered = fn.lower(*args)
    assert "1024,1024,512" not in lowered.as_text()
    assert lowered.compile() is not None
