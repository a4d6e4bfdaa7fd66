"""On-device cosine retrieval vs scipy oracle."""

import numpy as np
from scipy.spatial.distance import cdist as scipy_cdist

from zeroshotvideoclassification_tpu.ops import (
    cosine_distances,
    nearest_class,
    topk_classes,
)


def test_cosine_distances_matches_scipy(rng):
    a = rng.normal(size=(33, 300)).astype(np.float32)
    b = rng.normal(size=(17, 300)).astype(np.float32)
    got = np.asarray(cosine_distances(a, b))
    want = scipy_cdist(a, b, "cosine")
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nearest_and_topk_match_scipy(rng):
    a = rng.normal(size=(50, 300)).astype(np.float32)
    b = rng.normal(size=(25, 300)).astype(np.float32)
    d = scipy_cdist(a, b, "cosine")
    np.testing.assert_array_equal(np.asarray(nearest_class(a, b)), d.argmin(1))
    got5 = np.asarray(topk_classes(a, b, 5))
    want5 = d.argsort(1)[:, :5]
    np.testing.assert_array_equal(got5, want5)


def test_topk_self_retrieval():
    e = np.eye(8, 300, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(nearest_class(e, e)), np.arange(8))
