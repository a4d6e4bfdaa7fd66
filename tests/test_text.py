"""Text/embedding layer tests: class-name rules, embedding math, filters.

Golden token expectations were derived by executing the reference rules
(/root/reference/auxiliary/auxiliary_word2vec.py:53-219) by hand on known
class names; scipy is used as the oracle for the cosine-distance filter.
"""

import io
import struct

import numpy as np
import pytest
from scipy.spatial.distance import cdist as scipy_cdist

from zeroshotvideoclassification_tpu.text import (
    SyntheticWordVectors,
    class_name_to_words,
    classes2embedding,
    cosine_cdist,
    filter_classes,
    filter_overlapping_classes,
    filter_samples,
    verbs2basicform,
)
from zeroshotvideoclassification_tpu.text.word2vec import (
    WordVectors,
    parse_word2vec_bin,
)


# ----------------------------------------------------------------- lemma ----
def test_verbs2basicform_common_inflections():
    assert verbs2basicform(["running"]) == ["run"]
    assert verbs2basicform(["cutting"]) == ["cut"]
    assert verbs2basicform(["walking", "dog"])[0] == "walk"
    assert verbs2basicform(["eating"]) == ["eat"]
    assert verbs2basicform(["throwing"]) == ["throw"]
    assert verbs2basicform(["juggling"]) == ["juggle"]


def test_verbs2basicform_keeps_nouns():
    # tokens with no verb reading pass through unchanged
    assert verbs2basicform(["kitchen"]) == ["kitchen"]
    assert verbs2basicform(["soccer"]) == ["soccer"]


# ------------------------------------------------------------ class rules ---
def test_ucf_camelcase_split():
    assert class_name_to_words("ucf101", "ApplyEyeMakeup") == ["apply", "eye", "makeup"]
    assert class_name_to_words("ucf101", "BasketballDunk") == ["basketball", "dunk"]


def test_ucf_overrides():
    assert class_name_to_words("ucf101", "CleanAndJerk") == ["weight", "lift"]
    assert class_name_to_words("ucf101", "YoYo") == ["yoyo"]
    assert class_name_to_words("ucf101", "WalkingWithDog") == ["walk", "dog"]


def test_hmdb_space_split_and_typo():
    assert class_name_to_words("hmdb51", "claping") == ["clap"]  # lemmatized override
    assert class_name_to_words("hmdb51", "brush hair") == ["brush", "hair"]


def test_kinetics_stopwords_and_parens():
    assert class_name_to_words("kinetics", "playing the piano") == ["play", "piano"]
    # '(not ...)' suffix is truncated
    words = class_name_to_words("kinetics", "skiing (not slalom or crosscountry)")
    assert words == ["ski"]
    assert class_name_to_words("kinetics", "hurling (sport)") == ["hurl", "sport"]


def test_activitynet_underscores():
    assert class_name_to_words("activitynet", "Ping-pong") == ["table", "tennis"]
    assert class_name_to_words("activitynet", " Ping-pong") == ["table", "tennis"]
    # 'dish' has a WordNet verb synset ("dish out"), so real WordNet
    # lemmatizes the plural — pinned in tests/test_lemma_goldens.py
    assert class_name_to_words("activitynet", "Washing_dishes") == ["wash", "dish"]


def test_sun_split_no_lemma():
    assert class_name_to_words("sun", "videostore") == ["video", "store"]
    assert class_name_to_words("sun", "swimming_pool/indoor") == [
        "swimming", "pool", "indoor",
    ]  # no lemmatization for SUN (auxiliary_word2vec.py:198-209)


def test_unknown_dataset_raises():
    with pytest.raises(ValueError):
        class_name_to_words("imagenet", "dog")


# ------------------------------------------------------------- embeddings ---
def test_classes2embedding_is_row_normalized_token_mean():
    wv = SyntheticWordVectors(dim=300)
    names = ["BasketballDunk", "YoYo", "ApplyEyeMakeup"]
    emb = classes2embedding("ucf101", names, wv)
    assert emb.shape == (3, 300)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # manual recompute of row 0
    toks = class_name_to_words("ucf101", names[0])
    man = wv[toks].mean(0)
    man = man / np.linalg.norm(man)
    np.testing.assert_allclose(emb[0], man, atol=1e-6)


def test_synthetic_vectors_deterministic():
    a = SyntheticWordVectors()["run"]
    b = SyntheticWordVectors()["run"]
    np.testing.assert_array_equal(a, b)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-5


# --------------------------------------------------------------- bin parse --
def test_parse_word2vec_bin_roundtrip(tmp_path):
    dim, words = 4, ["cat", "dog", "running"]
    vecs = np.random.default_rng(1).normal(size=(3, dim)).astype(np.float32)
    buf = io.BytesIO()
    buf.write(f"{len(words)} {dim}\n".encode())
    for w, v in zip(words, vecs):
        buf.write(w.encode() + b" ")
        buf.write(struct.pack("<%df" % dim, *v))
    p = tmp_path / "mini.bin"
    p.write_bytes(buf.getvalue())
    wv = parse_word2vec_bin(str(p))
    assert len(wv) == 3 and wv.dim == dim
    np.testing.assert_allclose(wv["dog"], vecs[1], atol=1e-7)
    np.testing.assert_allclose(wv[["cat", "running"]], vecs[[0, 2]], atol=1e-7)


def test_wordvectors_npz_roundtrip(tmp_path):
    wv = WordVectors(["a", "b"], np.eye(2, 3, dtype=np.float32))
    path = str(tmp_path / "wv.npz")
    wv.save_npz(path)
    wv2 = WordVectors.load_npz(path)
    np.testing.assert_array_equal(wv2["b"], wv["b"])


# ------------------------------------------------------------------ filters -
def test_cosine_cdist_matches_scipy(rng):
    a = rng.normal(size=(7, 16))
    b = rng.normal(size=(5, 16))
    np.testing.assert_allclose(
        cosine_cdist(a, b), scipy_cdist(a, b, "cosine"), atol=1e-10
    )


def test_filter_samples_linspace():
    fnames = [f"v{i}" for i in range(10)]
    labels = [f"c{i % 2}" for i in range(10)]
    f, l, c = filter_samples(4, fnames, labels, ["c0", "c1"])
    sel = np.linspace(0, 9, 4).astype(int)
    np.testing.assert_array_equal(f, np.asarray(fnames)[sel])
    f, l, _ = filter_samples(-1, fnames, labels, ["c0", "c1"])
    assert len(f) == 10


def test_filter_classes():
    classes = [f"c{i}" for i in range(6)]
    emb = np.eye(6, 8, dtype=np.float32)
    fnames = [f"v{i}" for i in range(12)]
    labels = [classes[i % 6] for i in range(12)]
    f, l, c, e = filter_classes(3, fnames, labels, classes, emb)
    sel = np.linspace(0, 5, 3).astype(int)
    assert list(c) == [classes[i] for i in sel]
    np.testing.assert_array_equal(e, emb[sel])
    assert all(lbl in set(c) for lbl in l)
    assert len(f) == len(l) == 6  # 2 samples per surviving class


def test_filter_overlapping_classes_threshold_strict():
    # class 0 is identical to a test class (distance 0) -> dropped;
    # class 1 orthogonal (distance 1) -> kept; strict '>' boundary checked.
    emb = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    test_emb = np.array([[1.0, 0.0]], dtype=np.float32)
    fnames = ["a0", "a1", "b0"]
    labels = ["c0", "c0", "c1"]
    f, l, c, e = filter_overlapping_classes(
        fnames, labels, ["c0", "c1"], emb, test_emb, 0.04
    )
    assert c == ["c1"] and f == ["b0"] and l == ["c1"]
    np.testing.assert_array_equal(e, emb[1:])
    # tau = 1.0 with strict '>' drops the orthogonal class too
    f, l, c, e = filter_overlapping_classes(
        fnames, labels, ["c0", "c1"], emb, test_emb, 1.0
    )
    assert c == []
