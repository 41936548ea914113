"""BoW vocabulary + keyframe recognition database (ops/bow.py,
runtime/keyframe_db.py) — the DBoW2/KeyFrameDatabase equivalents
(SURVEY.md §2.2 DBoW2 row, §2.1 KeyFrameDatabase row)."""

import numpy as np
import pytest
import jax.numpy as jnp

from eao_slam_tpu.ops import bow
from eao_slam_tpu.runtime.keyframe_db import KeyFrameDatabase


def _clustered_descriptors(rng, n_clusters=12, per_cluster=80, flip_bits=8):
    """Descriptor clusters: random 256-bit centers + small hamming noise."""
    centers = rng.integers(0, 2**32, (n_clusters, 8), dtype=np.uint32)
    out, labels = [], []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            d = centers[c].copy()
            for _ in range(flip_bits):
                w = rng.integers(8)
                d[w] ^= np.uint32(1) << np.uint32(rng.integers(32))
            out.append(d)
            labels.append(c)
    return np.stack(out), np.asarray(labels), centers


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    desc, labels, centers = _clustered_descriptors(rng)
    v = bow.build_vocabulary(desc, k=4, depth=3, seed=1)
    return v, desc, labels, centers


def test_vocabulary_structure(voc):
    v, desc, labels, centers = voc
    assert v.k == 4 and v.depth == 3 and v.n_words == 64
    assert v.levels[0].shape == (4, 8)
    assert v.levels[2].shape == (64, 8)
    assert v.idf.shape == (64,)


def test_build_deterministic(voc):
    v, desc, labels, centers = voc
    v2 = bow.build_vocabulary(desc, k=4, depth=3, seed=1)
    for a, b in zip(v.levels, v2.levels):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantize_groups_clusters(voc):
    """Descriptors of the same cluster should mostly share a word; distinct
    clusters should rarely collide (the vocabulary's whole job)."""
    v, desc, labels, centers = voc
    word, node = bow.quantize(v, jnp.asarray(desc))
    word = np.asarray(word)
    assert word.min() >= 0 and word.max() < v.n_words
    # intra-cluster purity: dominant word covers most of each cluster
    purity = []
    for c in np.unique(labels):
        w = word[labels == c]
        purity.append(np.bincount(w).max() / len(w))
    assert np.mean(purity) > 0.8, f"mean purity {np.mean(purity):.2f}"
    # node is the coarser direct index: consistent with word prefix
    node = np.asarray(node)
    assert np.all(node == word // v.k)


def test_bow_vector_and_score(voc):
    v, desc, labels, centers = voc
    rng = np.random.default_rng(3)
    da = jnp.asarray(desc[labels < 4])
    db_ = jnp.asarray(desc[labels >= 8])
    va = bow.bow_vector(v, bow.quantize(v, da)[0], jnp.ones((da.shape[0],), bool))
    vb = bow.bow_vector(v, bow.quantize(v, db_)[0], jnp.ones((db_.shape[0],), bool))
    assert abs(float(jnp.sum(jnp.abs(va))) - 1.0) < 1e-5
    s_self = float(bow.score_l1(va[None], va)[0])
    s_cross = float(bow.score_l1(va[None], vb)[0])
    assert s_self > 0.999
    assert s_cross < 0.6 * s_self


def test_save_load_roundtrip(tmp_path, voc):
    v, desc, _, _ = voc
    p = str(tmp_path / "voc.npz")
    bow.save_vocabulary(p, v)
    v2 = bow.load_vocabulary(p)
    w1, _ = bow.quantize(v, jnp.asarray(desc[:32]))
    w2, _ = bow.quantize(v2, jnp.asarray(desc[:32]))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_bow_match_mask():
    na = jnp.asarray([0, 1, 2, 1])
    nb = jnp.asarray([1, 0, 1])
    m = np.asarray(bow.bow_match_mask(na, nb))
    assert m.shape == (4, 3)
    assert m[0, 1] and m[1, 0] and m[1, 2] and not m[0, 0]


def _kf_vectors(v, desc, labels, which, rng):
    """BoW vector of a pseudo-keyframe drawing features from given clusters."""
    sel = np.isin(labels, which)
    idx = rng.choice(np.flatnonzero(sel), 60, replace=False)
    d = jnp.asarray(desc[idx])
    w, _ = bow.quantize(v, d)
    return np.asarray(bow.bow_vector(v, w, jnp.ones((60,), bool)))


def test_keyframe_db_reloc_and_loop(voc):
    v, desc, labels, centers = voc
    rng = np.random.default_rng(11)
    K = 16
    db = KeyFrameDatabase(v, K)
    # keyframes 0..9: sliding cluster windows; 3 and 8 see the same place
    views = {i: [i % 10, (i + 1) % 10] for i in range(10)}
    views[8] = views[3]
    for i in range(10):
        db.add(i, _kf_vectors(v, desc, labels, views[i], rng))

    covis = np.zeros((K, K), np.int64)
    for i in range(9):  # temporal chain covisibility
        covis[i, i + 1] = covis[i + 1, i] = 40

    q = _kf_vectors(v, desc, labels, views[3], rng)

    # reloc: the best candidates should include keyframes 3 and/or 8
    cands = db.detect_reloc_candidates(q, covis)
    assert cands, "no reloc candidates"
    assert cands[0] in (3, 8)

    # loop from keyframe 8: keyframe 3 is unconnected and same-place
    cands = db.detect_loop_candidates(
        db.vectors[8], covis[8], covis, min_score=0.05, self_slot=8)
    assert 3 in cands, f"loop candidates {cands} miss keyframe 3"
    assert 8 not in cands

    db.erase(3)
    cands = db.detect_loop_candidates(
        db.vectors[8], covis[8], covis, min_score=0.05, self_slot=8)
    assert 3 not in cands


class TestTextFormat:
    def test_text_roundtrip(self, tmp_path):
        """DBoW2 text-format ingestion (TemplatedVocabulary.h:1350-1434):
        save -> load reproduces the tree tables, weights, and quantization."""
        import jax.numpy as jnp

        from eao_slam_tpu.ops.bow import (
            build_vocabulary,
            load_vocabulary_text,
            quantize,
            save_vocabulary_text,
        )

        rng = np.random.default_rng(3)
        desc = rng.integers(0, 2**32, (3000, 8), dtype=np.uint32)
        voc = build_vocabulary(desc, k=4, depth=3)
        p = str(tmp_path / "voc.txt")
        save_vocabulary_text(p, voc)

        voc2 = load_vocabulary_text(p)
        assert voc2.k == voc.k and voc2.depth == voc.depth
        for a, b in zip(voc.levels, voc2.levels):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(voc.idf), np.asarray(voc2.idf), rtol=1e-5
        )
        q = jnp.asarray(rng.integers(0, 2**32, (64, 8), dtype=np.uint32))
        w1, n1 = quantize(voc, q)
        w2, n2 = quantize(voc2, q)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_text_underfull_tree(self, tmp_path):
        """A hand-written vocabulary with an under-full interior node and an
        early leaf still loads into the complete-tree layout."""
        from eao_slam_tpu.ops.bow import load_vocabulary_text

        k, L = 2, 2
        lines = [f"{k} {L} 0 0"]

        def node(pid, leaf, byteval, w):
            ds = " ".join([str(byteval)] * 32)
            return f"{pid} {leaf} {ds} {w}"

        # root children: node1 (interior, full), node2 (early leaf)
        lines.append(node(0, 0, 1, 0))    # id 1
        lines.append(node(0, 1, 2, 0.5))  # id 2: early leaf at level 0
        lines.append(node(1, 1, 3, 0.7))  # id 3: leaf under node 1
        # node 1 under-full: only one child
        p = str(tmp_path / "voc.txt")
        with open(p, "w") as f:
            f.write("\n".join(lines) + "\n")
        voc = load_vocabulary_text(p)
        assert voc.k == 2 and voc.depth == 2
        idf = np.asarray(voc.idf)
        assert (idf > 0).sum() == 2          # two real words
        assert abs(sorted(idf[idf > 0])[0] - 0.5) < 1e-6
        assert abs(sorted(idf[idf > 0])[1] - 0.7) < 1e-6
