"""Vocabulary tree + loop detector tests (counterpart of src/loop behavior)."""

import numpy as np

from mavmap_tpu.features.provider import Features
from mavmap_tpu.loop import LoopDetector, train_voc_tree


def _desc(rng, n, d=32):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _features(desc, capacity=256):
    kp = np.zeros((len(desc), 2), np.float32)
    return Features.from_arrays(kp, desc, capacity)


def test_voctree_quantization_consistency(rng):
    train = _desc(rng, 4000)
    tree = train_voc_tree(train, branching=4, depth=3, iters=4, seed=0)
    assert tree.num_words == 64
    q = _desc(rng, 100)
    w1 = np.asarray(tree.quantize(q))
    w2 = np.asarray(tree.quantize(q))
    assert (w1 == w2).all()
    assert (w1 >= 0).all() and (w1 < 64).all()
    # Perturbed copies should mostly quantize to the same word.
    q2 = q + rng.normal(size=q.shape).astype(np.float32) * 0.01
    q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
    w3 = np.asarray(tree.quantize(q2))
    assert (w1 == w3).mean() > 0.8


def test_voctree_save_load(rng, tmp_path):
    from mavmap_tpu.loop import VocTree

    train = _desc(rng, 2000)
    tree = train_voc_tree(train, branching=4, depth=2, iters=3)
    path = str(tmp_path / "tree.npz")
    tree.save(path)
    tree2 = VocTree.load(path)
    q = _desc(rng, 50)
    assert (np.asarray(tree.quantize(q)) == np.asarray(tree2.quantize(q))).all()


def test_loop_detector_retrieval(rng):
    # Images share descriptors with their "revisit" counterpart.
    train = _desc(rng, 4000)
    tree = train_voc_tree(train, branching=4, depth=3, iters=4)
    det = LoopDetector(tree)

    base = [_desc(rng, 150) for _ in range(6)]
    # Image 6 revisits image 2's content (noisy copy).
    revisit = base[2] + rng.normal(size=base[2].shape).astype(np.float32) * 0.02
    revisit /= np.linalg.norm(revisit, axis=-1, keepdims=True)

    for i, d in enumerate(base):
        det.add_image(i, _features(d))
    idxs, scores = det.query(_features(revisit), num_images=3)
    assert idxs[0] == 2
    assert scores[0] < scores[-1]
    # Self-similar query of a stored image returns itself first with ~0 score.
    idxs2, scores2 = det.query(_features(base[4]), num_images=2)
    assert idxs2[0] == 4
    assert scores2[0] < 0.2


def test_loop_detector_duplicate_add(rng):
    train = _desc(rng, 1000)
    tree = train_voc_tree(train, branching=4, depth=2, iters=2)
    det = LoopDetector(tree)
    d = _desc(rng, 50)
    det.add_image(0, _features(d))
    det.add_image(0, _features(d))
    assert det.num_images == 1


def test_forward_file_vw_intersection_match(rng):
    """match_forward: keypoints quantizing to the same visual word across
    two images become tentative correspondences (reference
    VocTreeDatabase::match semantics)."""
    base = _desc(rng, 64)
    tree = train_voc_tree(_desc(rng, 512), branching=4, depth=3, seed=0)
    det = LoopDetector(tree)

    kp1 = rng.uniform(0, 100, size=(64, 2)).astype(np.float32)
    f1 = Features.from_arrays(kp1, base, 128)
    det.add_image(0, f1)

    # Query = same descriptors (slightly perturbed), shifted keypoints.
    desc2 = base + rng.normal(size=base.shape).astype(np.float32) * 1e-3
    desc2 /= np.linalg.norm(desc2, axis=-1, keepdims=True)
    kp2 = kp1 + 5.0
    f2 = Features.from_arrays(kp2, desc2, 128)

    xy_db, xy_q = det.match_forward(0, f2)
    assert len(xy_db) == len(xy_q) > 10
    # Where words collide uniquely, the displacement is exactly (5, 5).
    disp = xy_q - xy_db
    frac_exact = (np.abs(disp - 5.0).max(axis=1) < 1e-4).mean()
    assert frac_exact > 0.5

    vw, xy = det.forward_data(0)
    assert (np.diff(vw) > 0).all()          # sorted unique
    assert xy.shape == (len(vw), 2)


def test_voctree_reference_binary_roundtrip(rng, tmp_path):
    """Reference --voc-tree-path binary format: save -> load -> identical
    quantization (up to the uint8 center quantization, which the round
    trip makes exact)."""
    from mavmap_tpu.loop import VocTree

    tree = train_voc_tree(_desc(rng, 512, d=128), branching=4, depth=3, seed=1)
    path = tmp_path / "tree.bin"
    tree.save_reference_binary(str(path))
    tree2 = VocTree.load_reference_binary(str(path))
    assert tree2.branching == 4 and tree2.depth == 3
    assert tree2.num_words == tree.num_words

    # Round-trip again: uint8-quantized centers reproduce exactly.
    path2 = tmp_path / "tree2.bin"
    tree2.save_reference_binary(str(path2))
    assert path.read_bytes() == path2.read_bytes()

    q = _desc(rng, 200, d=128)
    w1 = np.asarray(tree2.quantize(q))
    tree3 = VocTree.load_reference_binary(str(path2))
    w2 = np.asarray(tree3.quantize(q))
    assert (w1 == w2).all()
    assert (w1 >= 0).all() and (w1 < tree.num_words).all()
    # And close to the float tree's words (uint8 center quantization moves
    # borderline descriptors; random unit vectors are near-worst-case).
    w0 = np.asarray(tree.quantize(q))
    assert (w0 == w1).mean() > 0.7


def test_sparse_scoring_matches_dense(rng):
    """Posting-list scoring == dense-matmul scoring: rankings identical
    and scores tight — both paths are f32, so near-tie rankings cannot
    flip at the dense/sparse switchover (64k words)."""
    train = _desc(rng, 4000)
    tree = train_voc_tree(train, branching=4, depth=3, iters=4)
    dense = LoopDetector(tree, score_mode="dense")
    sparse = LoopDetector(tree, score_mode="sparse")

    base = [_desc(rng, 150) for _ in range(10)]
    for i, d in enumerate(base):
        dense.add_image(i, _features(d))
        sparse.add_image(i, _features(d))
    q = base[3] + rng.normal(size=base[3].shape).astype(np.float32) * 0.02
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    for use_idf in (True, False):
        i_d, s_d = dense.query(_features(q), num_images=10, use_idf=use_idf)
        i_s, s_s = sparse.query(_features(q), num_images=10, use_idf=use_idf)
        np.testing.assert_array_equal(i_d, i_s)
        np.testing.assert_allclose(s_d, s_s, atol=2e-4)
    assert i_s[0] == 3


def test_sparse_scoring_large_vocabulary(rng):
    """The sparse path must handle a ~1M-word vocabulary with O(postings)
    memory (the reference's block-chained posting lists,
    voc_tree_inv_file.cc:86-129; a dense BoW matrix would be 4 MB/image)."""

    class BigTreeStub:
        num_words = 1_000_000

    det = LoopDetector(BigTreeStub(), score_mode="sparse")
    n_img, n_feat = 20, 400
    words = [rng.integers(0, BigTreeStub.num_words, size=n_feat)
             for _ in range(n_img)]
    words.append(words[7].copy())  # image 20 revisits image 7
    # Register postings directly (the stub tree has no centroids to
    # quantize with; this exercises the inverted-file scoring machinery).
    for i, w in enumerate(words):
        uw, tf = np.unique(w, return_counts=True)
        det._post_words.append(uw.astype(np.int64))
        det._post_tfs.append(tf.astype(np.float32))
        det._df[uw] += 1
        det._idx_to_slot[i] = i
        det._image_idxs.append(i)
    det._inv = None

    det._words_cache[99] = words[7].astype(np.int64)
    qf = _features(_desc(rng, 64))  # content unused: words come from cache
    idxs, scores = det.query(qf, num_images=5, image_idx=99)
    # Exact revisit of image 7's words: both 7 and 20 score ~0, first.
    assert set(int(i) for i in idxs[:2]) == {7, 20}
    assert scores[0] < 1e-3
