"""BoW vocabulary, loop retrieval scoring, and distributed BA tests."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam2_with_quadrics_tpu.ops import ba, camera, lie, vocab


def rand_desc(key, n):
    return jax.random.randint(key, (n, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )


def corrupt(key, desc, nbits):
    """Flip nbits random bits per descriptor."""
    n = desc.shape[0]
    out = np.asarray(desc).copy()
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 1 << 30)))
    for i in range(n):
        for _ in range(nbits):
            w, b = rng.randint(8), rng.randint(32)
            out[i, w] ^= np.uint32(1 << b)
    return jnp.asarray(out)


def test_vocab_train_transform_consistency():
    desc = rand_desc(jax.random.PRNGKey(0), 512)
    voc = vocab.train(desc, k=4, levels=3, seed=0)
    assert voc.n_words == 64
    w, mid = vocab.transform(voc, desc[:64], jnp.ones((64,), bool))
    assert int(jnp.max(w)) < 64 and int(jnp.min(w)) >= 0
    # same descriptor -> same word; slightly corrupted -> usually same word
    w2, _ = vocab.transform(voc, corrupt(jax.random.PRNGKey(1), desc[:64], 2),
                            jnp.ones((64,), bool))
    assert float(jnp.mean((w == w2).astype(jnp.float32))) > 0.5


def test_bow_similarity_discriminates():
    desc = rand_desc(jax.random.PRNGKey(2), 1024)
    voc = vocab.train(desc, k=4, levels=3, seed=0)

    frame_a = desc[:128]
    frame_a2 = corrupt(jax.random.PRNGKey(3), frame_a, 6)   # same place, noisy
    frame_b = rand_desc(jax.random.PRNGKey(4), 128)         # different place

    def bowvec(d):
        w, _ = vocab.transform(voc, d, jnp.ones((d.shape[0],), bool))
        return vocab.bow_vector(w, voc.n_words, voc.idf)

    va, va2, vb = bowvec(frame_a), bowvec(frame_a2), bowvec(frame_b)
    s_same = float(vocab.l1_score(va, va2))
    s_diff = float(vocab.l1_score(va, vb))
    assert s_same > s_diff + 0.1


def test_match_by_words_requires_same_word():
    desc = rand_desc(jax.random.PRNGKey(5), 256)
    voc = vocab.train(desc, k=4, levels=3, seed=0)
    a = desc[:64]
    b = corrupt(jax.random.PRNGKey(6), a, 3)
    wa, _ = vocab.transform(voc, a, jnp.ones((64,), bool))
    wb, _ = vocab.transform(voc, b, jnp.ones((64,), bool))
    mi, md = vocab.match_by_words(
        wa, a, jnp.ones((64,), bool), wb, b, jnp.ones((64,), bool)
    )
    mi = np.asarray(mi)
    hit = mi >= 0
    assert hit.mean() > 0.4
    assert (mi[hit] == np.arange(64)[hit]).all()


def _stereo_problem(key, n_cams=4, n_pts=64):
    Kc = jnp.asarray([300.0, 300.0, 160.0, 120.0])
    pts = jax.random.uniform(
        key, (n_pts, 3),
        minval=jnp.asarray([-2.0, -1.5, 4.0]), maxval=jnp.asarray([2.0, 1.5, 9.0]),
    )
    xi = jax.random.normal(key, (n_cams, 6)) * jnp.asarray(
        [0.02] * 3 + [0.3, 0.1, 0.1]
    )
    poses_true = lie.se3_exp(xi)
    cam_idx = jnp.repeat(jnp.arange(n_cams, dtype=jnp.int32), n_pts)
    pnt_idx = jnp.tile(jnp.arange(n_pts, dtype=jnp.int32), n_cams)
    uvr, _ = camera.project_stereo(
        Kc, 30.0, lie.se3_apply(poses_true[cam_idx], pts[pnt_idx])
    )
    # noise so the converged cost is O(100), not float-epsilon, making the
    # single-vs-multi-device cost comparison meaningful
    uvr = uvr + 0.3 * jax.random.normal(key, uvr.shape)
    prob = ba.BAProblem(
        poses=jax.vmap(lie.se3_retract)(
            poses_true, jax.random.normal(key, (n_cams, 6)) * 0.01
        ),
        points=pts + 0.02,
        K=Kc,
        bf=jnp.asarray(30.0),
        cam_idx=cam_idx,
        pnt_idx=pnt_idx,
        uvr=uvr,
        is_stereo=jnp.ones((n_cams * n_pts,)),
        inv_sigma2=jnp.ones((n_cams * n_pts,)),
        valid=jnp.ones((n_cams * n_pts,)),
        fixed_cam=jnp.zeros((n_cams,)).at[0].set(1.0),
        fixed_pnt=jnp.zeros((n_pts,)),
    )
    return prob, poses_true, pts


def test_distributed_ba_matches_single_device():
    """Edge-sharded BA over 8 virtual devices == single-device solve."""
    from orbslam2_with_quadrics_tpu.parallel import dist_ba

    prob, poses_true, pts_true = _stereo_problem(jax.random.PRNGKey(7))
    out1, cost1 = ba.ba_solve(prob, n_iters=5, cg_iters=20, use_huber=False)

    mesh = dist_ba.make_ba_mesh(8)
    probd = dist_ba.shard_problem(prob, mesh)
    out8, cost8 = dist_ba.dist_ba_solve(
        probd, mesh, n_iters=5, cg_iters=20, use_huber=False
    )
    np.testing.assert_allclose(float(cost1), float(cost8), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out1.poses), np.asarray(out8.poses), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1.points), np.asarray(out8.points), atol=5e-3
    )


def test_dist_retrieval_matches_local():
    from orbslam2_with_quadrics_tpu.models import loop_closing as lc
    from orbslam2_with_quadrics_tpu.parallel import dist_ba

    Kn, V = 16, 64
    bow = jax.random.uniform(jax.random.PRNGKey(8), (Kn, V))
    bow = bow * (bow > 0.7)
    bow = bow / jnp.maximum(jnp.sum(jnp.abs(bow), axis=1, keepdims=True), 1e-9)
    q = bow[3]
    valid = jnp.ones((Kn,), bool)
    s_local, c_local = lc.score_database(bow, q, valid)
    mesh = dist_ba.make_ba_mesh(8)
    s_dist, c_dist = dist_ba.dist_score_database(bow, q, valid, mesh)
    np.testing.assert_allclose(np.asarray(s_local), np.asarray(s_dist), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(c_local), np.asarray(c_dist))


def _rand_desc(n, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(
        rng.randint(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)
    )


def test_dbow2_text_roundtrip(tmp_path):
    """save_dbow2_text -> load_dbow2_text reproduces the trained tree: same
    word assignment for every descriptor (TemplatedVocabulary
    saveToTextFile/loadFromTextFile parity)."""
    desc = _rand_desc(400, seed=1)
    voc = vocab.train(desc, k=3, levels=3, seed=0)
    path = str(tmp_path / "voc.txt")
    vocab.save_dbow2_text(path, voc)
    tvoc = vocab.load_dbow2_text(path)
    assert tvoc.k == 3 and tvoc.levels == 3
    assert tvoc.n_words == voc.n_words

    q = _rand_desc(64, seed=2)
    valid = jnp.ones((64,), bool)
    w_orig, _ = vocab.transform(voc, q, valid)
    w_tree, _ = vocab.transform_tree(tvoc, q, valid)
    # word ids: ours are leaf index order; the file assigns leaf-appearance
    # order which equals leaf index order for a complete tree written level
    # by level -> identical
    np.testing.assert_array_equal(np.asarray(w_orig), np.asarray(w_tree))
    # weights carried through
    np.testing.assert_allclose(
        np.asarray(tvoc.idf), np.asarray(voc.idf), atol=1e-5
    )


def test_dbow2_ragged_tree_loads():
    """A DBoW2 tree with an early leaf (depth < L) and a node with fewer
    than k children must still transform every descriptor to a word."""
    import os
    import tempfile

    # k=2, L=2. Root children: node1 (leaf at depth 1!), node2.
    # node2 children: node3 (leaf), node4 (leaf)  -> 3 words total.
    d0 = " ".join(["0"] * 32)
    dff = " ".join(["255"] * 32)
    dhalf = " ".join(["255"] * 16 + ["0"] * 16)
    lines = [
        "2 2 0 0",
        f"0 1 {d0} 0.5",      # node1: early leaf, word 0
        f"0 0 {dff} 0.0",     # node2: internal
        f"2 1 {dff} 0.7",     # node3: leaf, word 1
        f"2 1 {dhalf} 0.9",   # node4: leaf, word 2
    ]
    with tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False
    ) as f:
        f.write("\n".join(lines) + "\n")
        path = f.name
    try:
        tvoc = vocab.load_dbow2_text(path)
        assert tvoc.n_words == 3
        q = jnp.stack([
            jnp.zeros((8,), jnp.uint32),                      # -> word 0
            jnp.full((8,), 0xFFFFFFFF, dtype=jnp.uint32),     # -> word 1
            jnp.concatenate([
                jnp.full((5,), 0xFFFFFFFF, dtype=jnp.uint32),
                jnp.zeros((3,), jnp.uint32),
            ]),  # 160 ones: nearer dff than d0 at level 0, then nearer
                 # dhalf (dist 32) than dff (dist 96) -> word 2
        ])
        w, _ = vocab.transform_tree(tvoc, q, jnp.ones((3,), bool))
        np.testing.assert_array_equal(np.asarray(w), [0, 1, 2])
        np.testing.assert_allclose(
            np.asarray(tvoc.idf), [0.5, 0.7, 0.9], atol=1e-6
        )
    finally:
        os.unlink(path)


def test_native_vocab_parser_matches_python(tmp_path):
    desc = _rand_desc(300, seed=3)
    voc = vocab.train(desc, k=3, levels=2, seed=0)
    path = str(tmp_path / "voc.txt")
    vocab.save_dbow2_text(path, voc)
    try:
        from orbslam2_with_quadrics_tpu.native import parse_vocab_text

        nk, nL, ns, nw, npar, nleaf, ndesc, nwt = parse_vocab_text(path)
    except Exception:
        import pytest

        pytest.skip("native toolchain unavailable")
    with open(path) as f:
        f.readline()
        body = np.fromfile(f, sep=" ").reshape(-1, 35)
    assert (nk, nL) == (3, 2)
    np.testing.assert_array_equal(npar, body[:, 0].astype(np.int64))
    np.testing.assert_array_equal(nleaf, body[:, 1] > 0)
    np.testing.assert_array_equal(ndesc, body[:, 2:34].astype(np.uint8))
    np.testing.assert_allclose(nwt, body[:, 34], atol=1e-9)


def test_sparse_bow_scores_match_dense():
    """sparse_l1_scores must equal the dense score_database path."""
    from orbslam2_with_quadrics_tpu.models.loop_closing import score_database

    desc = _rand_desc(500, seed=4)
    voc = vocab.train(desc, k=4, levels=3, seed=0)
    V = voc.n_words
    K, N = 6, 64
    rng = np.random.RandomState(5)
    bow = []
    wid_l, wval_l, words_l = [], [], []
    for i in range(K):
        d = _rand_desc(N, seed=10 + i)
        valid = jnp.asarray(rng.rand(N) > 0.2)
        w, _ = vocab.transform(voc, d, valid)
        words_l.append(w)
        bow.append(vocab.bow_vector(w, V, voc.idf))
        wi, wv = vocab.sparse_bow(w, voc.idf)
        wid_l.append(wi)
        wval_l.append(wv)
    bow = jnp.stack(bow)
    kf_valid = jnp.ones((K,), bool)
    s_dense, c_dense = score_database(bow, bow[0], kf_valid)
    s_sparse, c_sparse = vocab.sparse_l1_scores(
        jnp.stack(wid_l), jnp.stack(wval_l), wid_l[0], wval_l[0], kf_valid
    )
    np.testing.assert_allclose(
        np.asarray(s_sparse), np.asarray(s_dense), atol=1e-5
    )
    # common-word counts agree (dense counts distinct shared words)
    np.testing.assert_array_equal(np.asarray(c_sparse), np.asarray(c_dense))


def test_loopcloser_sparse_mode(monkeypatch, tmp_path):
    """LoopCloser in sparse mode (big-vocabulary path) retrieves the same
    best candidate as dense mode, and System(vocab_path=...) loads a DBoW2
    text vocabulary at construction (reference System.cc:64-71)."""
    from orbslam2_with_quadrics_tpu.models import loop_closing as lc
    from orbslam2_with_quadrics_tpu.models import map_state as ms

    desc = _rand_desc(600, seed=6)
    voc = vocab.train(desc, k=4, levels=3, seed=0)
    cfg = ms.MapConfig(max_keyframes=8, max_points=64, n_features=96, n_levels=4)
    m = ms.empty_map(cfg)._replace(kf_valid=jnp.ones((8,), bool))

    dense = lc.LoopCloser(voc, cfg)
    monkeypatch.setattr(lc, "SPARSE_WORDS_THRESHOLD", 1)
    sparse = lc.LoopCloser(voc, cfg)
    assert sparse.sparse and not dense.sparse

    frames = [_rand_desc(96, seed=20 + i) for i in range(8)]
    valid = jnp.ones((96,), bool)
    for i, d in enumerate(frames):
        dense.add_keyframe(i, d, valid)
        sparse.add_keyframe(i, d, valid)
    w0, _ = vocab.transform(voc, frames[0], valid)
    sd, cd = dense.score_query(w0, m.kf_valid)
    ss, cs = sparse.score_query(w0, m.kf_valid)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sd), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cd))

    # System accepts a DBoW2 .txt vocabulary path
    from orbslam2_with_quadrics_tpu.models import frontend as fe
    from orbslam2_with_quadrics_tpu.models import system as sysm

    path = str(tmp_path / "voc.txt")
    vocab.save_dbow2_text(path, voc)
    scfg = sysm.SystemConfig(
        frontend=fe.FrontendConfig(
            height=64, width=64, n_features=96, n_levels=2,
            fx=50.0, fy=50.0, cx=32.0, cy=32.0,
        ),
        map=cfg, sensor="mono", enable_loop_closing=True, vocab_path=path,
    )
    slam = sysm.System(scfg)
    assert slam.loop_closer is not None
    assert isinstance(slam.loop_closer.voc, vocab.TreeVocabulary)
    slam.reset()
    assert slam.loop_closer is not None  # pretrained vocab survives reset
