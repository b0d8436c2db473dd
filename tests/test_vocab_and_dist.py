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
