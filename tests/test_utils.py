"""Config YAML, trajectory formats, viz render, vocab serialization."""

import numpy as np
import pytest

from orbslam2_with_quadrics_tpu.utils import config, metrics


TUM1_YAML = """\
%YAML:1.0
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989
Camera.k1: 0.262383
Camera.k2: -0.953104
Camera.p1: -0.005358
Camera.p2: 0.002628
Camera.k3: 1.163314
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
DepthMapFactor: 5000.0
"""


def test_reference_yaml_parses(tmp_path):
    p = tmp_path / "TUM1.yaml"
    p.write_text(TUM1_YAML)
    s = config.load_settings(str(p))
    fc = config.frontend_config_from_settings(s, 480, 640)
    assert abs(fc.fx - 517.306408) < 1e-6
    assert fc.n_features == 1000
    assert fc.n_levels == 8
    assert abs(fc.k1 - 0.262383) < 1e-6
    assert config.camera_fps(s) == 30.0
    assert abs(config.depth_map_factor(s) - 1 / 5000.0) < 1e-9


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(0)
    src = rng.randn(50, 3)
    R, _ = np.linalg.qr(rng.randn(3, 3))
    R = R * np.sign(np.linalg.det(R))
    s, t = 1.7, np.array([0.3, -1.0, 2.0])
    dst = s * src @ R.T + t
    s2, R2, t2 = metrics.umeyama_align(src, dst)
    assert abs(s2 - s) < 1e-6
    np.testing.assert_allclose(R2, R, atol=1e-6)
    assert metrics.ate_rmse(src, dst) < 1e-6


def test_viz_renders():
    import jax.numpy as jnp

    from orbslam2_with_quadrics_tpu.models import frontend as fe
    from orbslam2_with_quadrics_tpu.models import map_state as ms
    from orbslam2_with_quadrics_tpu.utils import viz

    n = 32
    feats = fe.FrameFeatures(
        uv=jnp.asarray(np.random.RandomState(0).rand(n, 2) * 100),
        uv_und=jnp.zeros((n, 2)),
        level=jnp.zeros((n,), jnp.int32),
        angle=jnp.zeros((n,)),
        score=jnp.zeros((n,)),
        desc=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.ones((n,), bool),
        ur=jnp.full((n,), -1.0),
        depth=jnp.zeros((n,)),
    )
    img = np.random.RandomState(1).rand(120, 160) * 255
    obs = jnp.full((n,), -1, jnp.int32).at[:5].set(1)
    out = viz.draw_frame(img, feats, obs, "KFs: 3, MPs: 100")
    assert out.shape == (120, 160, 3)

    cfg = ms.MapConfig(max_keyframes=4, max_points=64, n_features=n, n_levels=2)
    m = ms.empty_map(cfg)
    m = m._replace(
        pt_pos=m.pt_pos.at[:10].set(np.random.RandomState(2).rand(10, 3)),
        pt_valid=m.pt_valid.at[:10].set(True),
        kf_valid=m.kf_valid.at[0].set(True),
    )
    out2 = viz.draw_map(m)
    assert out2.shape == (800, 800, 3)


def test_vocab_save_load_roundtrip(tmp_path):
    import jax

    from orbslam2_with_quadrics_tpu.ops import vocab

    desc = jax.random.randint(
        jax.random.PRNGKey(0), (256, 8), 0, 2**31 - 1, dtype="int32"
    ).astype("uint32")
    voc = vocab.train(desc, k=4, levels=2)
    p = str(tmp_path / "voc.npz")
    vocab.save(p, voc)
    voc2 = vocab.load(p)
    w1, _ = vocab.transform(voc, desc[:32], np.ones(32, bool))
    w2, _ = vocab.transform(voc2, desc[:32], np.ones(32, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_trajectory_quaternion_conversion_consistency():
    from orbslam2_with_quadrics_tpu.utils import trajectory

    rng = np.random.RandomState(3)
    for _ in range(10):
        A = rng.randn(3, 3)
        R, _ = np.linalg.qr(A)
        R = R * np.sign(np.linalg.det(R))
        qx, qy, qz, qw = trajectory._R_to_quat(R)
        # rebuild R from quaternion
        w, x, y, z = qw, qx, qy, qz
        R2 = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        np.testing.assert_allclose(R, R2, atol=1e-9)


EUROC_BLOCK = """%YAML:1.0
Camera.fps: 20.0
Viewer.PointSize:2
LEFT.height: 4
LEFT.width: 6
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28, 0.07, 0.0, 0.0, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 3.0, 0.0, 457.296, 2.0, 0.0, 0.0, 1.0]
LEFT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 3.0, 0, 0, 435.2, 2.0, 0, 0, 0, 1, 0]
RIGHT.height: 4
RIGHT.width: 6
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28, 0.07, 0.0, 0.0, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.6, 0.0, 3.0, 0.0, 456.1, 2.0, 0.0, 0.0, 1.0]
RIGHT.R: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P: !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 3.0, -47.9, 0, 435.2, 2.0, 0, 0, 0, 1, 0]
"""


def test_opencv_matrix_yaml_and_rectify_maps(tmp_path):
    """OpenCV-FileStorage YAML quirks the reference files rely on:
    !!opencv-matrix tags, 'data:[' and 'key:value' without spaces
    (Examples/Stereo/EuRoC.yaml)."""
    p = tmp_path / "EuRoC.yaml"
    p.write_text(EUROC_BLOCK)
    s = config.load_settings(str(p))
    assert s["Viewer.PointSize"] == 2
    K = config.opencv_matrix(s, "LEFT.K")
    assert K.shape == (3, 3) and abs(K[0, 0] - 458.654) < 1e-9
    D = config.opencv_matrix(s, "LEFT.D")
    assert D.shape == (1, 5) and abs(D[0, 0] + 0.28) < 1e-9
    maps = config.euroc_rectify_maps(s)
    assert maps is not None
    (M1l, _), (M1r, _) = maps
    assert M1l.shape == (4, 6) and M1r.shape == (4, 6)
    assert config.euroc_rectify_maps({"Camera.fps": 20}) is None


def test_euroc_stereo_listing(tmp_path):
    from orbslam2_with_quadrics_tpu.utils import datasets

    for cam, stamps in (("cam0", [1, 2, 3]), ("cam1", [2, 3, 4])):
        d = tmp_path / "mav0" / cam / "data"
        d.mkdir(parents=True)
        with open(tmp_path / "mav0" / cam / "data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for t in stamps:
                f.write(f"{t}000000000,{t}.png\n")
    times, lefts, rights = datasets.load_euroc_stereo(str(tmp_path))
    # only the shared stamps 2, 3 survive
    np.testing.assert_allclose(times, [2.0, 3.0])
    assert lefts[0].endswith("cam0/data/2.png")
    assert rights[1].endswith("cam1/data/3.png")
