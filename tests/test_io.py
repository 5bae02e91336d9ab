"""IO tests: reference-format serialization, KITTI pose files, synthetic
sequence, checkpoint round-trip."""

import os

import numpy as np

from visualslam_tpu.io.kitti import SyntheticSequence
from visualslam_tpu.io.serialization import (
    load_descriptors_dat,
    load_kitti_poses,
    save_descriptors_dat,
    save_kitti_poses,
)


def test_descriptor_dat_roundtrip(tmp_path, rng):
    d = rng.random((37, 128)).astype(np.float32)
    p = str(tmp_path / "desc.dat")
    save_descriptors_dat(p, d)
    # header: 3 int32 then raw float32 (ref Diff_of_Gauss.cpp:845-848)
    raw = np.fromfile(p, np.int32, count=3)
    assert raw[0] == 37 and raw[1] == 128
    back = load_descriptors_dat(p)
    np.testing.assert_array_equal(back, d)


def test_descriptor_dat_accepts_reference_quirk(tmp_path, rng):
    """The reference writes frontSize = sizeof(std::vector<float>) = 24."""
    import struct

    d = rng.random((3, 128)).astype(np.float32)
    p = str(tmp_path / "ref.dat")
    with open(p, "wb") as f:
        f.write(struct.pack("<iii", 3, 128, 24))
        f.write(d.tobytes())
    np.testing.assert_array_equal(load_descriptors_dat(p), d)


def test_kitti_poses_roundtrip(tmp_path, rng):
    poses = rng.random((11, 3, 4))
    p = str(tmp_path / "poses.txt")
    save_kitti_poses(p, poses)
    back = load_kitti_poses(p)
    np.testing.assert_allclose(back, poses, rtol=1e-6)


def test_synthetic_sequence_properties():
    seq = SyntheticSequence(num_frames=5, h=120, w=160, n_dots=300)
    assert len(seq) == 5
    f0 = seq.frame(0)
    assert f0.shape == (120, 160)
    assert 0.0 <= f0.min() and f0.max() <= 1.0
    assert f0.std() > 0.02, "synthetic frames must have texture"
    info = seq.info()
    assert info.gt_poses.shape == (5, 3, 4)
    # frames actually differ (camera moves)
    assert np.abs(seq.frame(2) - f0).max() > 0.1


def test_checkpoint_roundtrip(tmp_path, rng):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_tracker import CFG, INTR, SyntheticScene

    from visualslam_tpu.slam.checkpoint import load_checkpoint, save_checkpoint
    from visualslam_tpu.slam.tracker import Tracker

    scene = SyntheticScene(rng)
    t1 = Tracker(CFG, INTR)
    for k in range(8):
        feats, _ = scene.features(k)
        t1.process_features(feats, k)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, t1)

    t2 = Tracker(CFG, INTR)
    load_checkpoint(p, t2)
    np.testing.assert_array_equal(t2.map.kf_valid, t1.map.kf_valid)
    np.testing.assert_allclose(t2.map.X, t1.map.X)
    assert len(t2.frames) == len(t1.frames)

    # both trackers must continue identically
    for k in range(8, 12):
        feats, _ = scene.features(k)
        r1 = t1.process_features(feats, k)
        r2 = t2.process_features(feats, k)
        np.testing.assert_allclose(r1.t, r2.t, atol=1e-5)
