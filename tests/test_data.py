"""Data-pipeline tests over a synthetic on-disk KITTI-odometry miniature."""

import os

import numpy as np
import pytest

from deep_sfm_revisited_tpu.data import (
    BatchLoader,
    Compose,
    KittiVODataset,
    Normalize,
    RandomCrop,
    compute_delta_rt,
)
from deep_sfm_revisited_tpu.data.loader import collate, pad_to_multiple
from deep_sfm_revisited_tpu.data.transforms import (
    CenterCrop,
    RandomHorizontalFlip,
    RandomZoom,
)
from deep_sfm_revisited_tpu.data.velodyne import project_depth


@pytest.fixture(scope="module")
def kitti_vo_root(tmp_path_factory):
    """Miniature odometry tree: 2 test sequences x 4 frames of 64x96."""
    from imageio.v2 import imwrite

    root = tmp_path_factory.mktemp("kitti_vo")
    rng = np.random.default_rng(0)
    for seq in (9, 10):
        img_dir = root / "sequences" / f"{seq:02d}" / "image_2"
        os.makedirs(img_dir)
        depth_dir = root / "RealDepth" / f"{seq:02d}" / "velodyne"
        os.makedirs(depth_dir)
        poses = []
        for i in range(4):
            img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
            imwrite(img_dir / f"{i:06d}.png", img)
            depth = (rng.uniform(0, 40, (64, 96)) * 256).astype(np.uint16)
            imwrite(depth_dir / f"{i:06d}.png", depth)
            t = np.array([0.1 * i, 0.0, 1.2 * i])
            pose = np.concatenate([np.eye(3), t[:, None]], axis=1)
            poses.append(pose.reshape(-1))
        np.savetxt(_posefile(root, seq), np.stack(poses))
        with open(root / "sequences" / f"{seq:02d}" / "calib.txt", "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("P2: 70 0 48 0 0 70 32 0 0 0 1 0\n")
    return str(root)


def _posefile(root, seq):
    os.makedirs(root / "poses", exist_ok=True)
    return root / "poses" / f"{seq:02d}.txt"


def test_compute_delta_rt_roundtrip():
    rng = np.random.default_rng(1)
    from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix
    import jax.numpy as jnp

    R1 = np.asarray(angle_to_matrix(jnp.asarray([0.1, 0.2, -0.1])))
    R2 = np.asarray(angle_to_matrix(jnp.asarray([-0.05, 0.15, 0.2])))
    p1 = np.concatenate([R1, rng.normal(size=(3, 1))], axis=1)
    p2 = np.concatenate([R2, rng.normal(size=(3, 1))], axis=1)
    d = compute_delta_rt(p1, p2)
    # X_w = P1 @ [X_1;1]; delta maps frame-2 coords consistently:
    # P2 @ [d^-1 x;1]... verify via world-point consistency instead:
    X1 = rng.normal(size=3)
    Xw = R1 @ X1 + p1[:, 3]
    X2 = R2.T @ (Xw - p2[:, 3])
    X2_from_delta = np.linalg.inv(
        np.vstack([d, [0, 0, 0, 1]])
    )[:3] @ np.concatenate([X1, [1.0]])
    np.testing.assert_allclose(X2, X2_from_delta, atol=1e-6)


def test_vo_dataset(kitti_vo_root):
    tf = Compose([CenterCrop((48, 80)), Normalize()])
    ds = KittiVODataset(kitti_vo_root, train=False, transform=tf)
    assert len(ds) == 8
    s = ds[0]
    assert s["ref"].shape == (48, 80, 3)
    assert s["depth_gt"].shape == (48, 80)
    assert s["intrinsics"].shape == (3, 3)
    assert s["pose_gt"].shape == (3, 4)
    assert abs(float(s["ref"].max())) <= 1.0
    # pair stride: pose translation magnitude ~ per-frame motion
    assert 0.5 < np.linalg.norm(s["pose_gt"][:, 3]) < 2.0


def test_vo_sequence_boundary(kitti_vo_root):
    ds = KittiVODataset(kitti_vo_root, train=False)
    # last frame of seq 9 must pair backwards, not into seq 10
    i, j = ds._pair_index(3)
    assert ds.frames[i][0] == ds.frames[j][0] == 9
    assert j == 2


def test_transforms_intrinsics_consistency():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 96, 3)).astype(np.float32)
    depth = rng.uniform(1, 40, (64, 96)).astype(np.float32)
    K = np.array([[70.0, 0, 48], [0, 70.0, 32], [0, 0, 1]], np.float32)

    imgs, deps, K2 = RandomZoom(1.15)([img, img], [depth, depth], K, rng)
    s = imgs[0].shape[0] / 64
    np.testing.assert_allclose(K2[1, 1] / K[1, 1], s, atol=0.02)

    imgs, deps, K3 = RandomCrop((48, 64))(imgs, deps, K2, rng)
    assert imgs[0].shape[:2] == (48, 64)
    assert K3[0, 2] <= K2[0, 2]

    imgs, deps, K4 = RandomHorizontalFlip(prob=1.1)(imgs, deps, K3, rng)
    np.testing.assert_allclose(K4[0, 2], 64 - 1 - K3[0, 2])


def test_pad_and_collate():
    a = np.ones((60, 90, 3), np.float32)
    p = pad_to_multiple(a, 32)
    assert p.shape == (64, 96, 3)
    np.testing.assert_allclose(p[59:, 89:], 1.0)  # replicate padding
    batch = collate(
        [{"ref": a, "intrinsics": np.eye(3, dtype=np.float32)}] * 3,
        pad_multiple=32,
    )
    assert batch["ref"].shape == (3, 64, 96, 3)
    assert batch["intrinsics"].shape == (3, 3, 3)


def test_batch_loader(kitti_vo_root):
    tf = Compose([CenterCrop((48, 80)), Normalize()])
    ds = KittiVODataset(kitti_vo_root, train=False, transform=tf)
    loader = BatchLoader(ds, batch_size=4, workers=2, pad_multiple=16,
                         shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["ref"].shape == (4, 48, 80, 3)
    assert batches[0]["pose_gt"].shape == (4, 3, 4)
    # sharded loader covers half the data
    half = BatchLoader(ds, batch_size=2, workers=1, pad_multiple=16,
                       shard_id=0, num_shards=2)
    assert len(list(half)) == 2


def test_sharded_loader_equal_lengths_no_tail_drop():
    """With N % num_shards != 0, every shard must still yield the same
    number of equally-shaped batches (wrap-around padding) and the union
    of shards must cover every dataset index — a silently dropped eval
    tail would bias multi-host validate metrics."""

    class Tiny:
        def __len__(self):
            return 7

        def __getitem__(self, i, rng=None):
            return {"ref": np.full((8, 8, 3), i, np.float32),
                    "idx": np.asarray(i, np.int64)}

    ds = Tiny()
    shards = [
        BatchLoader(ds, batch_size=2, workers=1, shuffle=False,
                    pad_multiple=0, drop_last=False,
                    shard_id=s, num_shards=3)
        for s in range(3)
    ]
    outs = [list(s) for s in shards]
    assert [len(o) for o in outs] == [len(shards[0])] * 3
    for bi in range(len(outs[0])):
        assert len({o[bi]["ref"].shape for o in outs}) == 1
    seen = {int(i) for o in outs for b in o for i in np.atleast_1d(b["idx"])}
    assert seen == set(range(7))
    # the wrap-around duplicates carry sample_valid=0 so sharded eval
    # excludes them from the metric sums (ADVICE r3: double-counted
    # head samples biased multi-host validate); exactly 7 of the 9
    # padded slots are real, and the flags match the duplicated indices
    valid_by_idx = {}
    for o in outs:
        for b in o:
            assert "sample_valid" in b
            for i, v in zip(np.atleast_1d(b["idx"]),
                            np.atleast_1d(b["sample_valid"])):
                valid_by_idx.setdefault(int(i), []).append(float(v))
    total_valid = sum(v for vs in valid_by_idx.values() for v in vs)
    assert total_valid == 7.0
    for i in range(7):
        assert max(valid_by_idx[i]) == 1.0  # every index counted ONCE
    # single-shard loaders stay unchanged (no mask key)
    solo = list(BatchLoader(ds, batch_size=2, workers=1, shuffle=False,
                            pad_multiple=0, drop_last=False))
    assert all("sample_valid" not in b for b in solo)


def test_velodyne_projection():
    # one velodyne point 10 m ahead (velo x-forward) -> principal point
    P = np.array([[70.0, 0, 48, 0], [0, 70.0, 32, 0], [0, 0, 1, 0]])
    R = np.eye(4)
    # standard velo->cam axis permutation: cam (x,y,z) = (-velo_y, -velo_z, velo_x)
    T = np.array(
        [[0.0, -1.0, 0.0, 0.0],
         [0.0, 0.0, -1.0, 0.0],
         [1.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 1.0]],
    )
    pts = np.array([[10.0, 0.0, 0.0, 1.0]])
    depth = project_depth(pts, P, R, T, (64, 96))
    ys, xs = np.nonzero(depth)
    assert len(ys) == 1
    # principal point (48, 32) with the reference's -1 rounding offset
    assert abs(int(xs[0]) - 47) <= 1 and abs(int(ys[0]) - 31) <= 1
    np.testing.assert_allclose(depth[ys[0], xs[0]], 10.0)


@pytest.fixture(scope="module")
def kitti_raw_root(tmp_path_factory):
    """Miniature KITTI-raw tree: one drive with images, velodyne scans,
    OXTS records and calibration — exercises the no-precomputed-dicts
    path (OXTS pose parsing + on-the-fly velodyne projection)."""
    from imageio.v2 import imwrite

    root = tmp_path_factory.mktemp("kitti_raw")
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    folder = f"{date}/{drive}"
    rng = np.random.default_rng(0)

    img_dir = root / folder / "image_02" / "data"
    velo_dir = root / folder / "velodyne_points" / "data"
    oxts_dir = root / folder / "oxts" / "data"
    for d in (img_dir, velo_dir, oxts_dir):
        os.makedirs(d)

    # calibration: P2 focal 70, principal point (48, 32); standard axis swap
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write("P_rect_02: 70 0 48 0 0 70 32 0 0 0 1 0\n")
    with open(root / date / "calib_velo_to_cam.txt", "w") as f:
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")

    for i in range(4):
        imwrite(img_dir / f"{i:010d}.png",
                rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
        # forward points (velo x in [2, 40])
        pts = np.concatenate(
            [rng.uniform(2, 40, (500, 1)), rng.uniform(-5, 5, (500, 2)),
             np.ones((500, 1))], axis=1
        ).astype(np.float32)
        pts.tofile(velo_dir / f"{i:010d}.bin")
        # oxts: lat lon alt roll pitch yaw + 24 zeros
        rec = np.zeros(30)
        rec[0] = 49.0 + i * 1e-6   # ~0.11 m north per frame
        rec[1] = 8.43
        rec[2] = 110.0
        rec[5] = 0.02 * i          # yaw
        np.savetxt(oxts_dir / f"{i:010d}.txt", rec[None])

    with open(root / "train_files.txt", "w") as f:
        for i in (1, 2):
            f.write(f"{folder} {i} l\n")
    with open(root / "test_files.txt", "w") as f:
        f.write(f"{folder} 2 l\n")
    return str(root)


def test_kitti_raw_dataset(kitti_raw_root):
    from deep_sfm_revisited_tpu.data import KittiRawDataset

    tf = Compose([Normalize()])
    ds = KittiRawDataset(kitti_raw_root, train=True, transform=tf,
                         random_offset=False, random_fw_bw=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["ref"].shape == (64, 96, 3)
    assert s["intrinsics"][0, 0] == 70.0
    # velodyne projection produced sparse positive depths
    nz = s["depth_gt"] > 0
    assert 0 < nz.sum() < s["depth_gt"].size
    assert float(s["depth_gt"][nz].min()) > 1.0
    # OXTS pose chain: ~0.11 m between consecutive frames, finite rotation
    t_norm = np.linalg.norm(s["pose_gt"][:, 3])
    assert 0.01 < t_norm < 1.0
    assert np.all(np.isfinite(s["pose_gt"]))


def test_kitti_raw_test_split(kitti_raw_root):
    from deep_sfm_revisited_tpu.data import KittiRawDataset

    ds = KittiRawDataset(kitti_raw_root, train=False)
    assert len(ds) == 1
    s = ds[0]
    assert s["pose_gt"].shape == (3, 4)


def test_kitti_raw_filtered_pair_list(kitti_raw_root):
    """FILTERED_PAIR: eval target frames come from the curated
    val_img1_list_697.npy when it exists in the dataset root
    (≙ KITTI_loader.py:310-317,338-340, ref default True); absent list
    falls back to neighbour pairing; filtered_pair=False ignores it."""
    import os

    from deep_sfm_revisited_tpu.data import KittiRawDataset

    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    lst = np.array([f"{folder}/image_02/data/0000000000.png"], dtype=object)
    lp = os.path.join(kitti_raw_root, "val_img1_list_697.npy")
    np.save(lp, lst)
    try:
        ds = KittiRawDataset(kitti_raw_root, train=False)
        assert ds.val_img1_list is not None
        s = ds[0]
        # curated target is frame 0 (the default neighbour would be 1);
        # GT pose spans frames 0->2: ~2x the one-step translation
        one_step = np.linalg.norm(
            KittiRawDataset(kitti_raw_root, train=False,
                            filtered_pair=False)[0]["pose_gt"][:, 3]
        )
        assert np.linalg.norm(s["pose_gt"][:, 3]) > 1.5 * one_step
        # knob off -> neighbour pairing even with the list present
        ds_off = KittiRawDataset(kitti_raw_root, train=False,
                                 filtered_pair=False)
        assert ds_off.val_img1_list is None
    finally:
        os.remove(lp)
    # list absent -> graceful fallback (the reference would crash)
    ds2 = KittiRawDataset(kitti_raw_root, train=False)
    assert ds2.val_img1_list is None
    assert ds2[0]["pose_gt"].shape == (3, 4)


class TestLidarExport:
    """Offline RealDepth exporter (≙ lidar_to_depth.py:14-52)."""

    @staticmethod
    def _tree(tmp_path):
        import numpy as np
        from imageio.v2 import imwrite

        root = tmp_path / "vo"
        seq_dir = root / "sequences" / "00"
        (seq_dir / "velodyne").mkdir(parents=True)
        (seq_dir / "image_2").mkdir(parents=True)
        # camera frame sets the export size
        imwrite(seq_dir / "image_2" / "000000.png",
                np.zeros((48, 64, 3), np.uint8))
        with open(seq_dir / "calib.txt", "w") as f:
            f.write("P2: 40 0 32 0 0 40 24 0 0 0 1 0\n")
            # velodyne x-forward -> camera z-forward axis swap
            f.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 0\n")
        rng = np.random.default_rng(0)
        pts = np.concatenate([
            rng.uniform(2, 30, (500, 1)),      # x forward
            rng.uniform(-8, 8, (500, 2)),
            rng.random((500, 1)),              # reflectance (ignored)
        ], axis=1).astype(np.float32)
        pts.tofile(seq_dir / "velodyne" / "000000.bin")
        return str(root), pts

    def test_matches_reference_formula(self, tmp_path):
        import numpy as np
        from imageio.v2 import imread

        from deep_sfm_revisited_tpu.data import velodyne as velo

        root, pts = self._tree(tmp_path)
        n = velo.export_sequence(root, "00")
        assert n == 1
        got = imread(
            os.path.join(root, "RealDepth", "00", "velodyne", "000000.png"))
        assert got.dtype == np.uint16 and got.shape == (48, 64)

        # independent transcription of lidar_to_depth.py:30-46
        P2 = np.array([[40, 0, 32, 0], [0, 40, 24, 0], [0, 0, 1, 0]], float)
        Tr = np.eye(4)
        Tr[:3] = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], float)
        hom = pts.astype(np.float64).copy()
        hom[:, 3] = 1.0
        res = (P2 @ Tr) @ hom.T
        uv = res[:2] / res[2]
        z = res[2]
        ok = ((uv[0] > 0) & (np.round(uv[0]) < 64) & (uv[1] > 0)
              & (np.round(uv[1]) < 48) & (z > 0) & (z < 1000))
        idx = np.round(uv[:, ok]).astype("uint32")
        ref = np.zeros((48, 64))
        ref[idx[1], idx[0]] = z[ok]
        ref16 = (ref * 256)
        ref16[(ref16 < 0) | (ref16 > 65535)] = 0
        np.testing.assert_array_equal(got, ref16.astype(np.uint16))
        assert (got > 0).sum() > 50  # scene actually projects into frame

    def test_exported_tree_feeds_vo_dataset(self, tmp_path):
        """Export -> KittiVODataset reads the depth back in metres."""
        import numpy as np
        from imageio.v2 import imwrite

        from deep_sfm_revisited_tpu.data import velodyne as velo
        from deep_sfm_revisited_tpu.data.kitti import load_depth_png

        root, _ = self._tree(tmp_path)
        velo.export_sequence(root, "00")
        d = load_depth_png(
            os.path.join(root, "RealDepth", "00", "velodyne", "000000.png"))
        assert d is not None and d.shape == (48, 64)
        nz = d[d > 0]
        assert nz.size > 50 and (nz > 1.9).all() and (nz < 31).all()
