"""KITTI datasets: odometry (VO) and raw (Eigen splits).

Rebuild of `KITTI_loader.py`:
  * `KittiVODataset` ≙ `KITTIVOLoaderGT` (`KITTI_loader.py:88`): odometry
    sequences, train 00-08 / test 09-10 (`:93-94`), frame pairs at SKIP
    offset with sequence-boundary fallback (`:190-213`), GT relative pose
    via `compute_deltaRT` (`:76-84`), P2 intrinsics (`:52-61`), uint16/256
    depth PNGs + positive-mask (`:32-50`);
  * `KittiRawDataset` ≙ `KITTIRAWLoaderGT` (`KITTI_loader.py:270`): Eigen
    split file lists (697 test / 652 benchmark, `:283-301`), random pair
    offset -1/-2 and fw/bw flip (`:327-331`), official GT depth PNG or
    on-the-fly velodyne projection (`:374-384`), calib/pose from
    precomputed dicts when present or parsed from the raw recordings
    (OXTS) otherwise — the reference requires preprocessed .npy dicts;
    we support both so a vanilla KITTI-raw download works.

Datasets return plain numpy sample dicts:
  ref, target (H, W, 3) float32 in [-1, 1] after transforms;
  intrinsics (3, 3); pose_gt (3, 4) ref->target; depth_gt (H, W).
The "backward" training orientation of the reference (`main.py:339-344`:
ref = later frame, pose = ref->earlier) is preserved.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from deep_sfm_revisited_tpu.data import velodyne as velo


def _imread(path: str) -> np.ndarray:
    if path.endswith(".png"):
        # GIL-free libpng fast path (native/dsfm_native.cpp png_decode_rgb8)
        from deep_sfm_revisited_tpu.data import native

        with open(path, "rb") as f:
            data = f.read()
        im = native.decode_png_rgb8(data)
        if im is not None:
            return im
    from imageio.v2 import imread

    im = imread(path)
    if im.ndim == 2:
        im = np.stack([im] * 3, axis=-1)
    return np.asarray(im[..., :3], dtype=np.uint8)


def load_depth_png(path: str) -> Optional[np.ndarray]:
    """uint16 PNG / 256 -> metres (≙ `disparity_loader_png`,
    KITTI_loader.py:31-39). Returns None when absent."""
    if not os.path.exists(path):
        return None
    from deep_sfm_revisited_tpu.data import native

    with open(path, "rb") as f:
        data = f.read()
    raw = native.decode_png_gray16(data)
    if raw is not None:
        return raw.astype(np.float32) / 256.0
    from imageio.v2 import imread

    return np.asarray(imread(path), dtype=np.float32) / 256.0


def load_calib_intrinsics(path: str) -> np.ndarray:
    """P2 intrinsics from an odometry calib.txt (≙ `load_intrinsics`,
    KITTI_loader.py:51-61)."""
    with open(path) as f:
        for line in f:
            if line.startswith("P2"):
                vals = np.array(
                    [float(x) for x in line.split(":", 1)[1].split()]
                )
                return vals.reshape(3, 4)[:, :3].astype(np.float32)
    raise ValueError(f"no P2 entry in {path}")


def load_vo_poses(path: str) -> np.ndarray:
    """(N, 3, 4) camera-to-world poses from a KITTI odometry poses file
    (≙ `load_poses`, KITTI_loader.py:63-75)."""
    rows = np.loadtxt(path, dtype=np.float64)
    return rows.reshape(-1, 3, 4).astype(np.float32)


def compute_delta_rt(ps1: np.ndarray, ps2: np.ndarray) -> np.ndarray:
    """Relative transform taking frame-1 camera coords to frame-2's.

    Matches `compute_deltaRT` (KITTI_loader.py:76-84): with
    cam-to-world poses P1, P2, returns [R1^T R2 | R1^T (t2 - t1)].
    """
    R1, t1 = ps1[:3, :3], ps1[:3, 3:]
    R2, t2 = ps2[:3, :3], ps2[:3, 3:]
    return np.concatenate((R1.T @ R2, R1.T @ (t2 - t1)), axis=1).astype(
        np.float32
    )


class KittiVODataset:
    """KITTI odometry pairs (sequences 00-08 train / 09-10 test)."""

    TRAIN_SEQS = tuple(range(9))
    TEST_SEQS = (9, 10)

    def __init__(
        self,
        root: str,
        train: bool = True,
        skip: int = 1,
        transform=None,
        depth_subdir: str = "RealDepth",
    ):
        self.root = root
        self.train = train
        self.skip = skip
        self.transform = transform
        self.depth_subdir = depth_subdir
        # tolerate partial downloads: only sequences present on disk
        seqs = [
            s
            for s in (self.TRAIN_SEQS if train else self.TEST_SEQS)
            if os.path.isdir(os.path.join(root, "sequences", f"{s:02d}"))
        ]
        self.frames: List[Tuple[int, str]] = []
        for seq in seqs:
            img_dir = os.path.join(root, "sequences", f"{seq:02d}", "image_2")
            for p in sorted(glob.glob(os.path.join(img_dir, "*.png"))):
                self.frames.append((seq, p))
        self.poses = {
            seq: load_vo_poses(os.path.join(root, "poses", f"{seq:02d}.txt"))
            for seq in seqs
            if os.path.exists(os.path.join(root, "poses", f"{seq:02d}.txt"))
        }
        self.calib = {
            seq: load_calib_intrinsics(
                os.path.join(root, "sequences", f"{seq:02d}", "calib.txt")
            )
            for seq in seqs
        }
        # presaved predicted poses (≙ KITTI_loader.py:121-125): stacked
        # per-sequence arrays pred_poses/{seq}_fw.npy / _bw.npy indexed by
        # the pair's EARLIER frame id; absent -> zero placeholders
        # (≙ KITTI_loader.py:231-237) and the model's online pose path
        self.pred_poses_fw = {}
        self.pred_poses_bw = {}
        for seq in seqs:
            fw = os.path.join(root, "pred_poses", f"{seq:02d}_fw.npy")
            bw = os.path.join(root, "pred_poses", f"{seq:02d}_bw.npy")
            if os.path.exists(fw) and os.path.exists(bw):
                self.pred_poses_fw[seq] = np.load(fw)
                self.pred_poses_bw[seq] = np.load(bw)

    def __len__(self):
        return len(self.frames)

    def _pair_index(self, index: int) -> Tuple[int, int]:
        """Partner frame at +skip, falling back to -skip at sequence ends
        (≙ KITTI_loader.py:190-213)."""
        seq, _ = self.frames[index]
        j = index + self.skip
        if j >= len(self.frames) or self.frames[j][0] != seq:
            j = index - self.skip
        assert self.frames[j][0] == seq
        return index, j

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        i, j = self._pair_index(index)
        seq, p1 = self.frames[i]
        _, p2 = self.frames[j]
        id1 = int(os.path.splitext(os.path.basename(p1))[0])
        id2 = int(os.path.splitext(os.path.basename(p2))[0])

        img1 = _imread(p1).astype(np.float32)
        img2 = _imread(p2).astype(np.float32)
        K = self.calib[seq].copy()

        pose_1 = self.poses[seq][id1]
        pose_2 = self.poses[seq][id2]
        # backward orientation: ref = frame 2 (later), pose ref->target
        pose_bw = compute_delta_rt(pose_1, pose_2)

        depth_path = os.path.join(
            self.root, self.depth_subdir, f"{seq:02d}", "velodyne",
            os.path.basename(p2),
        )
        depth = load_depth_png(depth_path)
        if depth is None:
            depth = np.zeros(img2.shape[:2], np.float32)

        # presaved predicted poses, indexed by the pair's first frame id
        # (≙ KITTI_loader.py:231-237; zero placeholder when absent)
        if seq in self.pred_poses_fw and id1 < len(self.pred_poses_fw[seq]):
            pred_fw = np.asarray(self.pred_poses_fw[seq][id1], np.float32)
            pred_bw = np.asarray(self.pred_poses_bw[seq][id1], np.float32)
        else:
            pred_fw = np.zeros((3, 4), np.float32)
            pred_bw = np.zeros((3, 4), np.float32)

        images, depths, K = [img2, img1], [depth, depth], K
        if self.transform is not None:
            images, depths, K = self.transform(images, depths, K, rng)
        return {
            "ref": images[0],
            "target": images[1],
            "intrinsics": K.astype(np.float32),
            "pose_gt": pose_bw,
            "pred_pose": pred_bw,      # same ref->target orientation as pose_gt
            "pred_pose_fw": pred_fw,
            "depth_gt": depths[0].astype(np.float32),
            "seq": seq,
            "frame_id": id2,
            "frame_id1": id1,
        }


class KittiRawDataset:
    """KITTI raw Eigen-split pairs for depth training/eval."""

    def __init__(
        self,
        root: str,
        train: bool = True,
        kitti_697: bool = True,
        gt_depth_dir: Optional[str] = None,
        transform=None,
        random_offset: bool = True,
        random_fw_bw: bool = True,
        eigen_sfm: bool = False,
        filtered_pair: bool = True,
    ):
        self.root = root
        self.train = train
        self.transform = transform
        self.random_offset = random_offset and train
        self.random_fw_bw = random_fw_bw and train
        self.gt_depth_dir = gt_depth_dir

        split = (
            "train_files.txt"
            if train
            else ("test_files.txt" if kitti_697 else "test_files_benchmark.txt")
        )
        with open(os.path.join(root, split)) as f:
            self.items = [ln.split() for ln in f.read().splitlines() if ln]
        if eigen_sfm and not train:
            # Eigen-SfM subset: boolean mask over the 652-image benchmark
            # split selecting the 256 SfM-compatible samples
            # (≙ KITTI_loader.py:296-301)
            assert not kitti_697, "EIGEN_SFM requires the benchmark split"
            mask = np.load(os.path.join(root, "eigen_sfm_mask.npy"))
            idx = np.nonzero(np.asarray(mask).ravel())[0]
            self.items = [self.items[int(i)] for i in idx]

        # precomputed dicts when available (≙ KITTI_loader.py:303-304)
        self.calib_dict = self._try_load_dict("kitti_raw_calib_dict.npy")
        self.pose_dict = self._try_load_dict("kitti_raw_pose_dict.npy")

        # FILTERED_PAIR (ref default True, lib/config.py:85): at eval
        # time the TARGET frame comes from a curated per-sample path
        # list shipped in the dataset root (`val_img1_list_697.npy` /
        # `_652.npy`, ≙ KITTI_loader.py:310-317,338-340) rather than
        # the deterministic -1 neighbour. Unlike the reference (which
        # crashes on a missing list), we fall back to neighbour pairing
        # when the artifact is absent so golden/synthetic trees keep
        # working.
        self.val_img1_list = None
        if filtered_pair and not train:
            name = ("val_img1_list_697.npy" if kitti_697
                    else "val_img1_list_652.npy")
            p = os.path.join(root, name)
            if os.path.exists(p):
                lst = np.load(p, allow_pickle=True)
                if eigen_sfm and not kitti_697:
                    lst = [lst[int(i)] for i in idx]
                self.val_img1_list = list(lst)
                assert len(self.val_img1_list) == len(self.items), (
                    len(self.val_img1_list), len(self.items))

    def _try_load_dict(self, name):
        p = os.path.join(self.root, name)
        if os.path.exists(p):
            return np.load(p, allow_pickle=True).item()
        return None

    def __len__(self):
        return len(self.items)

    def _intrinsics(self, folder: str) -> np.ndarray:
        date = os.path.basename(os.path.dirname(folder))
        if self.calib_dict is not None and date in self.calib_dict:
            K = np.asarray(self.calib_dict[date], np.float32)
            return K[:, :3] if K.shape == (3, 4) else K
        P, _, _ = velo.velo_to_cam_transform(os.path.join(self.root, date))
        return P[:, :3].astype(np.float32)

    def _poses(self, folder: str):
        drive = os.path.basename(folder)
        if self.pose_dict is not None and drive in self.pose_dict:
            return np.asarray(self.pose_dict[drive])
        from deep_sfm_revisited_tpu.data.oxts import load_oxts_poses

        return load_oxts_poses(os.path.join(self.root, folder))

    def __getitem__(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        folder, frame_str = self.items[index][0], self.items[index][1]
        f2 = int(frame_str)

        offset = -1
        if self.random_offset and rng.random() > 0.7:
            offset = -2
        if self.random_fw_bw and rng.random() > 0.5:
            offset = -offset
        img_dir = os.path.join(self.root, folder, "image_02", "data")
        if self.val_img1_list is not None:
            # curated eval pair (≙ KITTI_loader.py:338-340)
            p1 = os.path.join(self.root, str(self.val_img1_list[index]))
        else:
            p1 = os.path.join(img_dir, f"{f2 + offset:010d}.png")
            if not os.path.exists(p1):
                p1 = os.path.join(img_dir, f"{f2 - offset:010d}.png")
        p2 = os.path.join(img_dir, f"{f2:010d}.png")
        f1 = int(os.path.splitext(os.path.basename(p1))[0])

        img1 = _imread(p1).astype(np.float32)
        img2 = _imread(p2).astype(np.float32)
        K = self._intrinsics(folder)

        poses = self._poses(folder)
        pose_bw = compute_delta_rt(poses[f1][:3], poses[f2][:3])

        depth = None
        if self.gt_depth_dir:
            depth = load_depth_png(
                os.path.join(
                    self.gt_depth_dir, os.path.basename(folder),
                    "proj_depth/groundtruth/image_02", f"{f2:010d}.png",
                )
            )
        if depth is None:
            date_dir = os.path.join(self.root, folder.split("/")[0])
            velo_path = os.path.join(
                self.root, folder, "velodyne_points/data", f"{f2:010d}.bin"
            )
            if os.path.exists(velo_path):
                depth = velo.generate_depth_map(
                    date_dir, velo_path, img2.shape[:2]
                )
            else:
                depth = np.zeros(img2.shape[:2], np.float32)

        # presaved predicted poses: per-frame [fw; bw] .npy in the
        # reference's pred_poses_fb layout (image_02 -> pred_poses_fb,
        # png -> npy; ≙ KITTI_loader.py:359-366, written by save_pose
        # main.py:686-692 / train/pose_eval.save_raw_pred_poses)
        fb_path = os.path.join(
            self.root, folder, "pred_poses_fb", f"{f2:010d}.npy"
        )
        if os.path.exists(fb_path):
            fb = np.load(fb_path).astype(np.float32)
            pred_fw, pred_bw = fb[0], fb[1]
        else:
            pred_fw = np.zeros((3, 4), np.float32)
            pred_bw = np.zeros((3, 4), np.float32)

        images, depths = [img2, img1], [depth, depth]
        if self.transform is not None:
            images, depths, K = self.transform(images, depths, K, rng)
        return {
            "ref": images[0],
            "target": images[1],
            "intrinsics": K.astype(np.float32),
            "pose_gt": pose_bw,
            "pred_pose": pred_bw,      # same ref->target orientation as pose_gt
            "pred_pose_fw": pred_fw,
            "depth_gt": depths[0].astype(np.float32),
            "index": index,
        }
