"""Host data-pipeline feed rate: can the loader keep the chip busy?

The chip consumes 6.5 pairs/s at eval / 4.85 at training. Measure the
threaded BatchLoader on a synthetic KITTI-RAW-like dataset (full-size
PNG decode + paired transforms + collate/pad) — pure host CPU.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from deep_sfm_revisited_tpu.data.loader import BatchLoader


class SyntheticPairs:
    """Mimics the per-item cost of the KITTI loaders: PNG decode of two
    ~370x1224 images + float conversion + normalize."""

    def __init__(self, n=64):
        import cv2

        rng = np.random.default_rng(0)
        img = (rng.random((370, 1224, 3)) * 255).astype(np.uint8)
        ok, self.png = cv2.imencode(".png", img)
        assert ok
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        import cv2

        ref = cv2.imdecode(self.png, cv2.IMREAD_COLOR).astype(np.float32)
        tgt = cv2.imdecode(self.png, cv2.IMREAD_COLOR).astype(np.float32)
        ref = ref / 127.5 - 1.0
        tgt = tgt / 127.5 - 1.0
        return {
            "ref": ref,
            "target": tgt,
            "intrinsics": np.eye(3, dtype=np.float32),
            "pose_gt": np.eye(3, 4, dtype=np.float32),
            "depth_gt": np.zeros((370, 1224), np.float32),
        }


ds = SyntheticPairs(64)
for workers in (4, 8):
    loader = BatchLoader(ds, batch_size=1, workers=workers, prefetch=4,
                         pad_multiple=128, shuffle=False)
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["ref"].shape[0]
    dt = time.perf_counter() - t0
    print(f"workers={workers}: {n / dt:.1f} pairs/s host feed "
          f"({dt / n * 1000:.1f} ms/pair)", flush=True)
