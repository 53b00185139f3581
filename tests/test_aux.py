"""Auxiliary-subsystem smoke tests: viz, logging, debug, profiling,
multihost helpers, flow-pretraining datasets (SURVEY.md §5 / §2.2 #9,
§2.6 #44)."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_flow_to_rgb_colorwheel():
    from deep_sfm_revisited_tpu.utils.viz import (
        flow_to_rgb, flow_to_rgb_raw, make_colorwheel,
    )

    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)          # Middlebury wheel (flow_viz.py:22)
    assert wheel.min() >= 0 and wheel.max() <= 255

    flow = np.stack(np.meshgrid(np.linspace(-5, 5, 16),
                                np.linspace(-3, 3, 12))[0:2], axis=-1)
    rgb = flow_to_rgb(flow)
    assert rgb.shape == (12, 16, 3) and rgb.dtype == np.uint8
    # distinct directions map to distinct hues
    assert len(np.unique(rgb.reshape(-1, 3), axis=0)) > 20

    raw = flow_to_rgb_raw(flow, max_value=10)
    assert raw.shape == (12, 16, 3) and raw.dtype == np.uint8


def test_depth_colormap():
    from deep_sfm_revisited_tpu.utils.viz import depth_to_colormap

    d = np.linspace(1.0, 80.0, 64).reshape(8, 8)
    img = depth_to_colormap(d)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(img, np.float64)).all()


def test_logger_and_metric_jsonl(tmp_path):
    from deep_sfm_revisited_tpu.utils.logging import (
        AverageMeter, MetricLogger, create_logger,
    )

    logger = create_logger(str(tmp_path), "unit")
    logger.info("hello")
    logs = [f for f in os.listdir(tmp_path) if f.endswith(".log")]
    assert logs and "hello" in open(tmp_path / logs[0]).read()

    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0

    ml = MetricLogger(str(tmp_path), name="train")
    ml.scalar("loss", 0.5, step=1)
    ml.scalar("loss", 0.25, step=2)
    ml._f.flush()
    lines = [json.loads(l) for l in
             open(tmp_path / "train" / "scalars.jsonl").read().splitlines()]
    assert lines[0] == {"tag": "loss", "value": 0.5, "step": 1}
    assert lines[1]["step"] == 2


def test_tb_events_crc32c_known_answer():
    """Castagnoli CRC known-answer vector; the masking constant is the
    TFRecord one — wrong either way and TensorBoard rejects the file."""
    from deep_sfm_revisited_tpu.utils.tb_events import crc32c, masked_crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # masking is rotate-right-15 + 0xa282ead8 (mod 2^32)
    c = crc32c(b"abc")
    assert masked_crc32c(b"abc") == ((((c >> 15) | (c << 17))
                                      + 0xA282EAD8) & 0xFFFFFFFF)


def test_tb_events_roundtrip(tmp_path):
    from deep_sfm_revisited_tpu.utils.tb_events import (
        TBEventWriter,
        read_events,
    )

    w = TBEventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.5, 1)
    w.add_scalar("train/loss", 0.25, 2)
    w.add_scalar("val/abs_rel", 0.055, 2)
    w.add_scalar("train/loss", 0.1, 100000)  # multi-byte varint step
    w.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    evs = read_events(str(tmp_path / files[0]))  # verifies both CRCs
    assert evs[0]["file_version"] == "brain.Event:2"
    scalars = [(e["tag"], e["value"], e["step"]) for e in evs[1:]]
    assert scalars[0] == ("train/loss", 0.5, 1)
    assert scalars[1] == ("train/loss", 0.25, 2)
    assert scalars[2][0] == "val/abs_rel"
    assert abs(scalars[2][1] - 0.055) < 1e-6
    # the reader's varint decode must carry the 7-bit shift (a step or
    # length >= 128 decodes wrong otherwise — round-4 reader fix)
    assert scalars[3][2] == 100000


def test_tb_image_events_roundtrip(tmp_path):
    """Image summaries (round-3 missing #1): the hand-rolled PNG encoder
    must produce a spec-conformant PNG (imageio decodes it back
    bit-exactly) and add_image must write an Event TensorBoard can load
    (tag + Summary.Image{h, w, colorspace, png})."""
    import io

    from imageio.v2 import imread

    from deep_sfm_revisited_tpu.utils.tb_events import (
        TBEventWriter,
        encode_png,
        read_events,
    )

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    # PNG round-trip through an independent decoder
    np.testing.assert_array_equal(
        imread(io.BytesIO(encode_png(rgb))), rgb)
    np.testing.assert_array_equal(
        imread(io.BytesIO(encode_png(gray))), gray)

    w = TBEventWriter(str(tmp_path))
    w.add_image("train/flow", rgb, 7)
    w.add_scalar("train/loss", 0.5, 7)
    w.close()
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    evs = read_events(str(tmp_path / files[0]))  # verifies CRCs
    img_evs = [e for e in evs if "image" in e]
    assert len(img_evs) == 1
    ev = img_evs[0]
    assert ev["tag"] == "train/flow" and ev["step"] == 7
    assert (ev["image"]["height"], ev["image"]["width"],
            ev["image"]["colorspace"]) == (17, 23, 3)
    np.testing.assert_array_equal(
        imread(io.BytesIO(ev["image"]["png"])), rgb)


def test_metric_logger_image_writes_png_and_tb(tmp_path):
    from imageio.v2 import imread

    from deep_sfm_revisited_tpu.utils.logging import MetricLogger
    from deep_sfm_revisited_tpu.utils.tb_events import read_events

    img = np.arange(12 * 8 * 3, dtype=np.uint8).reshape(12, 8, 3)
    ml = MetricLogger(str(tmp_path), name="train")
    ml.image("test/depth", img, 4)
    ml.close()
    base = tmp_path / "train"
    np.testing.assert_array_equal(imread(base / "test_depth_4.png"), img)
    files = [f for f in os.listdir(base) if "tfevents" in f]
    evs = read_events(str(base / files[0]))
    img_evs = [e for e in evs if "image" in e]
    assert len(img_evs) == 1 and img_evs[0]["tag"] == "test/depth"


def test_metric_logger_writes_tfevents(tmp_path):
    from deep_sfm_revisited_tpu.utils.logging import MetricLogger
    from deep_sfm_revisited_tpu.utils.tb_events import read_events

    ml = MetricLogger(str(tmp_path), name="train")
    ml.scalars({"loss": 1.5, "depth_out": 0.7}, step=3)
    ml.close()
    files = [f for f in os.listdir(tmp_path / "train") if "tfevents" in f]
    assert len(files) == 1
    evs = read_events(str(tmp_path / "train" / files[0]))
    tags = {e.get("tag") for e in evs}
    assert {"loss", "depth_out"} <= tags
    assert all(e["step"] == 3 for e in evs if e.get("tag"))


def test_debug_guard_and_check_finite():
    from deep_sfm_revisited_tpu.utils.debug import check_finite, guard

    check_finite({"a": jnp.ones(3)}, "ok")  # no raise
    with pytest.raises(Exception):
        check_finite({"a": jnp.array([1.0, jnp.nan])}, "bad")
    x, bad = guard(jnp.array([1.0, jnp.inf]))
    assert np.isfinite(np.asarray(x)).all()
    assert bool(bad)


def test_stage_times():
    from deep_sfm_revisited_tpu.utils.profiling import StageTimes

    st = StageTimes()
    for _ in range(2):
        with st.stage("warp", result=None):
            jnp.ones(8).block_until_ready()
    summary = st.summary()
    assert "warp" in summary and st.counts["warp"] == 2
    assert "warp=" in repr(st)


def test_throughput_harness():
    """The scan-protocol throughput helper: one program, distinct items,
    returns a sane per-item time and actually runs the function."""
    from deep_sfm_revisited_tpu.utils.profiling import throughput

    calls = []

    def fn(x):
        calls.append(1)  # traced once (scan), not per item
        return x @ x

    xs = jnp.stack([jnp.eye(16) * (i + 1) for i in range(4)])
    dt = throughput(fn, xs, reps=2, warmup=1)
    assert dt > 0
    # traced (scan traces the body a couple of times), never re-executed
    # per item or per rep: 4 items x 3 runs would be 12 python calls
    assert len(calls) <= 3


def test_multihost_single_process_helpers():
    from deep_sfm_revisited_tpu.parallel.multihost import host_shard_info

    info = host_shard_info()
    assert info["shard_id"] == 0 and info["num_shards"] == 1


def _write_png(path, h, w, seed=0):
    from PIL import Image

    Image.fromarray(
        (np.random.RandomState(seed).rand(h, w, 3) * 255).astype(np.uint8)
    ).save(str(path))


def test_kitti_flow_dataset_on_disk(tmp_path):
    """KITTIFlow over a synthetic on-disk tree: pairs + sparse 16-bit GT
    round-trip (≙ models/RAFT/core/datasets.py KITTI)."""
    from deep_sfm_revisited_tpu.data.flow_datasets import KITTIFlow
    from deep_sfm_revisited_tpu.data.flow_io import (
        read_flow_kitti, write_flow_kitti,
    )

    root = tmp_path / "training"
    (root / "image_2").mkdir(parents=True)
    (root / "flow_occ").mkdir()
    h, w = 40, 56
    for i in range(2):
        _write_png(root / "image_2" / f"{i:06d}_10.png", h, w, seed=2 * i)
        _write_png(root / "image_2" / f"{i:06d}_11.png", h, w, seed=2 * i + 1)
        flow = np.random.RandomState(i).uniform(-5, 5, (h, w, 2)).astype(np.float32)
        valid = np.ones((h, w), bool)
        write_flow_kitti(str(root / "flow_occ" / f"{i:06d}_10.png"), flow,
                         valid)

    # the 16-bit KITTI encoding round-trips to 1/64 px
    f2, v2 = read_flow_kitti(str(root / "flow_occ" / "000000_10.png"))
    ref = np.random.RandomState(0).uniform(-5, 5, (h, w, 2)).astype(np.float32)
    np.testing.assert_allclose(f2, ref, atol=1.0 / 32)

    ds = KITTIFlow(str(tmp_path), split="training", augment=False)
    assert len(ds) == 2
    s = ds[0]
    assert s["ref"].shape == (h, w, 3) and s["flow_gt"].shape == (h, w, 2)
    assert s["flow_valid"].shape == (h, w)
    assert np.abs(s["ref"]).max() <= 1.0


def test_combined_dataset_mixing():
    from deep_sfm_revisited_tpu.data.flow_datasets import (
        CombinedDataset, FlowDataset,
    )

    class Tiny(FlowDataset):
        def __init__(self, val):
            super().__init__(None)
            self.val = val
            self.image_list = [("a", "b")] * 4

        def __getitem__(self, i, rng=None):
            return {"ref": np.full((4, 4, 3), self.val, np.float32)}

    mix = CombinedDataset([Tiny(1.0), Tiny(2.0)], weights=[1, 3])
    assert len(mix) == 16  # 4*1 + 4*3 weighted copies
    vals = {float(mix[i]["ref"][0, 0, 0]) for i in range(len(mix))}
    assert vals == {1.0, 2.0}
