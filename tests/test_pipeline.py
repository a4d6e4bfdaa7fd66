"""Host pipeline + dataset composition tests (synthetic + on-disk fixtures)."""

import json
import os

import numpy as np
import pytest

from zeroshotvideoclassification_tpu.config import Config
from zeroshotvideoclassification_tpu.data.datasets import (
    build_datasets,
    clean_kinetics,
    get_hmdb,
    get_ucf101,
)
from zeroshotvideoclassification_tpu.data.pipeline import HostPipeline, device_batch


def _cfg(**kw):
    base = dict(dataset="synthetic", class_total=4, train_samples=16, bs=4,
                clip_len=4, canvas_hw=(192, 224))
    base.update(kw)
    return Config(**base)


def test_synthetic_datasets_are_zero_shot():
    cfg = _cfg()
    ds = build_datasets(cfg, None)
    train, test = ds["training"][0], ds["testing"][0]
    assert set(train.classes).isdisjoint(set(test.classes))
    assert train.class_embed.shape[1] == 300
    np.testing.assert_allclose(
        np.linalg.norm(test.class_embed, axis=1), 1.0, atol=1e-5)


def test_pipeline_shapes_and_determinism():
    cfg = _cfg()
    ds = build_datasets(cfg, None)
    table = ds["training"][0]
    p1 = list(HostPipeline(table, cfg, 4, seed=7))
    p2 = list(HostPipeline(table, cfg, 4, seed=7))
    assert len(p1) == len(p2) == (len(table) + 3) // 4
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(a.canvas, b.canvas)
        np.testing.assert_array_equal(a.x0, b.x0)
        np.testing.assert_array_equal(a.label, b.label)
    hb = p1[0]
    # h2d_window (default): the canvas ships only the crop's static
    # worst-case source window — ceil(112 * 192/128) + 2 = 170 per axis here
    assert hb.canvas.shape == (4, 4, 170, 170, 3)
    assert hb.weight.sum() == 4
    cfg_full = cfg.replace(h2d_window=False)
    hb_full = next(iter(HostPipeline(table, cfg_full, 4, seed=7)))
    assert hb_full.canvas.shape == (4, 4, 192, 224, 3)


def test_pipeline_epoch_reshuffles():
    cfg = _cfg()
    ds = build_datasets(cfg, None)
    table = ds["training"][0]
    pipe = HostPipeline(table, cfg, 4, seed=7)
    e1 = [b.label.copy() for b in pipe]
    e2 = [b.label.copy() for b in pipe]
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_pipeline_validation_order_stable_and_padded():
    cfg = _cfg()
    ds = build_datasets(cfg, None)
    table = ds["testing"][0]  # 16 samples, bs 5 -> last batch padded
    pipe = HostPipeline(table, cfg, 5, seed=0)
    batches = list(pipe)
    assert batches[-1].weight.sum() < 5  # zero-weight padding
    labels = np.concatenate([b.label[b.weight > 0] for b in batches])
    np.testing.assert_array_equal(labels, table.label_idx)


def test_device_batch_shapes():
    cfg = _cfg()
    ds = build_datasets(cfg, None)
    table = ds["training"][0]
    hb = next(iter(HostPipeline(table, cfg, 4, seed=0)))
    batch = device_batch(hb, table.n_clips, cfg.clip_len)
    assert batch["x"].shape == (4, 1, 4, 112, 112, 3)
    x = np.asarray(batch["x"])
    assert x.min() >= -0.5 - 1e-6 and x.max() <= 1e-6


def test_multi_clip_eval_batch():
    # --evaluate on the 'both' route: max(4, n_clips) clips/video
    # (reference dataset.py:134); during training validation uses n_clips.
    cfg = _cfg().replace(evaluate=True)
    assert _cfg().eval_n_clips == _cfg().n_clips == 1
    assert _cfg().replace(evaluate=True, dataset="kinetics2others").eval_n_clips == 25
    ds = build_datasets(cfg, None)
    table = ds["testing"][0]
    assert table.n_clips == cfg.eval_n_clips == 4
    hb = next(iter(HostPipeline(table, cfg, 2, seed=0)))
    assert hb.canvas.shape[1] == 4 * cfg.clip_len
    batch = device_batch(hb, table.n_clips, cfg.clip_len)
    assert batch["x"].shape == (2, 4, 4, 112, 112, 3)


# ------------------------------------------------------- on-disk catalogs ---

@pytest.fixture
def fake_root(tmp_path):
    root = tmp_path
    ucf = root / "UCF101" / "frames"
    for name in ["v_ApplyEyeMakeup_g01_c01", "v_Basketball_g01_c01",
                 "v_Basketball_g02_c03"]:
        (ucf / name / "images").mkdir(parents=True)
    hm = root / "HMDB51"
    (hm / "frames" / "vid1").mkdir(parents=True)
    (hm / "frames" / "vid2").mkdir(parents=True)
    (hm / "hmdb51_classes.txt").write_text("brush_hair 0\nclimb 1\n")
    (hm / "hmdb51.json").write_text(json.dumps({
        "database": {"vid1": {"annotations": 0}, "vid2": {"annotations": 1}}}))
    return str(root)


def test_get_ucf101_catalog(fake_root):
    fnames, labels, classes = get_ucf101(fake_root)
    assert len(fnames) == 3
    assert list(classes) == ["ApplyEyeMakeup", "Basketball"]
    assert labels[0] == "ApplyEyeMakeup" and labels[1] == "Basketball"


def test_get_hmdb_catalog(fake_root):
    fnames, labels, classes = get_hmdb(fake_root)
    assert len(fnames) == 2
    assert list(classes) == ["brush hair", "climb"]


def test_clean_kinetics_scrub(tmp_path):
    blist = tmp_path / "broken.txt"
    blist.write_text("frames/bad_video\n")
    fnames = np.asarray(["/data/k700/frames/good_video",
                         "/data/k700/frames/bad_video"], object)
    labels = np.asarray(["a", "b"])
    f, l = clean_kinetics(fnames, labels, str(blist))
    assert list(f) == ["/data/k700/frames/good_video"]


def test_clean_kinetics_missing_list_warns_and_noops(tmp_path, capsys,
                                                     monkeypatch):
    from zeroshotvideoclassification_tpu.data import datasets as DS

    monkeypatch.setattr(DS, "_warned_no_broken_list", [False])
    fnames = np.asarray(["/data/k700/frames/v1"], object)
    labels = np.asarray(["a"])
    f, l = clean_kinetics(fnames, labels, str(tmp_path / "nope.txt"))
    assert list(f) == list(fnames) and list(l) == list(labels)
    assert "skipping the Kinetics scrub" in capsys.readouterr().err
    clean_kinetics(fnames, labels, str(tmp_path / "nope.txt"))
    assert capsys.readouterr().err == ""  # warns once per process


def test_kinetics_catalog_order_is_deterministic(tmp_path, monkeypatch):
    """Table order must not depend on filesystem glob/readdir order:
    multi-host lockstep sharding slices by index and --train_samples
    subsets by position. get_kinetics must sort what glob returns."""
    import glob as globmod
    import json as _json

    from zeroshotvideoclassification_tpu.data.datasets import get_kinetics

    base = tmp_path / "Kinetics" / "Kinetics-700"
    (base / "annotations").mkdir(parents=True)
    names = ["zeta", "alpha", "mid"]
    for n in names:
        (base / "frames" / n).mkdir(parents=True)
    (base / "annotations" / "meta.json").write_text(
        _json.dumps({n: "c_" + n for n in names}))

    real_glob = globmod.glob
    monkeypatch.setattr(
        globmod, "glob",
        lambda *a, **k: list(reversed(sorted(real_glob(*a, **k)))))
    fnames, labels, _ = get_kinetics(str(tmp_path))
    assert [os.path.basename(f) for f in fnames] == sorted(names)


def test_activitynet_catalog_and_npy_pipeline(tmp_path, rng):
    """kinetics2others' extra leg: ActivityNet pre-cut npy clips through the
    catalog + decode + device transform."""
    import numpy as np

    from zeroshotvideoclassification_tpu.data.datasets import (
        VideoTable,
        get_activitynet,
    )

    clips = tmp_path / "ActivityNet" / "v1.3" / "clips"
    clips.mkdir(parents=True)
    rows = []
    for i, label in enumerate(["Surfing", "Archery", "Surfing"]):
        frames = rng.integers(0, 256, size=(40 + 10 * i, 128, 171, 3),
                              dtype=np.uint8)
        np.save(clips / f"vid{i}_0.npy", frames)
        rows.append(f"vid{i}_0,{label}")
    (clips / "annotations_all.csv").write_text("\n".join(rows) + "\n")

    fnames, labels, classes = get_activitynet(str(tmp_path))
    assert len(fnames) == 3 and list(classes) == ["Archery", "Surfing"]

    emb = rng.normal(size=(2, 300)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    table = VideoTable(
        name="ActivityNet", fnames=fnames,
        label_idx=np.asarray([1, 0, 1], np.int32), classes=list(classes),
        class_embed=emb, loader="npy", is_validation=True, n_clips=2)
    cfg = _cfg()
    batches = list(HostPipeline(table, cfg, 2, seed=0))
    assert batches[0].weight.sum() == 2
    batch = device_batch(batches[0], 2, cfg.clip_len)
    assert batch["x"].shape == (2, 2, cfg.clip_len, 112, 112, 3)
    x = np.asarray(batch["x"])
    assert np.isfinite(x).all() and x.min() >= -0.5 - 1e-6


def test_broken_npy_gets_zero_weight(tmp_path, rng):
    import numpy as np

    from zeroshotvideoclassification_tpu.data.datasets import VideoTable

    good = tmp_path / "ok.npy"
    np.save(good, rng.integers(0, 256, size=(30, 128, 171, 3), dtype=np.uint8))
    emb = np.eye(1, 300, dtype=np.float32)
    table = VideoTable(
        name="an", fnames=np.asarray([str(good), str(tmp_path / "missing.npy")],
                                     object),
        label_idx=np.asarray([0, 0], np.int32), classes=["a"],
        class_embed=emb, loader="npy", is_validation=True, n_clips=1)
    hb = next(iter(HostPipeline(table, _cfg(), 2, seed=0)))
    np.testing.assert_array_equal(hb.weight, [1.0, 0.0])
    np.testing.assert_array_equal(hb.label, [0, -1])


def test_kinetics2oboth_route_with_fixtures(tmp_path):
    """Full dataset composition: catalogs + class embeddings + overlap filter
    wiring, using synthetic word vectors and an on-disk fixture tree."""
    import json as _json

    from zeroshotvideoclassification_tpu.text import SyntheticWordVectors

    root = tmp_path
    ucf = root / "UCF101" / "frames"
    for name in ["v_Basketball_g01_c01", "v_Diving_g01_c01"]:
        (ucf / name / "images").mkdir(parents=True)
    hm = root / "HMDB51"
    (hm / "frames" / "vidA").mkdir(parents=True)
    (hm / "hmdb51_classes.txt").write_text("climb 0\n")
    (hm / "hmdb51.json").write_text(_json.dumps(
        {"database": {"vidA": {"annotations": 0}}}))
    kin = root / "Kinetics" / "Kinetics-700"
    (kin / "annotations").mkdir(parents=True)
    meta = {}
    for i, label in enumerate(
            ["archery", "playing basketball", "archery", "baking cookies"]):
        vid = f"vid{i:03d}"
        (kin / "frames" / vid / "images").mkdir(parents=True)
        meta[vid] = label
    (kin / "annotations" / "meta.json").write_text(_json.dumps(meta))

    cfg = Config(dataset="kinetics2oboth", data_root=str(root),
                 class_overlap=0.04)
    ds = build_datasets(cfg, SyntheticWordVectors())
    train = ds["training"][0]
    tests = ds["testing"]
    assert [t.name for t in tests] == ["ucf101", "hmdb51"]
    assert tests[0].classes == ["Basketball", "Diving"]
    # 'playing basketball' maps to [play, basketball]; UCF 'Basketball' maps
    # to [basketball] -> NOT identical tokens, so with synthetic vectors the
    # cosine distance is large and all 3 kinetics classes survive tau=0.04
    assert len(train.classes) == 3
    assert train.class_embed.shape == (3, 300)
    assert len(train) == 4
    # label indices consistent with sorted class order
    assert train.classes == sorted(train.classes)
    assert train.label_idx.max() == len(train.classes) - 1


def test_overlap_filter_drops_identical_class(tmp_path):
    """A kinetics class whose tokens exactly match a test class must be
    dropped by the tau filter (distance 0)."""
    import json as _json

    from zeroshotvideoclassification_tpu.text import SyntheticWordVectors

    root = tmp_path
    ucf = root / "UCF101" / "frames"
    (ucf / "v_Diving_g01_c01" / "images").mkdir(parents=True)
    hm = root / "HMDB51"
    (hm / "frames" / "vidA").mkdir(parents=True)
    (hm / "hmdb51_classes.txt").write_text("climb 0\n")
    (hm / "hmdb51.json").write_text(_json.dumps(
        {"database": {"vidA": {"annotations": 0}}}))
    kin = root / "Kinetics" / "Kinetics-700"
    (kin / "annotations").mkdir(parents=True)
    meta = {}
    # 'diving' lemmatizes to ['dive'] == UCF 'Diving' -> ['dive']: collision
    for i, label in enumerate(["diving", "archery"]):
        vid = f"vid{i:03d}"
        (kin / "frames" / vid / "images").mkdir(parents=True)
        meta[vid] = label
    (kin / "annotations" / "meta.json").write_text(_json.dumps(meta))

    cfg = Config(dataset="kinetics2oboth", data_root=str(root),
                 class_overlap=0.04)
    ds = build_datasets(cfg, SyntheticWordVectors())
    assert ds["training"][0].classes == ["archery"]


def test_kinetics2others_route_with_fixtures(tmp_path):
    """Full 'others' composition parity (reference get_all_datasets,
    dataset.py:35-91): ActivityNet embeddings always join the tau filter,
    but its eval table appears ONLY under --evaluate (first in the list,
    25 clips/video); training-time testing is UCF+HMDB."""
    import json as _json

    from zeroshotvideoclassification_tpu.text import SyntheticWordVectors

    root = tmp_path
    ucf = root / "UCF101" / "frames"
    (ucf / "v_Basketball_g01_c01" / "images").mkdir(parents=True)
    hm = root / "HMDB51"
    (hm / "frames" / "vidA").mkdir(parents=True)
    (hm / "hmdb51_classes.txt").write_text("climb 0\n")
    (hm / "hmdb51.json").write_text(_json.dumps(
        {"database": {"vidA": {"annotations": 0}}}))
    kin = root / "Kinetics" / "Kinetics-700"
    (kin / "annotations").mkdir(parents=True)
    meta = {}
    # 'surfing' collides with the ActivityNet class -> tau filter must drop it
    for i, label in enumerate(["archery", "surfing"]):
        vid = f"vid{i:03d}"
        (kin / "frames" / vid / "images").mkdir(parents=True)
        meta[vid] = label
    (kin / "annotations" / "meta.json").write_text(_json.dumps(meta))
    clips = root / "ActivityNet" / "v1.3" / "clips"
    clips.mkdir(parents=True)
    np.save(clips / "an0_0.npy",
            np.zeros((12, 32, 40, 3), np.uint8))
    (clips / "annotations_all.csv").write_text("an0_0,Surfing\n")

    cfg = Config(dataset="kinetics2others", data_root=str(root),
                 class_overlap=0.04)
    ds = build_datasets(cfg, SyntheticWordVectors())
    # training mode: no ActivityNet table, but its embedding filtered 'surfing'
    assert [t.name for t in ds["testing"]] == ["ucf101", "hmdb51"]
    assert ds["training"][0].classes == ["archery"]

    ds_eval = build_datasets(cfg.replace(evaluate=True), SyntheticWordVectors())
    assert [t.name for t in ds_eval["testing"]] == [
        "ActivityNet", "ucf101", "hmdb51"]
    assert ds_eval["testing"][0].n_clips == 25  # dataset.py:75 max(5*5, n)
    assert ds_eval["training"] == []


def test_frame_dir_cv2_fallback_survives_mixed_dims(tmp_path, rng):
    """A frame dir with one differently-sized JPEG (re-encoded/corrupt
    entry) must repeat-fill like any corrupt frame, not crash np.stack —
    the weight-0 contract says no decode failure aborts the run. (The
    native path already behaves this way; this pins the cv2 fallback.)"""
    cv2 = pytest.importorskip("cv2")

    from zeroshotvideoclassification_tpu.data import decode as D

    images = tmp_path / "vid" / "images"
    images.mkdir(parents=True)
    for i in range(6):
        hw = (96, 128) if i != 3 else (64, 80)  # frame 4 re-encoded smaller
        img = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
        cv2.imwrite(str(images / ("img_%05d.jpg" % (i + 1))),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    old = D._native
    try:
        D._native = False  # pin the cv2 fallback path
        frames, ok = D.decode_frame_dir(str(tmp_path / "vid"), 6, 1, True)
    finally:
        D._native = old
    assert ok and frames.shape == (6, 96, 128, 3)
    np.testing.assert_array_equal(frames[3], frames[2])  # repeat fill


def test_prefetch_propagates_decode_errors(monkeypatch):
    """A decode-worker exception must surface on the consumer thread as the
    original error (not a hang, not a silent empty epoch)."""
    cfg = _cfg()
    table = build_datasets(cfg, None)["training"][0]
    pipe = HostPipeline(table, cfg, 4, seed=0)

    def boom(i, rng):
        raise RuntimeError("decoder exploded")

    monkeypatch.setattr(pipe, "_decode_one", boom)
    with pytest.raises(RuntimeError, match="decoder exploded"):
        list(pipe)


def test_h2d_window_equivalent_to_full_canvas():
    """The windowed canvas (default) and the full canvas must produce
    IDENTICAL device batches — the window is pure uint8 indexing with
    rebased gather indices, for both train (random crop/flip) and
    validation (center crop) sampling."""
    from zeroshotvideoclassification_tpu.data.pipeline import device_batch

    for split in ("training", "testing"):
        cfg = _cfg()
        ds = build_datasets(cfg, None)
        table = ds[split][0]
        hb_w = next(iter(HostPipeline(table, cfg, 4, seed=11)))
        hb_f = next(iter(HostPipeline(table, cfg.replace(h2d_window=False),
                                      4, seed=11)))
        assert hb_w.canvas.nbytes < hb_f.canvas.nbytes
        a = device_batch(hb_w, table.n_clips, cfg.clip_len)
        b = device_batch(hb_f, table.n_clips, cfg.clip_len)
        np.testing.assert_array_equal(np.asarray(a["x"]), np.asarray(b["x"]))
        np.testing.assert_array_equal(np.asarray(a["weight"]),
                                      np.asarray(b["weight"]))
