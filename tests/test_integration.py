"""End-to-end integration: real (synthetic) WIDER tree -> Trainer epochs ->
checkpoint/resume -> pyramid eval -> WIDER result files -> mAP evaluator.

The whole reference workflow surface in one test module, on the CPU backend
with a small backbone.
"""

import numpy as np
import pytest
from PIL import Image

import jax

from tinyfaces_tpu.config import DetectorConfig, EvalConfig, TrainConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.data.wider_face import WIDERFace
from tinyfaces_tpu.evaluation import PyramidDetector, write_results
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.trainer import Trainer, load_checkpoint, save_checkpoint

TINY_STAGES = (1, 1, 1)


@pytest.fixture(scope="module")
def wider_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("wider")
    rng = np.random.default_rng(0)
    ann = {"train": [], "val": []}
    for split in ("train", "val"):
        d = root / f"WIDER_{split}" / "images" / "0--Ev"
        d.mkdir(parents=True)
        for i in range(6):
            h, w = int(rng.integers(140, 260)), int(rng.integers(160, 300))
            img = rng.integers(0, 200, (h, w, 3), dtype=np.uint8)
            bw, bh = int(rng.integers(20, 50)), int(rng.integers(20, 50))
            x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
            img[y : y + bh, x : x + bw] = 255
            name = f"im_{split}_{i}.jpg"
            Image.fromarray(img).save(d / name)
            ann[split] += [f"0--Ev/{name}", "1", f"{x} {y} {bw} {bh} 0 0 0 0 0 0"]
    sd = root / "wider_face_split"
    sd.mkdir()
    for split in ("train", "val"):
        (sd / f"{split}.txt").write_text("\n".join(ann[split]) + "\n")
    return root


def test_full_training_and_eval_workflow(wider_tree, tmp_path):
    templates = load_templates()
    cfg = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=8)
    tc = TrainConfig(batch_size=2, workers=2, epochs=2)

    dataset = WIDERFace(
        wider_tree / "wider_face_split" / "train.txt", templates,
        cfg=cfg, dataset_root=wider_tree, split="train",
    )
    assert len(dataset) == 6

    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), cfg.input_size)

    trainer = Trainer(model=model, cfg=cfg, tc=tc, templates=templates)
    state = trainer.setup(steps_per_epoch=3, params=params, batch_stats=batch_stats)

    # two epochs of real data through the prefetch loader
    state = trainer.train_epoch(state, dataset, epoch=0)
    state = trainer.train_epoch(state, dataset, epoch=1)
    assert int(jax.device_get(state.step)) == 6
    assert trainer.class_average.num_averaged == 12

    # checkpoint + resume restores step and params
    path = save_checkpoint(state, epoch=2, batch_size=2, save_path=tmp_path,
                           filename="checkpoint_2")
    abstract = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.zeros((), np.int32),
        "epoch": np.zeros((), np.int64),
        "batch_size": np.zeros((), np.int64),
    }
    restored = load_checkpoint(path, abstract)
    assert int(restored["epoch"]) == 2
    assert int(restored["step"]) == 6

    # eval: pyramid inference over the val split -> WIDER result files
    val = WIDERFace(
        wider_tree / "wider_face_split" / "val.txt", templates,
        cfg=cfg, dataset_root=wider_tree, split="val",
    )
    detector = PyramidDetector(
        model,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        templates,
        cfg=DetectorConfig(),
        ec=EvalConfig(max_dets_per_scale=50, max_total_dets=50),
    )
    results_dir = tmp_path / "val_results"
    for i in range(2):
        image, img_path = val[i]
        dets = detector.detect(image, prob_thresh=0.2, scales=(0,))
        out = write_results(dets, img_path, "val", results_dir)
        lines = out.read_text().splitlines()
        assert int(lines[1]) == dets.shape[0]

    # mAP evaluator consumes the result tree without error
    from wider_eval import dataset_eval, gt_from_txt, read_results_dir

    results = read_results_dir(results_dir)
    gt, keeps = gt_from_txt(wider_tree / "wider_face_split" / "val.txt")
    ap = dataset_eval(results, gt, keeps["all"])
    assert 0.0 <= ap <= 1.0


def test_debug_heatmap_roundtrip(wider_tree):
    """GT heatmaps decode back to boxes near the original GT (the
    processor.visualize_heatmaps capability)."""
    import jax.numpy as jnp

    from tinyfaces_tpu.data.debug import heatmap_to_boxes
    from tinyfaces_tpu.data.targets import build_targets

    templates = load_templates()
    cfg = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=8)
    gt = np.array([[40.0, 40.0, 90.0, 100.0]], np.float32)
    batch = {
        "image": jnp.zeros((1, 128, 128, 3), jnp.uint8),
        "gt_boxes": jnp.asarray(np.tile(gt, (1, cfg.max_gt, 1))),
        "gt_valid": jnp.asarray(np.arange(cfg.max_gt)[None] < 1),
        "paste_box": jnp.asarray([[0.0, 0.0, 128.0, 128.0]]),
        "flip": jnp.asarray([False]),
    }
    _, cls, reg = build_targets(
        batch, jnp.asarray(templates, jnp.float32), jax.random.PRNGKey(0), cfg
    )
    boxes, scores = heatmap_to_boxes(
        np.asarray(cls[0]), np.asarray(reg[0]), templates, cfg,
        prob_thresh=1.0, nms_thresh=0.3,
    )
    assert boxes.shape[0] >= 1
    # decoded positive anchors should reconstruct the GT box closely
    center_err = np.abs(
        (boxes[:, :2] + boxes[:, 2:]) / 2 - np.array([65.0, 70.0])
    ).min(axis=0)
    assert (center_err < 8).all()


def test_evaluate_model_run_batched(wider_tree, tmp_path):
    """The bucket-batched eval CLI path writes one result file per image."""
    import evaluate_model
    from tinyfaces_tpu.evaluation import PyramidDetector

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    det = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(),
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=50),
    )
    val = WIDERFace(
        wider_tree / "wider_face_split" / "val.txt", templates,
        dataset_root=wider_tree, split="val",
    )
    results_dir = tmp_path / "res"
    evaluate_model.run(
        det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
        results_dir=results_dir, eval_batch=4,
    )
    files = sorted(results_dir.glob("*/*.txt"))
    assert len(files) == len(val)


@pytest.mark.parametrize("transfer", ["jpegdct", "jpegdct4"])
def test_evaluate_model_run_jpegdct(wider_tree, tmp_path, transfer):
    """--transfer jpegdct/jpegdct4 drives the eval sweep from
    entropy-decoded coefficients (host never decodes pixels) and writes
    the same per-image result-file tree."""
    import evaluate_model
    from tinyfaces_tpu.data import jpegdct
    from tinyfaces_tpu.evaluation import PyramidDetector

    if not jpegdct.is_available():
        pytest.skip("native library unavailable")
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    det = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(), transfer=transfer,
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=50),
    )
    val = WIDERFace(
        wider_tree / "wider_face_split" / "val.txt", templates,
        dataset_root=wider_tree, split="val",
    )
    results_dir = tmp_path / "res_dct"
    evaluate_model.run(
        det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
        results_dir=results_dir, eval_batch=4, workers=2,
    )
    files = sorted(results_dir.glob("*/*.txt"))
    assert len(files) == len(val)
    # serial jpegdct path too
    serial_dir = tmp_path / "res_dct_serial"
    evaluate_model.run(
        det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
        results_dir=serial_dir, eval_batch=1,
    )
    assert len(sorted(serial_dir.glob("*/*.txt"))) == len(val)


def test_pipelined_eval_matches_serial(wider_tree, tmp_path):
    """The async pipelined sweep (threaded decode + inflight device batches)
    must write byte-identical detections to the serial per-image path."""
    import evaluate_model
    from tinyfaces_tpu.evaluation import PyramidDetector

    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (128, 128))
    det = PyramidDetector(
        model, {"params": params, "batch_stats": batch_stats}, templates,
        cfg=DetectorConfig(),
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=50),
    )
    val = WIDERFace(
        wider_tree / "wider_face_split" / "val.txt", templates,
        dataset_root=wider_tree, split="val",
    )
    serial_dir = tmp_path / "serial"
    piped_dir = tmp_path / "piped"
    evaluate_model.run(det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
                       results_dir=serial_dir, eval_batch=1)
    evaluate_model.run(det, val, prob_thresh=0.2, nms_thresh=0.3, split="val",
                       results_dir=piped_dir, eval_batch=4, workers=4,
                       inflight=3)
    serial_files = sorted(serial_dir.glob("*/*.txt"))
    piped_files = sorted(piped_dir.glob("*/*.txt"))
    assert [f.name for f in serial_files] == [f.name for f in piped_files]
    for a, b in zip(serial_files, piped_files):
        # identical detection ROWS; tiny fp differences allowed in scores
        la, lb = a.read_text().splitlines(), b.read_text().splitlines()
        assert la[:2] == lb[:2]
        for ra, rb in zip(la[2:], lb[2:]):
            fa, fb = ra.split(), rb.split()
            assert fa[:4] == fb[:4]
            assert abs(float(fa[4]) - float(fb[4])) < 1e-3


@pytest.mark.slow
def test_overfit_yields_real_detection_quality(tmp_path):
    """Learning-quality end-to-end: overfit the tiny backbone on 8 synthetic
    'face' images, then run the full eval stack (pyramid detect -> WIDER
    writer -> mAP evaluator). From-scratch AP must clear 0.25 (a fresh
    model scores ~0)."""
    rng = np.random.default_rng(0)
    d = tmp_path / "WIDER_train" / "images" / "0--Ev"
    dv = tmp_path / "WIDER_val" / "images" / "0--Ev"
    d.mkdir(parents=True)
    dv.mkdir(parents=True)
    ann = []
    for i in range(8):
        img = rng.integers(0, 80, (128, 128, 3), dtype=np.uint8)
        bw, bh = int(rng.integers(24, 48)), int(rng.integers(24, 48))
        x, y = int(rng.integers(4, 128 - bw - 4)), int(rng.integers(4, 128 - bh - 4))
        img[y : y + bh, x : x + bw] = 255
        Image.fromarray(img).save(d / f"im{i}.jpg")
        Image.fromarray(img).save(dv / f"im{i}.jpg")
        ann += [f"0--Ev/im{i}.jpg", "1", f"{x} {y} {bw} {bh} 0 0 0 0 0 0"]
    (tmp_path / "gt.txt").write_text("\n".join(ann) + "\n")

    templates = load_templates()
    cfg = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=4)
    tc = TrainConfig(batch_size=4, workers=2, lr=2e-3)
    ds = WIDERFace(tmp_path / "gt.txt", templates, cfg=cfg,
                   dataset_root=tmp_path, split="train")
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, bs = init_model(model, jax.random.PRNGKey(0), cfg.input_size)
    trainer = Trainer(model=model, cfg=cfg, tc=tc, templates=templates)
    state = trainer.setup(2, params, bs)

    import contextlib
    import io

    for ep in range(70):
        with contextlib.redirect_stdout(io.StringIO()):
            state = trainer.train_epoch(state, ds, ep)

    val = WIDERFace(tmp_path / "gt.txt", templates, cfg=cfg,
                    dataset_root=tmp_path, split="val")
    det = PyramidDetector(
        model,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        templates, cfg=DetectorConfig(),
        ec=EvalConfig(scales=(0,), max_dets_per_scale=50, max_total_dets=20),
    )
    res_dir = tmp_path / "val_results"
    for i in range(len(val)):
        img, p = val[i]
        write_results(det.detect(img, prob_thresh=0.1, scales=(0,)), p, "val", res_dir)

    from wider_eval import dataset_eval, gt_from_txt, read_results_dir

    results = read_results_dir(res_dir)
    gt, keeps = gt_from_txt(tmp_path / "gt.txt")
    ap = dataset_eval(results, gt, keeps["all"])
    # training is chaotic at this scale; require clear signal over the
    # untrained model (~0) rather than a tight absolute bar
    assert ap > 0.12, f"overfit AP too low: {ap}"
