"""CLI surface parity: every flag the reference CLIs accept must exist here
with the same defaults (ours may add extras, never remove)."""

import main as train_cli
import evaluate_model as eval_cli
import detect_image as detect_cli


def _defaults(parser_args, argv):
    return vars(parser_args(argv))


def test_main_flags_superset_of_reference():
    # reference main.py:18-36
    args = _defaults(train_cli.arguments, ["train.txt", "val.txt"])
    assert args["traindata"] == "train.txt"
    assert args["valdata"] == "val.txt"
    assert args["dataset_root"] == ""
    assert args["dataset"] == "WIDERFace"
    assert args["lr"] == 1e-4
    assert args["weight_decay"] == 0.0005
    assert args["momentum"] == 0.9
    assert args["batch_size"] == 12
    assert args["workers"] == 8
    assert args["start_epoch"] == 0
    assert args["epochs"] == 50
    assert args["save_every"] == 10
    assert args["debug"] is False
    # reference declares --resume store_true but USES it as a path
    # (main.py:73-79); ours takes the path directly
    args2 = _defaults(train_cli.arguments, ["t", "v", "--resume", "ckpt"])
    assert args2["resume"] == "ckpt"


def test_evaluate_model_flags_superset_of_reference():
    # reference evaluate_model.py:16-31
    args = _defaults(eval_cli.arguments, ["val.txt"])
    assert args["dataset"] == "val.txt"
    assert args["split"] == "val"
    assert args["checkpoint"] == ""
    assert args["prob_thresh"] == 0.03
    assert args["nms_thresh"] == 0.3
    assert args["workers"] == 8
    assert args["batch_size"] == 1
    assert args["results_dir"] is None
    assert args["debug"] is False


def test_detect_image_flags_superset_of_reference():
    # reference detect_image.py:17-26
    args = _defaults(detect_cli.arguments, ["img.jpg"])
    assert args["image_path"] == "img.jpg"
    assert args["checkpoint"] == ""
    assert args["prob_thresh"] == 0.6
    assert args["nms_thresh"] == 0.3
