"""Single-image detection CLI — same surface as the reference
detect_image.py:17-26: load templates + checkpoint, single-scale
(scales=(0,)) detection, draw boxes, show."""

import argparse

import numpy as np
from PIL import Image, ImageDraw

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.evaluation import PyramidDetector, get_model


def arguments(argv=None):
    parser = argparse.ArgumentParser("Image Evaluator")
    parser.add_argument("image_path")
    parser.add_argument("--checkpoint",
                        help="The path to the model checkpoint", default="")
    parser.add_argument("--prob_thresh", type=float, default=0.6)
    parser.add_argument("--nms_thresh", type=float, default=0.3)
    parser.add_argument("--arch", default="resnet101",
                        choices=("resnet101", "resnet50"),
                        help="backbone (reference model.py:13 base_model knob)")
    parser.add_argument("--output", default="",
                        help="save annotated image here instead of .show()")
    parser.add_argument("--transfer", default="rgb",
                        choices=("rgb", "yuv420", "jpegdct", "jpegdct4"),
                        help="wire format; jpegdct feeds the JPEG file's "
                             "own DCT coefficients straight to the device")

    return parser.parse_args(argv)


def run(model, variables, image, templates, prob_thresh, nms_thresh,
        transfer="rgb", jpeg_bytes=None):
    detector = PyramidDetector(
        model, variables, templates, cfg=DetectorConfig(), ec=EvalConfig(),
        transfer=transfer,
    )
    if transfer.startswith("jpegdct") and jpeg_bytes is not None:
        return detector.detect_batch(
            [jpeg_bytes], prob_thresh, nms_thresh, scales=(0,))[0]
    return detector.detect(
        np.asarray(image), prob_thresh, nms_thresh, scales=(0,)
    )


def main():
    from tinyfaces_tpu.utils.runtime import (enable_compilation_cache,
                                          warm_d2h_async)

    enable_compilation_cache()
    warm_d2h_async()  # overlap the tunnel's one-time D2H init (PERF 5c)

    args = arguments()

    templates = load_templates()
    num_templates = templates.shape[0]

    model, variables = get_model(args.checkpoint, num_templates=num_templates,
                                 arch=args.arch)
    print("Loaded model", args.checkpoint)

    image = Image.open(args.image_path).convert("RGB")
    jpeg_bytes = None
    if args.transfer.startswith("jpegdct") and args.image_path.lower().endswith(
            (".jpg", ".jpeg")):
        jpeg_bytes = open(args.image_path, "rb").read()
    dets = run(model, variables, image, templates, args.prob_thresh,
               args.nms_thresh, transfer=args.transfer, jpeg_bytes=jpeg_bytes)
    print(f"{dets.shape[0]} detections")

    draw = ImageDraw.Draw(image)
    for det in dets:
        draw.rectangle(((det[0], det[1]), (det[2], det[3])), width=4)

    if args.output:
        image.save(args.output)
        print("Saved", args.output)
    else:
        image.show()


if __name__ == "__main__":
    main()

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()
