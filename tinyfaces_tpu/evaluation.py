"""Evaluation runtime: checkpoint loading, image-pyramid inference, WIDER writer.

Capability parity with tinyfaces/evaluation.py:12-114:
  * `get_model`: build the detector and load weights from a checkpoint path
    (orbax directory, .npz export, or a converted torch .pth via
    tools/convert_torch_checkpoint.py);
  * `get_detections`: multi-scale pyramid (scales 2**{-2..1}, shorter side
    scaled relative to the original min side), per-scale template pruning,
    on-device decode, ONE cross-scale NMS; returns (N, 5)
    [x1, y1, x2, y2, score] — note the reference at HEAD drops scores before
    returning and its writer then IndexErrors (SURVEY.md §3.2); the published
    protocol keeps scores, which is what we implement;
  * `write_results`: WIDER-spec per-image txt tree
    <results_dir>/<event>/<img>.txt with name line, count line, and
    `left top width height score` rows in the x2-x1+1 width convention
    (evaluation.py:103-114).

TPU-first: every pyramid level runs as one compiled program on a padded
static shape (dims bucketed adaptively so the jit cache stays small);
sigmoid/threshold/top-K decode and the cross-scale NMS all run on device;
only the final (N, 5) array crosses back to the host.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.config import DetectorConfig, EvalConfig
from tinyfaces_tpu.data.targets import normalize_images
from tinyfaces_tpu.data.wider_face import MEAN_PIXEL
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.ops.decode import decode_scores, valid_template_mask
from tinyfaces_tpu.ops.nms import batched_nms_padded
from tinyfaces_tpu.ops.stemfold import folded_stem_2x

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

def pyramid_level_sizes(h0, w0, sexp: int):
    """Per-image resize target (th, tw) for pyramid level f = 2**sexp.

    Reference sizing (evaluation.py:42-47 + torchvision F.resize(int)):
    shorter side -> int(min_side * f), longer side int(t_short * long /
    short) — float64 truncation. Computed here in EXACT integer
    arithmetic: f is a power of two, so floor(min * f) is a shift, and the
    long side is an integer division (equal to float64 truncation for any
    dims < 2^15, since the quotient error (long-r)/long >= 1/long can never
    cross the half-ulp ~t*2^-53 needed to flip the truncation). fp32 here
    would lose integrality above 2^24 (e.g. 8105*2073 at f=2 gave 16209,
    not 16210), silently breaking the exact-scale assumption of the
    identity-skip and folded-stem fast paths in the fused pyramid.

    h0, w0: int32 scalars or arrays (original image sizes).
    """
    mins = jnp.minimum(h0, w0)
    tshort = (mins << sexp) if sexp >= 0 else (mins >> (-sexp))
    th = jnp.where(h0 <= w0, tshort, (h0 * tshort) // w0)
    tw = jnp.where(h0 <= w0, (w0 * tshort) // h0, tshort)
    return th, tw


def pyramid_level_sizes_np(hs, ws, factor: float) -> np.ndarray:
    """Host (NumPy float64) reference sizing for an ARBITRARY scale factor:
    exactly `transforms.functional.resize(img, int(min_side * factor))`
    (reference evaluation.py:44-47) — Python float64 truncation for the
    short side, torchvision's `int(size * long / short)` truncation for
    the long side, both floored at 1 px.

    Non-integer octaves (half-octave pyramids etc.) cannot use the exact
    integer arithmetic of `pyramid_level_sizes` (2**s is irrational), and
    f32 truncation inside the jitted program can flip a floor near an
    integer boundary — so the fused pyramid takes these as a precomputed
    (B, 2) int32 array per level instead.

    Returns (B, 2) int32 [[th, tw], ...]."""
    hs = np.asarray(hs, np.int64)
    ws = np.asarray(ws, np.int64)
    mins = np.minimum(hs, ws)
    tshort = np.maximum(1, (mins * np.float64(factor)).astype(np.int64))
    # (t * long) / short, left-associative like the Python expression
    # `int(target_short * h / w)` — a*(b/c) rounds differently in f64.
    th = np.where(hs <= ws, tshort,
                  np.maximum(1, ((tshort * hs) / ws).astype(np.int64)))
    tw = np.where(hs <= ws,
                  np.maximum(1, ((tshort * ws) / hs).astype(np.int64)),
                  tshort)
    return np.stack([th, tw], axis=-1).astype(np.int32)


def get_model(
    checkpoint: Optional[str | Path] = None,
    num_templates: int = 25,
    dtype=jnp.float32,
    arch: str = "resnet101",
):
    """Build TinyFacesDetector and (optionally) load weights.

    `arch` selects the backbone ("resnet101" | "resnet50"), mirroring the
    reference's `base_model` knob (tinyfaces/models/model.py:13).
    Returns (model, variables) where variables = {params, batch_stats}.
    """
    from tinyfaces_tpu.models.resnet import ARCH_STAGES

    model = TinyFacesDetector(
        num_templates=num_templates, dtype=dtype,
        stage_sizes=ARCH_STAGES[arch],
    )
    params, batch_stats = init_model(model, jax.random.PRNGKey(0))

    if checkpoint:
        payload = load_weights(checkpoint)
        params = payload.get("params", params)
        batch_stats = payload.get("batch_stats", batch_stats)

    return model, {"params": params, "batch_stats": batch_stats}


def load_weights(checkpoint: str | Path) -> dict:
    """Load {params, batch_stats} from orbax dir / .npz / converted .pth."""
    path = Path(checkpoint)
    if path.is_dir():
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(path.absolute())
        return {k: restored[k] for k in ("params", "batch_stats") if k in restored}
    if path.suffix == ".npz":
        from tinyfaces_tpu.utils.serialization import unflatten_npz

        return unflatten_npz(np.load(path))
    if path.suffix in (".pth", ".pt"):
        from tools.convert_torch_checkpoint import convert_torch_checkpoint

        return convert_torch_checkpoint(path)
    raise ValueError(f"Unrecognized checkpoint format: {path}")


def _round_up_mult(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _integer_octaves(scales) -> bool:
    """True when every pyramid scale is an integer octave (f = 2**int).

    Integer octaves size their levels with exact in-program integer
    arithmetic (pyramid_level_sizes) and unlock the identity-resize skip
    and folded 2x stem. Non-integer octaves (half-octave pyramids etc.)
    still run fused — their exact float64-truncated level sizes are
    computed on the host (pyramid_level_sizes_np) and shipped as one
    extra small int32 array."""
    return all(float(s) == int(s) for s in scales)


def _round_up(x: int) -> int:
    """Adaptive shape bucketing: finer buckets for small dims, coarser for
    large ones, so the number of distinct compiled programs stays bounded
    while padding waste stays ~<25%. Tiny dims (incl. 1 px) clamp to a
    64-px bucket instead of under/overflowing the shift."""
    m = max(64, min(512, 1 << max(max(x - 1, 1).bit_length() - 3, 0)))
    return ((x + m - 1) // m) * m


class PackedBatch(NamedTuple):
    """Upload-ready host half of one detector batch (pack_inputs):
    `host` is the transfer-specific array payload ({"_wire": ...} for
    jpegdct*, (y, u, v) planes for yuv420, the uint8 canvas for rgb);
    hs/ws are per-image true sizes — pack_inputs always fills them (for
    jpegdct* they additionally ride inside the wire's h0w0 field and are
    not uploaded separately; the host copies feed the arbitrary-scale
    level sizing). hs/ws=None is tolerated for integer-octave scale sets
    only. h0p/w0p: the padded canvas."""

    host: object
    hs: Optional[np.ndarray]
    ws: Optional[np.ndarray]
    h0p: int
    w0p: int


class PyramidDetector:
    """Compiled multi-scale detector over one device.

    Holds the jit cache; one compiled program per (padded_h, padded_w, scale
    template-mask) combination.
    """

    def __init__(
        self,
        model: TinyFacesDetector,
        variables: dict,
        templates: np.ndarray,
        cfg: DetectorConfig | None = None,
        ec: EvalConfig | None = None,
        mesh=None,
        transfer: str = "rgb",
        shard: str = "batch",
    ):
        """`mesh`: optional jax.sharding.Mesh with a "data" axis — the fused
        pyramid batch shards over it (one group of images per chip; SURVEY.md
        §5's pyramid-across-chips scaling). Batch size must then be divisible
        by the mesh size.

        `shard` (with a mesh): "batch" = data-parallel over images
        (throughput); "spatial" = GSPMD spatial partitioning of each image's
        H axis (single-image latency on huge inputs — XLA inserts the conv
        halo exchanges; see parallel/spatial.py); "auto" = spatial when the
        batch is smaller than the mesh, else batch.

        `transfer`: wire format for the fused batch path. "rgb" uploads the
        uint8 RGB canvas (3 B/px, bit-exact vs the reference input);
        "yuv420" packs planar JPEG-style YCbCr with 2x2-subsampled chroma
        (1.5 B/px) and converts to normalized RGB on device — halves H2D
        bytes on bandwidth-starved links (docs/PERF.md round 2) at a
        <=~2/255 chroma cost, matching what a JPEG source already lost;
        "jpegdct" ships entropy-decoded quantized DCT coefficients
        (~0.5-0.9 B/px on natural photos) and performs dequant + 8x8 IDCT
        + fancy chroma upsample + normalize on device (ops/jpeg.py) —
        detect_batch then accepts raw JPEG bytes (or DCTImage), skipping
        the host decode entirely; uint8 arrays are transparently encoded
        first (data/jpegdct.py); "jpegdct4" is the same pipeline over the
        bitmap-sparse wire v4 (~2/3 the H2D bytes; data/jpegdct.py)."""
        if transfer not in ("rgb", "yuv420", "jpegdct", "jpegdct4"):
            raise ValueError(f"unknown transfer mode {transfer!r}")
        if shard not in ("batch", "spatial", "auto"):
            raise ValueError(f"unknown shard mode {shard!r}")
        _ec = ec or EvalConfig()
        if _ec.resample not in ("linear", "pil"):
            raise ValueError(f"unknown resample kernel {_ec.resample!r}")
        if _ec.resample == "pil" and transfer != "rgb":
            raise ValueError(
                "resample='pil' reproduces the reference's uint8-domain "
                "resampling and needs exact pixels on device — use "
                "transfer='rgb' (lossy wires defeat the parity point)")
        self.shard = shard
        self.model = model
        self.variables = variables
        self.templates = np.asarray(templates, np.float64)
        self.templates_j = jnp.asarray(templates, jnp.float32)
        self.cfg = cfg or DetectorConfig()
        self.ec = ec or EvalConfig()
        self.mesh = mesh
        self.transfer = transfer
        self._mask_cache: dict[float, np.ndarray] = {}

        stride = float(self.cfg.rf.stride[0])
        offset = float(self.cfg.rf.offset[0])
        model = self.model

        def forward_decode(variables, templates_j, image_u8, valid_h, valid_w,
                           *, scale: float, prob_thresh: float, k: int,
                           valid_ids: tuple):
            """One pyramid level: normalize -> FCN forward -> top-K decode."""
            x = normalize_images(image_u8[None])
            out = model.apply(variables, x, train=False)[0]
            # Heatmap-space extent of the un-padded image region: the three
            # stride-2 stages give a score grid of ceil(valid/8) rows/cols.
            st = int(stride)
            hm_h = (valid_h + st - 1) // st
            hm_w = (valid_w + st - 1) // st
            return decode_scores(
                out, templates_j, None,
                prob_thresh=prob_thresh, stride=stride, offset=offset,
                scale=scale, k=k, valid_hw=(hm_h, hm_w), valid_ids=valid_ids,
            )

        self._forward_decode = jax.jit(
            forward_decode,
            static_argnames=("scale", "prob_thresh", "k", "valid_ids"),
        )
        self._merge_nms = jax.jit(
            lambda boxes, scores, valid, *, nms_thresh, max_out: batched_nms_padded(
                boxes, scores, nms_thresh, valid, max_out
            ),
            static_argnames=("nms_thresh", "max_out"),
        )

        def fused_pyramid(variables, templates_j, images_in, h0, w0,
                          level_sizes, *, scales: tuple, h0p: int, w0p: int,
                          prob_thresh: float, nms_thresh: float,
                          transfer: str):
            """Whole pyramid in ONE program: device resize of the original to
            every scale, FCN forward per scale, decode, cross-scale NMS.

            One dispatch + one small H2D per image batch — built for the
            high per-call latency of remote-attached TPUs, and so XLA can
            overlap the scales' compute.
            """
            # Decode/normalize straight into the model's compute dtype:
            # halves the unpack+resize stages' HBM traffic for bf16
            # inference (the first conv casts anyway).
            if transfer.startswith("jpegdct"):
                from tinyfaces_tpu.ops.jpeg import (
                    dct4_batch_to_normalized, dct_batch_to_normalized,
                    wire_fields,
                )

                version = 4 if transfer == "jpegdct4" else 3
                b = images_in["_wire"].shape[0]
                fields = wire_fields(images_in["_wire"], h0p, w0p,
                                     version=version)
                # per-image true sizes ride inside the wire buffer
                h0 = fields["h0w0"][:, 0]
                w0 = fields["h0w0"][:, 1]
                unpack = (dct4_batch_to_normalized if version == 4
                          else dct_batch_to_normalized)
                x0 = unpack(fields, h0p, w0p, dtype=self.model.dtype)
            elif transfer == "yuv420":
                from tinyfaces_tpu.data.targets import yuv420_to_normalized

                y, u, v = images_in
                b = y.shape[0]
                x0 = yuv420_to_normalized(y, u, v, dtype=self.model.dtype)
            else:
                b = images_in.shape[0]
                if self.ec.resample == "pil":
                    # PIL-matched resampling quantizes each level to the
                    # uint8 grid in PIXEL space (ops/pilresize.py), which
                    # does not commute with normalization — keep pixels
                    # and normalize per level after the resize.
                    x0 = images_in.astype(jnp.float32)
                else:
                    # normalize commutes with resize
                    x0 = normalize_images(images_in, dtype=self.model.dtype)
            k = self.ec.max_dets_per_scale

            def apply_model(xin, *, stem_precomputed: bool):
                """Backbone forward through the plain XLA conv path.

                Hand-written alternatives were measured and excised
                (docs/PERF.md round 4): Pallas fused layer1/2 bottlenecks
                606.9 vs XLA's 424.8 ms/batch32 device time; width-packed
                layer1 5% slower e2e. XLA's own conv fusion wins here."""
                return model.apply(variables, xin, train=False,
                                   stem_precomputed=stem_precomputed)

            all_b, all_s, all_v = [], [], []
            for si, s in enumerate(scales):
                f = 2.0**s
                thp = _round_up_mult(int(round(h0p * f)), 32)
                twp = _round_up_mult(int(round(w0p * f)), 32)
                if float(s) == int(s):
                    # integer octave: exact in-program integer sizing
                    # (shift + integer division, see pyramid_level_sizes)
                    th_v, tw_v = pyramid_level_sizes(h0, w0, int(s))
                else:
                    # arbitrary scale (half-octave pyramids etc.): exact
                    # float64-truncated sizes are computed on the HOST
                    # (pyramid_level_sizes_np) and ride in as int32 —
                    # f32 arithmetic in-program could flip a truncation
                    # at an integer boundary.
                    th_v = level_sizes[:, si, 0]
                    tw_v = level_sizes[:, si, 1]
                th_v = jnp.clip(th_v, 1, thp)
                tw_v = jnp.clip(tw_v, 1, twp)

                def resize_one(img, tv, wv, hh, ww):
                    return jax.image.scale_and_translate(
                        img, (thp, twp, 3), (0, 1),
                        jnp.stack([tv.astype(jnp.float32) / hh.astype(jnp.float32),
                                   wv.astype(jnp.float32) / ww.astype(jnp.float32)]),
                        jnp.zeros(2, jnp.float32),
                        method="linear", antialias=True,
                    )

                pil = self.ec.resample == "pil"
                if pil:
                    from tinyfaces_tpu.ops.pilresize import resize_pil_bilinear

                    def pil_level(img, tv, wv, hh, ww):
                        return resize_pil_bilinear(
                            img, (thp, twp), (tv, wv), (hh, ww))

                if f == 1.0 and (thp, twp) == (h0p, w0p):
                    # scale_and_translate at scale 1, translate 0 is exactly
                    # the identity (the linear kernel hits integer offsets:
                    # weight 1 on one pixel, 0 elsewhere — for every image in
                    # the batch, since th_v == h0 always at f=1), but it is
                    # implemented as two real weight-matrix contractions per
                    # image. Skip it: bit-exact, saves the second-largest
                    # resize stage in the fused program. (PIL's identity
                    # resize is also exact: every tap lands weight 1.)
                    xin = (normalize_images(x0.astype(jnp.uint8),
                                            dtype=self.model.dtype)
                           if pil else x0)
                    out = apply_model(xin, stem_precomputed=False)
                elif (not pil and self.ec.fold_stem and f == 2.0
                      and (thp, twp) == (2 * h0p, 2 * w0p)):
                    # The 2x level's resize factor is exactly 2.0 for every
                    # image (an integer short side h resizes to floor(2h) =
                    # 2h), so the upsample folds into conv1: the stem runs at
                    # 1x resolution and the (2H, 2W, 3) canvas — the largest
                    # tensor in this program — is never materialized.
                    stem = folded_stem_2x(
                        x0, variables["params"]["backbone"]["conv1"]["kernel"])
                    out = apply_model(stem, stem_precomputed=True)
                else:
                    if pil:
                        xs = jax.vmap(pil_level)(x0, th_v, tw_v, h0, w0)
                        xs = normalize_images(xs.astype(jnp.uint8),
                                              dtype=self.model.dtype)
                    else:
                        xs = jax.vmap(resize_one)(x0, th_v, tw_v, h0, w0)
                    out = apply_model(xs, stem_precomputed=False)

                st = int(stride)
                hm_h = (th_v + st - 1) // st
                hm_w = (tw_v + st - 1) // st

                # Template pruning is compile-time constant per scale: run
                # the top-K over only the ids that can fire (~8 of 25) —
                # identical results, ~3x smaller sort domain (the decode
                # top-K was the single largest non-conv cost).
                vids = tuple(
                    int(i) for i in np.nonzero(self._template_mask(2.0**s))[0]
                )
                dets = jax.vmap(
                    lambda o, hh, ww: decode_scores(
                        o, templates_j, None,
                        prob_thresh=prob_thresh, stride=stride, offset=offset,
                        scale=float(f), k=k, valid_hw=(hh, ww), valid_ids=vids,
                    )
                )(out, hm_h, hm_w)
                all_b.append(dets.boxes)
                all_s.append(dets.scores)
                all_v.append(dets.valid)

            boxes = jnp.concatenate(all_b, axis=1)
            scores = jnp.concatenate(all_s, axis=1)
            valid = jnp.concatenate(all_v, axis=1)
            # Note: a pre-NMS top-K candidate cut was measured (~3% e2e) but
            # rejected — it drops isolated low-score boxes the reference
            # would keep (it thresholds but never caps candidates).
            out_b, out_s, out_v = jax.vmap(
                lambda bb, ss, vv: batched_nms_padded(
                    bb, ss, nms_thresh, vv, self.ec.max_total_dets
                )
            )(boxes, scores, valid)
            # ONE packed output [x1,y1,x2,y2,score,valid] so the host pays a
            # single D2H per batch: three separate fetches each cost the
            # tunnel's ~33 ms per-transfer latency — measured as the bulk of
            # the e2e-vs-upload-ceiling gap (docs/PERF.md round 4d).
            return jnp.concatenate(
                [out_b.astype(jnp.float32), out_s[..., None].astype(jnp.float32),
                 out_v[..., None].astype(jnp.float32)], axis=-1)

        self._fused_pyramid = jax.jit(
            fused_pyramid,
            static_argnames=("scales", "h0p", "w0p", "prob_thresh",
                             "nms_thresh", "transfer"),
        )

    def _template_mask(self, scale: float) -> np.ndarray:
        if scale not in self._mask_cache:
            self._mask_cache[scale] = valid_template_mask(
                self.templates, scale, pruning=self.ec.template_pruning)
        return self._mask_cache[scale]

    def detect(
        self,
        image: np.ndarray,  # (H, W, 3) uint8 original image
        prob_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None,
        scales: Optional[Sequence[int]] = None,
        host_resize: bool = False,
    ) -> np.ndarray:
        """Returns (N, 5) [x1, y1, x2, y2, score] detections on the host.

        Default path: one fused on-device program (device pyramid resize +
        all forwards + decode + NMS, single dispatch) — any scale set,
        including non-integer octaves (half-octave pyramids ship exact
        host-computed level sizes). `host_resize=True` selects the
        PIL-resize-per-scale path (reference-identical resampling, one
        dispatch per scale)."""
        if not host_resize:
            return self.detect_batch(
                [image], prob_thresh, nms_thresh, scales
            )[0]
        return self._detect_host_resize(image, prob_thresh, nms_thresh, scales)

    def detect_batch(
        self,
        images: Sequence[np.ndarray],
        prob_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None,
        scales: Optional[Sequence[int]] = None,
    ) -> list[np.ndarray]:
        """Fused-path detection over a batch of images (padded to a common
        bucketed shape — batch same-sized images for best throughput).

        Any scale set works, including non-integer octaves: half-octave
        pyramids ship exact host-computed (float64-truncated) level sizes
        as one extra small int32 array; integer octaves keep the exact
        in-program integer sizing with no extra transfer."""
        return self._fetch(self.detect_batch_async(
            images, prob_thresh, nms_thresh, scales
        ))

    def pack_inputs(self, images: Sequence[np.ndarray]) -> "PackedBatch":
        """Host-side half of detect_batch_async: decode/pack `images`
        into upload-ready host arrays (CPU-bound, GIL-dropping C++ for
        jpegdct) WITHOUT touching the device. Feed the result back to
        detect_batch_async — on a single-core host this lets a pack
        worker overlap the (network-bound) upload+dispatch thread, which
        a fused pack-then-upload call serializes."""
        if self.transfer.startswith("jpegdct"):
            from tinyfaces_tpu.data import jpegdct

            # Raw JPEG bytes stay raw: a header-only dims probe sizes the
            # canvas, and pack_dct_batch runs the fused C++ entropy-decode
            # + pack on them directly (half the host CPU of the two-pass
            # parse-then-pack path — the e2e bottleneck on a 1-core host).
            dcts, hs, ws = [], [], []
            for im in images:
                dims = (jpegdct.jpeg_dims(bytes(im))
                        if isinstance(im, (bytes, bytearray, memoryview))
                        else None)
                if dims is None:
                    im = jpegdct.as_dct_image(im)
                    dims = (im.h, im.w)
                dcts.append(im)
                hs.append(dims[0])
                ws.append(dims[1])
            h0p, w0p = _round_up(max(hs)), _round_up(max(ws))
            wire = jpegdct.pack_dct_batch(
                dcts, h0p, w0p,
                wire_version=4 if self.transfer == "jpegdct4" else 3)
            # hs/ws also ride INSIDE the wire (h0w0 field) and are not
            # uploaded separately; the host copies here feed the
            # arbitrary-scale level sizing (pyramid_level_sizes_np).
            return PackedBatch({"_wire": wire["_wire"]},
                               np.asarray(hs, np.int32),
                               np.asarray(ws, np.int32), h0p, w0p)

        hs = [im.shape[0] for im in images]
        ws = [im.shape[1] for im in images]
        h0p, w0p = _round_up(max(hs)), _round_up(max(ws))

        # Fill only the padding margins (a full-canvas memset costs more
        # than the device work at batch 16; np.empty itself is free). A
        # fresh buffer per call keeps async in-flight transfers safe.
        batch = np.empty((len(images), h0p, w0p, 3), np.uint8)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            batch[i, :h, :w] = im
            if w < w0p:
                batch[i, :h, w:] = MEAN_PIXEL
            if h < h0p:
                batch[i, h:] = MEAN_PIXEL

        if self.transfer == "yuv420":
            from tinyfaces_tpu.data.targets import rgb_to_yuv420

            host = tuple(rgb_to_yuv420(batch))
        else:
            host = batch
        return PackedBatch(host, np.asarray(hs, np.int32),
                           np.asarray(ws, np.int32), h0p, w0p)

    def detect_batch_async(
        self,
        images,
        prob_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None,
        scales: Optional[Sequence[int]] = None,
    ):
        """Non-blocking variant: enqueues the transfer + fused program and
        returns device futures immediately, so callers can pipeline host
        prep / transfers of batch i+1 against device compute of batch i.
        Resolve with `_fetch`. Accepts raw images or a pre-packed
        PackedBatch (pack_inputs) — the latter makes host prep its own
        pipeline stage."""
        prob_thresh = self.ec.prob_thresh if prob_thresh is None else prob_thresh
        nms_thresh = self.ec.nms_thresh if nms_thresh is None else nms_thresh
        scales = tuple(self.ec.scales if scales is None else scales)

        packed = (images if isinstance(images, PackedBatch)
                  else self.pack_inputs(images))
        h0p, w0p = packed.h0p, packed.w0p
        # Arbitrary (non-integer-octave) scales: exact float64 reference
        # sizing happens on the host; one extra small int32 (B, L, 2) put.
        # Integer octaves (the reference protocol) pass None and keep the
        # exact in-program integer sizing — no extra transfer.
        if _integer_octaves(scales):
            sizes_np = None
        else:
            if packed.hs is None:
                raise ValueError(
                    "non-integer-octave scales need per-image sizes: this "
                    "PackedBatch has hs/ws=None (hand-built?) — create it "
                    "with pack_inputs, which always fills them")
            sizes_np = np.stack(
                [pyramid_level_sizes_np(packed.hs, packed.ws, 2.0**s)
                 for s in scales], axis=1)
        if self.transfer.startswith("jpegdct"):
            # ONE coalesced H2D put per batch — every put pays the
            # tunnel's per-transfer latency (docs/PERF.md round 3); the
            # per-image sizes ride inside as the h0w0 field.
            images_j = {"_wire": jnp.asarray(packed.host["_wire"])}
        elif self.transfer == "yuv420":
            images_j = tuple(jnp.asarray(p) for p in packed.host)
        else:
            images_j = jnp.asarray(packed.host)
        if self.transfer.startswith("jpegdct"):
            # per-image sizes ride inside the wire buffer (h0w0 field) —
            # no separate put
            hs_j = ws_j = None
            n_imgs = packed.host["_wire"].shape[0]
        else:
            hs_j = jnp.asarray(packed.hs, jnp.int32)
            ws_j = jnp.asarray(packed.ws, jnp.int32)
            n_imgs = int(packed.hs.shape[0])
        if self.mesh is not None:
            from tinyfaces_tpu.parallel.mesh import batch_sharding, replicate
            from tinyfaces_tpu.parallel.spatial import choose_eval_sharding

            sh = choose_eval_sharding(self.mesh, n_imgs, self.shard)
            images_j = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sh), images_j
            )
            # Per-image valid sizes follow the batch axis; under spatial
            # sharding the batch axis is unsharded, so replicate them.
            vec_sh = (
                batch_sharding(self.mesh)
                if sh.spec == batch_sharding(self.mesh).spec
                else replicate(self.mesh)
            )
            if hs_j is not None:
                hs_j, ws_j = (jax.device_put(a, vec_sh) for a in (hs_j, ws_j))
            if sizes_np is not None:
                sizes_np = jax.device_put(jnp.asarray(sizes_np), vec_sh)
        out = self._fused_pyramid(
            self.variables, self.templates_j,
            images_j, hs_j, ws_j,
            None if sizes_np is None else jnp.asarray(sizes_np),
            scales=scales, h0p=h0p, w0p=w0p,
            prob_thresh=float(prob_thresh), nms_thresh=float(nms_thresh),
            transfer=self.transfer,
        )
        # Start the D2H of the packed detections as soon as compute
        # finishes (async, cached inside the Array) instead of when the
        # caller blocks in _fetch — in a depth-N pipeline the copy then
        # rides the device-compute window of the NEXT batch and _fetch
        # finds the bytes already host-side. No-op if the backend lacks
        # the async-copy hook.
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return out

    @staticmethod
    def _fetch(async_result) -> list[np.ndarray]:
        packed = np.asarray(async_result)  # one D2H: (B, K, 6)
        results = []
        for i in range(packed.shape[0]):
            n = int(packed[i, :, 5].sum())
            results.append(packed[i, :n, :5].copy())
        return results

    def _detect_host_resize(
        self,
        image: np.ndarray,
        prob_thresh: Optional[float] = None,
        nms_thresh: Optional[float] = None,
        scales: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        prob_thresh = self.ec.prob_thresh if prob_thresh is None else prob_thresh
        nms_thresh = self.ec.nms_thresh if nms_thresh is None else nms_thresh
        scales = self.ec.scales if scales is None else scales

        if isinstance(image, (bytes, bytearray, memoryview)):
            # raw JPEG bytes (jpegdct wire): this path resizes pixels on
            # the host, so decode fully here
            import io

            from PIL import Image as _PILImage

            image = np.asarray(
                _PILImage.open(io.BytesIO(bytes(image))).convert("RGB"))

        h, w = image.shape[:2]
        min_side = min(h, w)

        all_boxes, all_scores, all_valid = [], [], []
        for s in scales:
            factor = 2.0**s
            target_short = max(1, int(min_side * factor))
            # torchvision F.resize(int) sizing: shorter side := size, longer
            # side := int(size * long / short) — truncation, not rounding
            # (reference evaluation.py:46-47).
            if w < h:
                tw, th = target_short, max(1, int(target_short * h / w))
            else:
                th, tw = target_short, max(1, int(target_short * w / h))
            resized = self._resize(image, (th, tw))

            # Pad up to the bucketed static shape with the ImageNet mean pixel
            # (~zero after normalization, i.e. what conv zero-padding would
            # see in normalized space) so border scores stay close to the
            # unpadded reference behavior.
            ph, pw = _round_up(th), _round_up(tw)
            padded = np.empty((ph, pw, 3), np.uint8)
            padded[:] = MEAN_PIXEL
            padded[:th, :tw] = resized

            dets = self._forward_decode(
                self.variables,
                self.templates_j,
                jnp.asarray(padded),
                jnp.int32(th),
                jnp.int32(tw),
                # Parity note: the reference divides boxes by the exact 2**s
                # factor even though the resize rounds to integer pixels
                # (evaluation.py:44-47, utils.py:72-74).
                scale=float(factor),
                prob_thresh=float(prob_thresh),
                k=self.ec.max_dets_per_scale,
                valid_ids=tuple(
                    int(i) for i in np.nonzero(self._template_mask(factor))[0]
                ),
            )
            all_boxes.append(dets.boxes)
            all_scores.append(dets.scores)
            all_valid.append(dets.valid)

        boxes = jnp.concatenate(all_boxes)
        scores = jnp.concatenate(all_scores)
        valid = jnp.concatenate(all_valid)

        out_boxes, out_scores, out_valid = self._merge_nms(
            boxes, scores, valid,
            nms_thresh=float(nms_thresh), max_out=self.ec.max_total_dets,
        )
        n = int(out_valid.sum())
        dets = np.concatenate(
            [np.asarray(out_boxes)[:n], np.asarray(out_scores)[:n, None]], axis=1
        )
        return dets

    @staticmethod
    def _resize(image: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
        th, tw = hw
        if (th, tw) == image.shape[:2]:
            return image
        if Image is not None:
            return np.asarray(
                Image.fromarray(image).resize((tw, th), Image.BILINEAR)
            )
        ys = (np.arange(th) * image.shape[0] / th).astype(int)
        xs = (np.arange(tw) * image.shape[1] / tw).astype(int)
        return image[ys][:, xs]


def get_detections(
    model,
    variables,
    image: np.ndarray,
    templates: np.ndarray,
    prob_thresh: float = 0.65,
    nms_thresh: float = 0.3,
    scales: Sequence[int] = (-2, -1, 0, 1),
    cfg: DetectorConfig | None = None,
) -> np.ndarray:
    """Functional one-shot API mirroring reference evaluation.py:20-87."""
    det = PyramidDetector(model, variables, templates, cfg=cfg)
    return det.detect(image, prob_thresh, nms_thresh, scales)


def write_results(
    dets: np.ndarray,  # (N, 5) with scores
    img_path: str,
    split: str,
    results_dir: Optional[str | Path] = None,
) -> Path:
    """WIDER-format result file (reference evaluation.py:90-114)."""
    results_dir = Path(results_dir or f"{split}_results")
    filename = results_dir / img_path.replace("jpg", "txt")
    filename.parent.mkdir(parents=True, exist_ok=True)

    # Non-finite rows (exp-overflowed regressions from degenerate weights —
    # the reference's np.exp at models/utils.py:87-88 overflows identically)
    # cannot be serialized as integers; they carry no usable box, so drop.
    finite = np.isfinite(dets).all(axis=1)
    if not finite.all():
        dets = dets[finite]

    with open(filename, "w") as f:
        f.write(img_path.split("/")[-1] + "\n")
        f.write(str(dets.shape[0]) + "\n")
        for x in dets:
            left, top = np.round(x[0]), np.round(x[1])
            width = np.round(x[2] - x[0] + 1)
            height = np.round(x[3] - x[1] + 1)
            f.write(f"{int(left)} {int(top)} {int(width)} {int(height)} {x[4]}\n")
    return filename
