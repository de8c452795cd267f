"""Wire-size statistics: B/px of the jpegdct wires vs JPEG quality/content.

The headline wire numbers (v3 0.68 B/px, v4 0.376 B/px at the bench canvas)
come from bench.py's natural-spectral generator at quality 90. This tool
reports the spread across JPEG qualities (q75/85/90/95) and content classes
— smooth gradient, bench "natural", high-frequency texture (worst case),
and hard-edge synthetic graphics — so the headline can't be accused of
friendly inputs. Host-only (no TPU needed); the matching worst-case
throughput measurement is `BENCH_QUALITY=95 BENCH_CONTENT=texture
python bench.py`.

Usage: python tools/wire_stats.py [--h 768] [--w 1024] [--n 8] [--json]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image

QUALITIES = (75, 85, 90, 95)


def content_images(kind: str, n: int, h: int, w: int, seed: int = 0):
    """Content classes spanning the JPEG-statistics range.

    smooth:  gradients only — near-best case (most AC coefficients zero).
    natural: bench.py's generator (photo-like luma/chroma spectra).
    texture: per-pixel full-spectrum luma noise — worst realistic case
             (foliage/gravel/sensor noise push every AC band).
    graphics: hard edges + flat fills (screenshots, charts) — ringing
             spreads energy across AC bands along edges.
    """
    rng = np.random.default_rng(seed)
    if kind == "natural":
        from bench import natural_images

        return natural_images(n, h, w, seed=seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for _ in range(n):
        if kind == "smooth":
            img = (128 + 60 * np.sin(xx / 97.0 + rng.uniform(0, 6))
                   + 40 * np.cos(yy / 61.0 + rng.uniform(0, 6)))
            img = np.repeat(img[..., None], 3, axis=2) + [10, 0, -10]
        elif kind == "texture":
            base = 128 + 30 * np.sin(xx / 53.0)
            img = (base[..., None]
                   + rng.normal(0, 40, (h, w, 1))      # full-band luma
                   + rng.normal(0, 8, (h, w, 3)))       # chroma grain
        elif kind == "graphics":
            img = np.full((h, w, 3), 240.0)
            for _ in range(40):  # axis-aligned boxes with hard edges
                y0, x0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
                y1 = y0 + rng.integers(8, h // 3)
                x1 = x0 + rng.integers(8, w // 3)
                img[y0:y1, x0:x1] = rng.integers(0, 255, 3)
        else:
            raise ValueError(kind)
        out.append(np.clip(img, 0, 255).astype(np.uint8))
    return out


def measure(imgs, h, w, quality: int) -> dict:
    from tinyfaces_tpu.data import jpegdct

    jpegs, jpeg_bytes, nonzero_ac = [], 0, 0
    for im in imgs:
        buf = io.BytesIO()
        Image.fromarray(im).save(buf, "JPEG", quality=quality, subsampling=2)
        jpegs.append(buf.getvalue())
        jpeg_bytes += len(buf.getvalue())
        dct = jpegdct.parse_jpeg_dct(buf.getvalue())
        for plane in (dct.y, dct.cb, dct.cr):
            if plane is not None:
                nonzero_ac += int(np.count_nonzero(plane[..., 1:]))
    n = len(imgs)
    px = n * h * w
    row = {"jpeg_Bpx": jpeg_bytes / px, "nonzero_ac": nonzero_ac}
    # Both wires are fixed-capacity buffers (static shapes for XLA): bytes
    # are shape-determined; CONTENT shows up as truncation — nonzero AC
    # coefficients past the zigzag cutoff (v3+v4) or past the image-wide
    # value-stream budget (v4). Report the dropped fraction per cell.
    for ver, name in ((3, "v3"), (4, "v4")):
        before = jpegdct.truncation_stats()
        wire = jpegdct.pack_dct_batch(jpegs, h, w, wire_version=ver)
        after = jpegdct.truncation_stats()
        dropped = (after["truncated_coeffs"] - before["truncated_coeffs"])
        row[f"{name}_Bpx"] = jpegdct.wire_bytes(wire) / px
        row[f"{name}_drop_pct"] = 100.0 * dropped / max(nonzero_ac, 1)
    return row


def wire_psnr(img: np.ndarray, h: int, w: int, quality: int,
              version: int) -> float:
    """PSNR of the device-reconstructed RGB vs PIL's full JPEG decode of
    the SAME bytes — isolates what wire truncation costs in pixels (the
    JPEG loss itself is the source format's, not ours)."""
    import jax.numpy as jnp

    from tinyfaces_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from tinyfaces_tpu.data import jpegdct
    from tinyfaces_tpu.ops.jpeg import (
        dct4_batch_to_normalized, dct_batch_to_normalized, wire_fields,
    )

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality, subsampling=2)
    ref = np.asarray(Image.open(buf).convert("RGB"), np.float32)
    wire = jpegdct.pack_dct_batch([buf.getvalue()], h, w,
                                  wire_version=version)
    fields = wire_fields(jnp.asarray(wire["_wire"]), h, w, version=version)
    unpack = dct4_batch_to_normalized if version == 4 else dct_batch_to_normalized
    x = np.asarray(unpack(fields, h, w, dtype=jnp.float32))[0, :img.shape[0],
                                                            :img.shape[1]]
    recon = (x * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)) * 255.0
    mse = float(np.mean((recon - ref) ** 2))
    return 99.0 if mse < 1e-9 else 10.0 * np.log10(255.0**2 / mse)


def main():
    # Host-statistics tool: the --psnr reconstruction runs the device
    # unpack math on the CPU backend (the axon plugin overrides
    # JAX_PLATFORMS, so pin it programmatically — a remote-TPU init here
    # would pay tunnel compiles for a host-only analysis).
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--h", type=int, default=768)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--n", type=int, default=8, help="images per cell")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--psnr", action="store_true",
                    help="also reconstruct one image per cell through the "
                         "device unpack (CPU jax) and report PSNR vs the "
                         "full JPEG decode — the pixel cost of truncation")
    args = ap.parse_args()

    kinds = ("smooth", "natural", "texture", "graphics")
    table = {}
    for kind in kinds:
        imgs = content_images(kind, args.n, args.h, args.w)
        for q in QUALITIES:
            row = measure(imgs, args.h, args.w, q)
            if args.psnr:
                for ver in (3, 4):
                    row[f"v{ver}_psnr_db"] = wire_psnr(
                        imgs[0], args.h, args.w, q, ver)
            table[f"{kind}/q{q}"] = row

    if args.json:
        print(json.dumps(table, indent=1, default=float))
    else:
        psnr_hdr = f" {'v3psnr':>7} {'v4psnr':>7}" if args.psnr else ""
        print(f"{'content/quality':>16} {'jpegB/px':>9} {'v3B/px':>7} "
              f"{'v4B/px':>7} {'v3drop%':>8} {'v4drop%':>8}{psnr_hdr}")
        for key, row in table.items():
            psnr = (f" {row['v3_psnr_db']:7.1f} {row['v4_psnr_db']:7.1f}"
                    if args.psnr else "")
            print(f"{key:>16} {row['jpeg_Bpx']:9.3f} {row['v3_Bpx']:7.3f} "
                  f"{row['v4_Bpx']:7.3f} {row['v3_drop_pct']:8.3f} "
                  f"{row['v4_drop_pct']:8.3f}{psnr}")
        worst = max(table.items(), key=lambda kv: kv[1]["v4_drop_pct"])
        print(f"\nwire bytes are fixed-capacity (content-independent); "
              f"worst v4 truncation: {worst[0]} drops "
              f"{worst[1]['v4_drop_pct']:.2f}% of nonzero AC "
              f"(v3 {worst[1]['v3_drop_pct']:.2f}%); yuv420 pixel wire = "
              f"1.5 B/px, rgb = 3.0")

    from tinyfaces_tpu.utils.runtime import clean_exit

    clean_exit()  # interpreter exit hangs ~4 min on jax plugin teardown


if __name__ == "__main__":
    main()
