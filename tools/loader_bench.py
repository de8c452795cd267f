"""Host data-pipeline benchmark: Python augmentation vs the native C++ engine.

Builds a synthetic WIDER tree of JPEGs, then measures end-to-end batches/sec
through PrefetchLoader (PIL+NumPy augmentation in worker threads) and
NativePrefetchLoader (decode in threads, crop/paste/flip in C++ threads).
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    from PIL import Image

    from tinyfaces_tpu.config import DetectorConfig
    from tinyfaces_tpu.data import native
    from tinyfaces_tpu.data.loader import NativePrefetchLoader, PrefetchLoader
    from tinyfaces_tpu.data.wider_face import WIDERFace

    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp())
    d = root / "WIDER_train" / "images" / "0--Ev"
    d.mkdir(parents=True)
    lines = []
    n_imgs = 64
    for i in range(n_imgs):
        h, w = int(rng.integers(600, 1000)), int(rng.integers(700, 1100))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / f"im{i}.jpg", quality=90)
        rows = []
        for _ in range(int(rng.integers(3, 30))):
            bw, bh = int(rng.integers(10, 120)), int(rng.integers(10, 120))
            x, y = int(rng.integers(0, w - bw)), int(rng.integers(0, h - bh))
            rows.append(f"{x} {y} {bw} {bh} 0 0 0 0 0 0")
        lines += [f"0--Ev/im{i}.jpg", str(len(rows))] + rows
    ann = root / "gt.txt"
    ann.write_text("\n".join(lines) + "\n")

    cfg = DetectorConfig()
    ds = WIDERFace(ann, np.zeros((25, 5)), cfg=cfg, dataset_root=root, split="train")

    def measure(loader_cls, name):
        loader = loader_cls(ds, batch_size=12, workers=8, seed=0)
        t0 = time.time()
        n = 0
        for batch in loader:
            n += batch["image"].shape[0]
        dt = time.time() - t0
        print(f"{name}: {n / dt:.1f} samples/sec ({dt:.2f}s for {n})")
        return n / dt

    py = measure(PrefetchLoader, "python loader ")
    if native.is_available():
        nat = measure(NativePrefetchLoader, "native loader ")
        print(f"native speedup: {nat / py:.2f}x")
    else:
        print("native library unavailable")


if __name__ == "__main__":
    main()
