"""Export an orbax training checkpoint to a flat .npz weight file.

Useful for sharing inference weights without orbax/optimizer state, and as
the interchange format accepted by --checkpoint / --pretrained-backbone.

Usage: python tools/export_weights.py weights/checkpoint_50 out.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser("checkpoint -> npz exporter")
    parser.add_argument("checkpoint", help="orbax checkpoint directory")
    parser.add_argument("out", help="output .npz path")
    args = parser.parse_args()

    import orbax.checkpoint as ocp

    from tinyfaces_tpu.utils.serialization import save_npz

    restored = ocp.StandardCheckpointer().restore(Path(args.checkpoint).absolute())
    payload = {k: restored[k] for k in ("params", "batch_stats") if k in restored}
    save_npz(args.out, payload)
    print(f"Wrote {args.out} (epoch {restored.get('epoch')})")


if __name__ == "__main__":
    main()
