"""AP cost of the production eval defaults (VERDICT r4 #2).

The reference evaluates on exact PIL-decoded fp32 pixels
(/root/reference/tinyfaces/evaluation.py:40-58); this repo's production
default is bf16 + the lossy jpegdct wire (evaluate_model.py). The pixel
deviation is bounded (tests/test_jpegdct.py: +-2.5/255) — this tool
bounds it in AP: one trained checkpoint, one val tree, four configs
through the SAME production sweep + grader (tools/parity_run.py):

    fp32+rgb+pil      — reference-exact protocol (parity_run defaults)
    fp32+rgb+linear   — isolates the resampling-kernel delta
    bf16+rgb+pil      — isolates the precision delta
    bf16+jpegdct+lin  — the production default (evaluate_model defaults)

Writes AP_COST.json: per-config AP per split + delta vs reference-exact.
Typically pointed at a tools/e2e_accuracy.py workdir (checkpoint +
held-out val tree already there):

    python tools/ap_cost.py --workdir /tmp/e2e_r5 --epochs 50
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONFIGS = [
    ("fp32+rgb+pil", ["--transfer", "rgb", "--resample", "pil"]),
    ("fp32+rgb+linear", ["--transfer", "rgb", "--resample", "linear"]),
    ("bf16+rgb+pil", ["--transfer", "rgb", "--resample", "pil", "--bf16"]),
    ("bf16+jpegdct+linear",
     ["--transfer", "jpegdct", "--resample", "linear", "--bf16"]),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True,
                    help="e2e_accuracy workdir: uses <workdir>/wider and "
                         "<workdir>/weights/checkpoint_<epochs>")
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--checkpoint", default="",
                    help="override checkpoint path")
    ap.add_argument("--eval-batch", type=int, default=32)
    ap.add_argument("--prob-thresh", type=float, default=0.03)
    ap.add_argument("--arch", default="resnet101")
    ap.add_argument("--out", default=str(REPO / "AP_COST.json"))
    args = ap.parse_args()

    workdir = Path(args.workdir)
    ckpt = Path(args.checkpoint) if args.checkpoint else (
        workdir / "weights" / f"checkpoint_{args.epochs}")
    if not ckpt.exists():
        raise SystemExit(f"checkpoint not found: {ckpt}")
    tree = workdir / "wider"

    rows = {}
    for name, flags in CONFIGS:
        out = workdir / f"ap_{name.replace('+', '_')}.json"
        cmd = [sys.executable, str(REPO / "tools" / "parity_run.py"),
               "--dataset-root", str(tree), "--checkpoint", str(ckpt),
               "--arch", args.arch, "--ab-images", "0",
               "--prob_thresh", str(args.prob_thresh),
               "--eval-batch", str(args.eval_batch),
               "--out", str(out), *flags]
        print(f"[ap-cost] {name}: {' '.join(cmd)}", flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd, cwd=REPO).returncode
        if rc != 0:
            raise SystemExit(f"parity_run failed for {name} (rc={rc})")
        data = json.loads(out.read_text())
        rows[name] = {
            "ap": {k: round(float(v), 4) for k, v in data["scores"].items()},
            "images_per_sec": data.get("images_per_sec"),
            "link_mib_per_sec": data.get("link_mib_per_sec"),
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"[ap-cost] {name}: {rows[name]['ap']} "
              f"({rows[name]['images_per_sec']} img/s)", flush=True)

    ref = rows["fp32+rgb+pil"]["ap"]
    for name, row in rows.items():
        row["delta_vs_reference_exact"] = {
            k: round(row["ap"][k] - ref[k], 4) for k in ref}

    default_cost = rows["bf16+jpegdct+linear"]["delta_vs_reference_exact"]
    payload = {
        "checkpoint": str(ckpt),
        "splits": "approximate height-band (synthetic val tree)",
        "configs": rows,
        "production_default_ap_cost": default_cost,
        "acceptable": all(abs(v) <= 0.005 for v in default_cost.values()),
        "note": "VERDICT r4 #2: if the production default costs > 0.005 "
                "AP on any split, flip the eval default back to "
                "fp32+rgb (evaluate_model.py).",
    }
    Path(args.out).write_text(json.dumps(payload, indent=1) + "\n")
    print(f"[ap-cost] wrote {args.out}", flush=True)
    # No jax in this process (children do the device work) — plain exit,
    # but hard to stay symmetric with the other CLIs if jax got pulled in.
    import os

    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
