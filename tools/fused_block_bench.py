"""Standalone A/B bench of the fused-bottleneck kernel variants.

The full fused-pyramid program takes 400-900 s to cold-compile over the
remote tunnel per configuration; this tool times the bottleneck kernels
as STANDALONE programs (seconds to compile) at the exact layer1/layer2
shapes the 2x pyramid level runs, so a kernel iteration loop is
practical. Variants:

  xla      — xla_bottleneck (folded-BN conv chain; the production path
             when EvalConfig.fused_blocks=False)
  element  — fused_bottleneck (pl.Element halo reads; measured DMA
             serialized with compute, docs/PERF.md round 3h)
  blocked  — fused_bottleneck_blocked (Blocked tiles + side halo tensor;
             Mosaic auto-double-buffering)
  blocked-im2col — same, 3x3 as one K=9*cmid matmul (full MXU lanes at
             cmid=64)

Methodology per docs/PERF.md: distinct device-resident inputs per
dispatch (the transport memoizes identical executions), chained CHAIN
applications per dispatch so compute dominates the ~33 ms dispatch
latency, completion observed by a scalar fetch.

Usage: python tools/fused_block_bench.py [--stage layer1|layer2]
           [--batch 32] [--iters 6] [--chain 4] [--th 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["layer1", "layer2"], default="layer1")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--chain", type=int, default=4,
                    help="identity-shaped blocks applied per dispatch")
    ap.add_argument("--th", type=int, default=8)
    ap.add_argument("--variants", default="xla,element,blocked,blocked-im2col")
    args = ap.parse_args()

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.models.resnet import Bottleneck
    from tinyfaces_tpu.ops import fused_block

    # 2x pyramid level of the 768x1024 bench image: layer1 runs at
    # (B, 384, 512, 256), layer2 at (B, 192, 256, 512).
    if args.stage == "layer1":
        hh, wdt, cin, width = 384, 512, 256, 64
    else:
        hh, wdt, cin, width = 192, 256, 512, 128
    b = args.batch
    dtype = jnp.bfloat16

    m = Bottleneck(width=width, stride=1)
    v = m.init(jax.random.PRNGKey(0),
               jnp.zeros((1, 16, 16, cin), jnp.float32), False)
    fw = fused_block.fold_block_weights(
        jax.device_get(v["params"]), jax.device_get(v["batch_stats"]), dtype)
    fw = jax.device_put(fw)
    params = jax.device_get(v["params"])
    stats = jax.device_get(v["batch_stats"])

    def chain(fn):
        @jax.jit
        def run(x):
            for _ in range(args.chain):
                x = fn(x)
            return x.sum(dtype=jnp.float32)
        return run

    def make_variant(name):
        if name == "xla":
            return chain(lambda x: fused_block.xla_bottleneck(
                x, params, stats, stride=1, dtype=dtype))
        if name == "element":
            def one(xp):
                return fused_block.fused_bottleneck(
                    xp, fw, th=args.th, final=False, dtype=dtype)
            @jax.jit
            def run(x):
                xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
                for _ in range(args.chain):
                    xp = one(xp)
                return xp[:, 1:hh + 1].sum(dtype=jnp.float32)
            return run
        im2col = name.endswith("im2col")
        return chain(lambda x: fused_block.fused_bottleneck_blocked(
            x, fw, th=args.th, dtype=dtype, im2col=im2col))

    # FLOPs per chained dispatch (identity blocks: no projection)
    cmid = width
    cout = 4 * width
    flops = (2 * b * hh * wdt * (cin * cmid + 9 * cmid * cmid + cmid * cout)
             * args.chain)

    rng = np.random.default_rng(0)
    xs = [jax.device_put(jnp.asarray(
        rng.normal(0, 1, (b, hh, wdt, cin)).astype(np.float32), dtype))
        for _ in range(args.iters)]
    for x in xs:
        x.block_until_ready()

    for name in args.variants.split(","):
        run = make_variant(name)
        t0 = time.time()
        float(run(xs[0]))  # compile + first run
        compile_s = time.time() - t0
        t0 = time.time()
        outs = [run(x) for x in xs]
        _ = [float(o) for o in outs]
        dt = (time.time() - t0) / args.iters
        per_block = dt / args.chain
        print(f"{args.stage} {name:16s} {per_block * 1e3:7.2f} ms/block "
              f"({flops / dt / 1e12:6.1f} TFLOP/s, compile {compile_s:.0f}s, "
              f"{args.iters} distinct dispatches x chain {args.chain})",
              flush=True)

    clean_exit()


if __name__ == "__main__":
    main()
