"""Training-step throughput benchmark (synthetic WIDER-like data).

Measures the full jitted SPMD train step — normalization + Pallas GT
assignment + ResNet-101 fwd/bwd + per-group SGD update — end to end,
including host batch prep and transfer, at the reference schedule's batch
size. Prints images/sec and ms/step.

Usage: python tools/train_bench.py [--batch 12] [--iters 20] [--bf16]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=12)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--multi", type=int, default=0,
                        help="K>0: run K steps per dispatch via lax.scan")
    parser.add_argument("--fast-precision", action="store_true",
                        help="bf16 matmul precision for fp32 tensors "
                             "(single-pass MXU instead of bf16x3)")
    args = parser.parse_args()

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    if args.fast_precision:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from tinyfaces_tpu.config import DetectorConfig, TrainConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from tinyfaces_tpu.trainer import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = DetectorConfig()
    tc = TrainConfig(batch_size=args.batch)
    templates = load_templates()

    model = TinyFacesDetector(
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32, remat=args.remat
    )
    params, batch_stats = init_model(model, jax.random.PRNGKey(0))
    tx = make_optimizer(tc, steps_per_epoch=1000)
    state = create_train_state(model, params, batch_stats, tx)

    mesh = make_mesh()
    state = replicate_tree(state, mesh)
    step_fn = make_train_step(model, tx, cfg, templates)

    rng = np.random.default_rng(0)

    from bench_train import make_synthetic_train_batch

    def make_batch():
        return make_synthetic_train_batch(rng, args.batch, cfg)

    key = jax.random.PRNGKey(1)
    dtype = ("bf16" if args.bf16 else "fp32") + ("/fastmm" if args.fast_precision else "")

    if args.multi > 0:
        from tinyfaces_tpu.trainer import make_multi_train_step

        multi_fn = make_multi_train_step(model, tx, cfg, templates)

        def stack():
            bs = [make_batch() for _ in range(args.multi)]
            return shard_batch(
                {k: np.stack([b[k] for b in bs]) for k in bs[0]}, mesh
            )

        t0 = time.time()
        state, lbs = multi_fn(state, stack(), key)
        jax.block_until_ready(lbs.total)
        print(f"compile+first call: {time.time() - t0:.1f}s")

        t0 = time.time()
        for _ in range(args.iters):
            state, lbs = multi_fn(state, stack(), key)
        jax.block_until_ready(lbs.total)
        dt = (time.time() - t0) / (args.iters * args.multi)
        print(
            f"train_step[{dtype} scan x{args.multi}] batch={args.batch}: "
            f"{dt * 1e3:.1f} ms/step, {args.batch / dt:.2f} images/sec/chip"
        )
        clean_exit()

    t0 = time.time()
    state, lb = step_fn(state, shard_batch(make_batch(), mesh), key)
    jax.block_until_ready(lb.total)
    print(f"compile+first step: {time.time() - t0:.1f}s  loss={float(lb.total):.1f}")

    # steady state, host prep + transfer included
    t0 = time.time()
    for _ in range(args.iters):
        state, lb = step_fn(state, shard_batch(make_batch(), mesh), key)
    jax.block_until_ready(lb.total)
    dt = (time.time() - t0) / args.iters

    print(
        f"train_step[{dtype}{'+remat' if args.remat else ''}] "
        f"batch={args.batch}: {dt * 1e3:.1f} ms/step, "
        f"{args.batch / dt:.2f} images/sec/chip"
    )
    clean_exit()


if __name__ == "__main__":
    main()
