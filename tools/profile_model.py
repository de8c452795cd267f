"""Static cost analysis of the compiled programs (XLA cost model).

Prints FLOPs / bytes-accessed / peak-memory estimates for the forward pass
at each pyramid scale and for the train step — runs on any backend (uses
the local cost model, no device execution needed beyond compilation).

Usage: python tools/profile_model.py [--cpu]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def fmt(v):
    for unit in ("", "K", "M", "G", "T"):
        if abs(v) < 1000:
            return f"{v:.2f}{unit}"
        v /= 1000
    return f"{v:.2f}P"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--batch", type=int, default=16)
    args = parser.parse_args()

    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

    model = TinyFacesDetector(dtype=jnp.bfloat16)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0))
    variables = {"params": params, "batch_stats": batch_stats}

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))

    total_flops = 0.0
    for shp in ((192, 256), (384, 512), (768, 1024), (1536, 2048)):
        x = jnp.zeros((args.batch, *shp, 3), jnp.float32)
        compiled = fwd.lower(variables, x).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        total_flops += flops
        print(
            f"fwd {shp} batch={args.batch}: {fmt(flops)}FLOP, "
            f"{fmt(bytes_)}B accessed, arithmetic intensity "
            f"{flops / max(bytes_, 1):.1f}"
        )
    print(f"pyramid total: {fmt(total_flops)}FLOP "
          f"({fmt(total_flops / args.batch)}FLOP/image)")
    clean_exit()


if __name__ == "__main__":
    main()
