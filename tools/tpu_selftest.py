"""On-hardware self-test: compiled Pallas assignment vs the XLA path.

The pytest suite exercises the Pallas kernel in interpreter mode (CPU);
this tool validates the COMPILED kernel on a real chip — label parity with
the XLA broadcast path (mismatches only at tie-noise level), regression
equality on agreeing positives, and a timing comparison.

Usage: python tools/tpu_selftest.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    from tinyfaces_tpu.utils.runtime import clean_exit, enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.ops.assignment import assign_targets, compute_pad_mask
    from tinyfaces_tpu.ops.pallas_assignment import assign_targets_fused

    rf = dict(ofx=-1.0, ofy=-1.0, stx=8.0, sty=8.0)
    batch, g = 12, 192
    templates = load_templates()
    tj = jnp.asarray(templates, jnp.float32)

    rng = np.random.default_rng(0)
    gt = np.zeros((batch, g, 4), np.float32)
    valid = np.zeros((batch, g), bool)
    for b in range(batch):
        n = int(rng.integers(5, 60))
        x1 = rng.uniform(0, 450, n)
        y1 = rng.uniform(0, 450, n)
        gt[b, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(8, 120, n), y1 + rng.uniform(8, 120, n)], 1
        )
        valid[b, :n] = True
    gtj, vj = jnp.asarray(gt), jnp.asarray(valid)

    pad = compute_pad_mask(
        jnp.asarray([0, 0, 500, 500], jnp.float32), tj, vsx=63, vsy=63, **rf
    )
    pads = jnp.broadcast_to(pad, (batch, *pad.shape))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    xla_fn = jax.jit(jax.vmap(lambda a, b_, p, k: assign_targets(
        a, b_, p, tj, k, pos_thresh=0.7, neg_thresh=0.3, **rf)[:2]))
    pal_fn = jax.jit(jax.vmap(lambda a, b_, p, k: assign_targets_fused(
        a, b_, p, tj, k, pos_thresh=0.7, neg_thresh=0.3, **rf)))

    print("compiling XLA path (slow, materializes (Y,X,T,G))...")
    cx, rx = (np.asarray(v) for v in xla_fn(gtj, vj, pads, keys))
    print("compiling Pallas path...")
    cp, rp = (np.asarray(v) for v in pal_fn(gtj, vj, pads, keys))

    mismatch = (cx != cp).mean()
    agree = np.concatenate([(cx == cp) & (cx > 0)] * 4, axis=3)
    reg_diff = float(np.abs(rx - rp)[agree].max()) if agree.any() else 0.0
    print(f"label mismatch rate: {mismatch:.2e} (tie-noise only; expect <1e-3)")
    print(f"regression max diff on agreeing positives: {reg_diff:.2e}")
    print(f"positives: xla={int((cx == 1).sum())} pallas={int((cp == 1).sum())}")

    def timeit(fn):
        forced = jax.jit(lambda *a: sum(jnp.sum(x) for x in fn.__wrapped__(*a))
                         if hasattr(fn, "__wrapped__") else None)
        ts = []
        for _ in range(20):
            t0 = time.time()
            out = fn(gtj, vj, pads, keys)
            float(jnp.sum(out[0]))
            ts.append(time.time() - t0)
        return float(np.median(ts) * 1e3)

    print(f"xla: {timeit(xla_fn):.1f} ms/batch, pallas: {timeit(pal_fn):.1f} ms/batch "
          f"(both incl. ~35 ms dispatch+fetch)")

    ok = mismatch < 1e-3 and reg_diff < 1e-3
    print("SELFTEST", "PASS" if ok else "FAIL")
    clean_exit(0 if ok else 1)


if __name__ == "__main__":
    main()
