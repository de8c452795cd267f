import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.ops.nms import batched_nms_padded, nms
from tests.oracle import greedy_nms_oracle


def clustered_boxes(rng, n, n_clusters=6):
    centers = rng.uniform(50, 450, (n_clusters, 2))
    which = rng.integers(0, n_clusters, n)
    cx = centers[which, 0] + rng.normal(0, 6, n)
    cy = centers[which, 1] + rng.normal(0, 6, n)
    w = rng.uniform(20, 60, n)
    h = rng.uniform(20, 60, n)
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)


def test_matches_oracle():
    rng = np.random.default_rng(0)
    boxes = clustered_boxes(rng, 200)
    scores = rng.uniform(0, 1, 200)

    order, keep = jax.jit(nms, static_argnums=2)(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.3
    )
    got = np.sort(np.asarray(order)[np.asarray(keep)])
    want = np.sort(greedy_nms_oracle(boxes, scores, 0.3))
    np.testing.assert_array_equal(got, want)


def test_respects_validity_mask():
    rng = np.random.default_rng(1)
    boxes = clustered_boxes(rng, 64)
    scores = rng.uniform(0, 1, 64)
    valid = np.arange(64) < 40

    order, keep = nms(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.3,
        jnp.asarray(valid),
    )
    kept = np.asarray(order)[np.asarray(keep)]
    assert (kept < 40).all()
    want = np.sort(greedy_nms_oracle(boxes[:40], scores[:40], 0.3))
    np.testing.assert_array_equal(np.sort(kept), want)


def test_batched_padded_packs_results():
    rng = np.random.default_rng(2)
    boxes = clustered_boxes(rng, 128)
    scores = rng.uniform(0, 1, 128)
    valid = np.ones(128, dtype=bool)

    out_boxes, out_scores, out_valid = batched_nms_padded(
        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32), 0.3,
        jnp.asarray(valid), max_out=64,
    )
    ov = np.asarray(out_valid)
    n_kept = ov.sum()
    # packed: all valid rows first, scores descending
    assert (ov[:n_kept]).all() and not ov[n_kept:].any()
    s = np.asarray(out_scores)[:n_kept]
    assert (np.diff(s) <= 1e-6).all()
    want = greedy_nms_oracle(boxes, scores, 0.3)
    assert n_kept == min(64, len(want))


def test_blocked_matches_fixpoint_and_oracle():
    """The blocked scan path (N > 2*block) must produce the exact greedy
    keep set — same as the single full-matrix fixpoint and the float64
    oracle — including long suppression chains, ties, validity padding,
    and a non-divisible final block."""
    rng = np.random.default_rng(7)
    for n, block, nv in ((700, 128, 650), (1000, 256, 1000), (1337, 100, 900)):
        boxes = clustered_boxes(rng, n, n_clusters=4)
        # quantized scores force ties across block boundaries
        scores = np.round(rng.uniform(0, 1, n), 2)
        valid = np.arange(n) < nv

        fn = jax.jit(nms, static_argnums=(2, 4))
        order_b, keep_b = fn(
            jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            0.3, jnp.asarray(valid), block,
        )
        order_f, keep_f = fn(
            jnp.asarray(boxes, jnp.float32), jnp.asarray(scores, jnp.float32),
            0.3, jnp.asarray(valid), n,  # block >= n/2 -> full fixpoint
        )
        got_b = np.sort(np.asarray(order_b)[np.asarray(keep_b)])
        got_f = np.sort(np.asarray(order_f)[np.asarray(keep_f)])
        np.testing.assert_array_equal(got_b, got_f)

        want = np.sort(greedy_nms_oracle(boxes[valid], scores[valid], 0.3))
        np.testing.assert_array_equal(got_b, want)


def test_blocked_under_vmap_matches_per_image():
    """vmapped blocked NMS (the fused-pyramid call pattern) equals the
    per-image results."""
    rng = np.random.default_rng(9)
    b, n = 4, 900
    boxes = np.stack([clustered_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, n))
    valid = rng.random((b, n)) < 0.8

    fn = jax.vmap(lambda bb, ss, vv: batched_nms_padded(bb, ss, 0.3, vv, 128))
    ob, os_, ov = fn(jnp.asarray(boxes, jnp.float32),
                     jnp.asarray(scores, jnp.float32), jnp.asarray(valid))
    for i in range(b):
        o1, s1, v1 = batched_nms_padded(
            jnp.asarray(boxes[i], jnp.float32), jnp.asarray(scores[i], jnp.float32),
            0.3, jnp.asarray(valid[i]), 128,
        )
        np.testing.assert_array_equal(np.asarray(ov[i]), np.asarray(v1))
        np.testing.assert_allclose(np.asarray(ob[i]), np.asarray(o1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(os_[i]), np.asarray(s1), rtol=1e-6)
