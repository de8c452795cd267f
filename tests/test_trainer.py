import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.config import DetectorConfig, TrainConfig
from tinyfaces_tpu.data import load_templates
from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
from tinyfaces_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from tinyfaces_tpu.trainer import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    save_checkpoint,
    load_checkpoint,
)

TINY_STAGES = (1, 1, 1)
CFG = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=8)
TC = TrainConfig(batch_size=8)


def _toy_batch(b, cfg):
    rng = np.random.default_rng(0)
    return {
        "image": rng.integers(0, 255, (b, *cfg.input_size, 3), dtype=np.uint8),
        "gt_boxes": np.tile(np.array([[20.0, 20, 60, 70]], np.float32), (b, cfg.max_gt, 1)),
        "gt_valid": np.tile(np.arange(cfg.max_gt) < 1, (b, 1)),
        "paste_box": np.tile(np.array([0, 0, 128, 128], np.float32), (b, 1)),
        "flip": np.zeros(b, bool),
    }


def _setup():
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=TINY_STAGES)
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), input_size=CFG.input_size)
    tx = make_optimizer(TC, steps_per_epoch=10)
    state = create_train_state(model, params, batch_stats, tx)
    return templates, model, tx, state


def test_lr_schedule_staircase():
    sched = make_lr_schedule(TC, steps_per_epoch=10)  # decay every 200 steps
    np.testing.assert_allclose(float(sched(0)), TC.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(199)), TC.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(200)), TC.lr * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(400)), TC.lr * 0.01, rtol=1e-6)


def test_upsample_frozen_and_group_lrs():
    templates, model, tx, state = _setup()
    step_fn = make_train_step(model, tx, CFG, templates)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(4, CFG).items()}
    old_params = jax.device_get(state.params)

    state2, lb = step_fn(state, batch, jax.random.PRNGKey(0))
    new_params = jax.device_get(state2.params)

    # frozen bilinear upsampler: bit-identical
    np.testing.assert_array_equal(
        old_params["score4_upsample"]["kernel"], new_params["score4_upsample"]["kernel"]
    )
    # every other group moved
    for group in ("backbone", "score_res3", "score_res4"):
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(a - b).sum()), old_params[group], new_params[group]
        )
        assert sum(jax.tree_util.tree_leaves(diff)) > 0, group
    assert np.isfinite(float(lb.total))
    assert int(jax.device_get(state2.step)) == 1


def test_train_step_on_8_device_mesh():
    templates, model, tx, state = _setup()
    mesh = make_mesh(jax.devices()[:8])
    state = replicate_tree(state, mesh)
    batch = shard_batch(_toy_batch(8, CFG), mesh)

    step_fn = make_train_step(model, tx, CFG, templates)
    state, lb = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(lb.total))

    # params stay replicated after the update
    leaf = state.params["score_res3"]["kernel"]
    assert leaf.sharding.is_fully_replicated


def test_loss_decreases_over_steps():
    templates, model, tx, state = _setup()
    step_fn = make_train_step(model, tx, CFG, templates)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(4, CFG).items()}

    first = None
    for i in range(8):
        state, lb = step_fn(state, batch, jax.random.PRNGKey(2))
        if first is None:
            first = float(lb.total)
    assert float(lb.total) < first


def test_checkpoint_roundtrip(tmp_path):
    templates, model, tx, state = _setup()
    step_fn = make_train_step(model, tx, CFG, templates)
    batch = {k: jnp.asarray(v) for k, v in _toy_batch(2, CFG).items()}
    state, _ = step_fn(state, batch, jax.random.PRNGKey(3))

    path = save_checkpoint(state, epoch=7, batch_size=2, save_path=tmp_path,
                           filename="checkpoint_7")
    abstract = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.zeros((), np.int32),
        "epoch": np.zeros((), np.int64),
        "batch_size": np.zeros((), np.int64),
    }
    restored = load_checkpoint(path, abstract)
    assert int(restored["epoch"]) == 7
    assert int(restored["step"]) == 1
    np.testing.assert_array_equal(
        restored["params"]["score_res3"]["kernel"],
        jax.device_get(state.params)["score_res3"]["kernel"],
    )


def test_multi_step_scan_matches_sequential():
    from tinyfaces_tpu.trainer import make_multi_train_step

    templates, model, tx, state0 = _setup()
    batches = [_toy_batch(2, CFG) for _ in range(3)]
    key = jax.random.PRNGKey(9)

    # sequential
    step_fn = make_train_step(model, tx, CFG, templates)
    state_a = state0
    for hb in batches:
        state_a, lb_a = step_fn(state_a, {k: jnp.asarray(v) for k, v in hb.items()}, key)

    # scanned: stack batches on a leading K axis
    templates2, model2, tx2, state_b = _setup()
    multi_fn = make_multi_train_step(model2, tx2, CFG, templates2)
    stacked = {
        k: jnp.asarray(np.stack([hb[k] for hb in batches])) for k in batches[0]
    }
    state_b, lbs = multi_fn(state_b, stacked, key)

    assert lbs.total.shape == (3,)
    assert int(jax.device_get(state_b.step)) == 3
    np.testing.assert_allclose(float(lbs.total[-1]), float(lb_a.total), rtol=1e-3)
    a = jax.device_get(state_a.params)["score_res3"]["kernel"]
    b = jax.device_get(state_b.params)["score_res3"]["kernel"]
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_nan_guard_drops_poisoned_update():
    """nan_guard=True: a batch that produces a non-finite loss must leave
    params/opt_state/batch_stats EXACTLY unchanged (step still advances);
    without the guard the same batch poisons the weights."""
    templates, model, tx, state = _setup()
    state = jax.device_get(state)
    batch = _toy_batch(4, CFG)
    # poison one head weight with NaN: the forward then yields a non-finite
    # loss, the classic mid-training blow-up the guard exists for
    state.params["score_res3"]["kernel"] = np.array(
        state.params["score_res3"]["kernel"]
    )
    state.params["score_res3"]["kernel"][0, 0, 0, 0] = np.nan

    def run(nan_guard):
        st = jax.tree_util.tree_map(jnp.asarray, state)
        fn = make_train_step(model, tx, CFG, templates, nan_guard=nan_guard)
        st2, lb = fn(st, {k: jnp.asarray(v) for k, v in batch.items()},
                     jax.random.PRNGKey(0))
        return jax.device_get(st2), float(lb.total)

    guarded, loss_g = run(True)
    assert not np.isfinite(loss_g)  # loss still reported
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, guarded.params, state.params
    )
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, guarded.opt_state, state.opt_state
    )
    assert int(guarded.step) == int(state.step) + 1

    unguarded, _ = run(False)
    poisoned = not np.isfinite(
        np.concatenate([np.ravel(x) for x in
                        jax.tree_util.tree_leaves(unguarded.params)])
    ).all()
    assert poisoned


def test_async_checkpoint_roundtrip(tmp_path):
    """block=False returns immediately; after wait_for_checkpoints the
    checkpoint restores bit-identically."""
    from tinyfaces_tpu.trainer import (
        load_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    templates, model, tx, state = _setup()
    host = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.zeros((), np.int32),
        "epoch": np.zeros((), np.int64),
        "batch_size": np.zeros((), np.int64),
    }
    path = save_checkpoint(state, epoch=3, batch_size=8, save_path=tmp_path,
                           filename="ck_async", block=False)
    wait_for_checkpoints()
    restored = load_checkpoint(path, host)
    assert int(restored["epoch"]) == 3 and int(restored["batch_size"]) == 8
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, restored["params"], host["params"]
    )
