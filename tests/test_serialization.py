import numpy as np

from tinyfaces_tpu.utils.serialization import (
    flatten_tree,
    save_npz,
    unflatten_npz,
    unflatten_tree,
)


def test_flatten_unflatten_roundtrip():
    tree = {
        "params": {
            "backbone": {"conv1": {"kernel": np.ones((3, 3, 3, 8))}},
            "score_res3": {"bias": np.zeros(5)},
        },
        "batch_stats": {"backbone": {"bn1": {"mean": np.arange(4.0)}}},
    }
    flat = flatten_tree(tree)
    assert set(flat) == {
        "params/backbone/conv1/kernel",
        "params/score_res3/bias",
        "batch_stats/backbone/bn1/mean",
    }
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(
        back["params"]["backbone"]["conv1"]["kernel"], np.ones((3, 3, 3, 8))
    )


def test_npz_roundtrip(tmp_path):
    tree = {"params": {"w": np.random.default_rng(0).normal(size=(4, 4))}}
    path = tmp_path / "w.npz"
    save_npz(path, tree)
    loaded = unflatten_npz(np.load(path))
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])


def test_load_weights_npz(tmp_path):
    """evaluation.load_weights picks up npz exports."""
    import jax

    from tinyfaces_tpu.evaluation import load_weights
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model

    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), (64, 64))
    path = tmp_path / "weights.npz"
    save_npz(path, {"params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats)})

    restored = load_weights(path)
    np.testing.assert_array_equal(
        restored["params"]["score_res3"]["kernel"],
        np.asarray(params["score_res3"]["kernel"]),
    )
    assert "backbone" in restored["batch_stats"]
