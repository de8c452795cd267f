import jax
import jax.numpy as jnp
import numpy as np

from tinyfaces_tpu.parallel.distributed import (
    host_local_batch,
    initialize,
    process_batch_slice,
)
from tinyfaces_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise or spawn anything


def test_mesh_and_shardings():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.shape == {"data": 8}
    batch = {"x": np.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_equivalent_to(batch_sharding(mesh), 2)

    tree = replicate_tree({"w": jnp.ones((3, 3))}, mesh)
    assert tree["w"].sharding.is_fully_replicated


def test_host_local_batch_single_host():
    mesh = make_mesh(jax.devices()[:4])
    batch = {"x": np.arange(8.0).reshape(8, 1)}
    arr = host_local_batch(batch, mesh)["x"]
    assert arr.shape == (8, 1)
    np.testing.assert_array_equal(np.asarray(arr), batch["x"])


def test_process_batch_slice_single_host():
    s = process_batch_slice(24)
    assert (s.start, s.stop) == (0, 24)


def test_sharded_computation_reduces_over_mesh():
    mesh = make_mesh(jax.devices()[:8])
    x = shard_batch(np.ones((16, 4), np.float32), mesh)

    @jax.jit
    def f(x):
        return jnp.sum(x)

    assert float(f(x)) == 64.0


def test_loader_rank_world_slices_partition_global_batch():
    """Multi-host input feeding: the four rank slices of each global batch
    concatenate to exactly the single-host batch, in order."""
    from tinyfaces_tpu.data.loader import PrefetchLoader

    class Ds:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {"v": np.full((2,), i, np.int64)}

    full = list(PrefetchLoader(Ds(), 8, workers=2, shuffle=True, seed=3))
    parts = [
        list(PrefetchLoader(Ds(), 8, workers=2, shuffle=True, seed=3,
                            rank=r, world=4))
        for r in range(4)
    ]
    for b in range(len(full)):
        got = np.concatenate([parts[r][b]["v"] for r in range(4)])
        np.testing.assert_array_equal(got, full[b]["v"])


def test_train_step_1dev_vs_8dev_identical():
    """Data-parallel invariance + BN-stat globalization pin (parallel/
    mesh.py:9-12): one train step over the same global batch must produce
    the same params AND the same BatchNorm batch_stats on a 1-device mesh
    and an 8-device mesh — XLA globalizes the BN batch statistics over the
    data axis, it does not compute per-shard stats."""
    from tinyfaces_tpu.config import DetectorConfig, TrainConfig
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.trainer import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = DetectorConfig(input_size=(128, 128), heatmap_size=(16, 16), max_gt=8)
    tc = TrainConfig(batch_size=8)
    templates = load_templates()
    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     input_size=cfg.input_size)
    # the jitted step donates its input state — keep host copies to reuse
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)

    rng = np.random.default_rng(1)
    batch = {
        "image": rng.integers(0, 255, (8, 128, 128, 3), dtype=np.uint8),
        "gt_boxes": np.tile(np.array([[20.0, 20, 60, 70]], np.float32), (8, cfg.max_gt, 1)),
        "gt_valid": np.tile(np.arange(cfg.max_gt) < 1, (8, 1)),
        "paste_box": np.tile(np.array([0, 0, 128, 128], np.float32), (8, 1)),
        "flip": np.zeros(8, bool),
    }

    results = {}
    for ndev in (1, 8):
        tx = make_optimizer(tc, steps_per_epoch=10)
        state = create_train_state(model, params, batch_stats, tx)
        mesh = make_mesh(jax.devices()[:ndev])
        state = replicate_tree(state, mesh)
        sharded = shard_batch(batch, mesh)
        step_fn = make_train_step(model, tx, cfg, templates)
        state2, lb = step_fn(state, sharded, jax.random.PRNGKey(7))
        results[ndev] = (
            jax.device_get(state2.params),
            jax.device_get(state2.batch_stats),
            float(lb.total),
        )

    p1, bs1, l1 = results[1]
    p8, bs8, l8 = results[8]
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    # atol 5e-5: the 8-way gradient psum reassociates fp32 sums
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-5), p1, p8
    )
    # the BN running stats are the strongest signal: per-shard statistics
    # would differ wildly from global ones on an 8-way split of batch 8
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-4), bs1, bs8
    )


def test_two_process_distributed_cpu():
    """Real 2-process jax.distributed run over loopback: both processes must
    initialize, build the 8-device global mesh, feed their local batch
    halves, and converge to identical replicated parameters that match the
    single-process oracle of the same global computation."""
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    worker = Path(__file__).parent / "distributed_worker.py"
    import os

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + (
        (":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else ""
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(Path(__file__).parent.parent),
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    vals = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) wsum=([-\d.]+) loss=([-\d.]+)", out)
        assert m, out[-2000:]
        vals[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    assert set(vals) == {0, 1}
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-9)

    # single-process oracle of the same global computation
    xs = np.arange(32, dtype=np.float32).reshape(8, 4) / 10.0
    ys = np.arange(8, dtype=np.float32)[:, None] / 5.0
    w = np.ones((4, 1), np.float32) * 0.5
    for _ in range(2):
        g = 2.0 * xs.T @ (xs @ w - ys) / 8.0
        loss = float(np.mean((xs @ w - ys) ** 2))
        w = w - 0.01 * g
    np.testing.assert_allclose(vals[0][0], float(w.sum()), rtol=1e-5)
    np.testing.assert_allclose(vals[0][1], loss, rtol=1e-5)


def test_sigterm_stop_agreed_across_processes():
    """Failure handling (SURVEY.md §5): SIGTERM delivered to ONLY rank 1
    must stop BOTH ranks at the same epoch boundary via GracefulStop's
    allgather — rank 0 never sees the signal but must not enter the next
    epoch's collectives alone (deadlock). Drives the real class main.py
    uses, over real 2-process jax.distributed."""
    import os
    import re
    import signal
    import socket
    import subprocess
    import sys
    import time
    from pathlib import Path

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    worker = Path(__file__).parent / "sigterm_worker.py"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + (
        (":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else ""
    )
    epochs = 40  # far more than will run: the signal must cut it short
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, "2", str(pid), str(epochs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    try:
        # wait for rank 1 to reach its loop, then SIGTERM only it.
        # select() before each readline: a silent-but-alive worker (e.g.
        # blocked in jax.distributed.initialize because rank 0 died
        # pre-bind) must FAIL at the deadline, not hang the suite on a
        # blocking readline.
        import select

        deadline = time.time() + 120
        while True:
            remaining = deadline - time.time()
            if remaining <= 0:
                raise AssertionError("rank 1 never became ready")
            ready, _, _ = select.select([procs[1].stdout], [], [], remaining)
            if not ready:
                raise AssertionError("rank 1 never became ready")
            line = procs[1].stdout.readline()
            if "READY pid=1" in line:
                break
            if line == "" and procs[1].poll() is not None:
                raise AssertionError("rank 1 exited before READY")
        time.sleep(1.5)  # let a couple of epochs run first
        procs[1].send_signal(signal.SIGTERM)

        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    stops = {}
    for out in outs:
        m = re.search(r"STOPPED pid=(\d) epoch=(-?\d+)", out)
        assert m, out[-2000:]
        stops[int(m.group(1))] = int(m.group(2))
    assert set(stops) == {0, 1}
    assert stops[0] == stops[1], f"ranks stopped at different epochs: {stops}"
    assert 0 <= stops[0] < epochs, f"loop was not cut short: {stops}"


def test_spatial_forward_matches_replicated():
    """GSPMD spatial partitioning (parallel/spatial.py): the eval forward
    with the image H axis sharded over 8 devices must equal the single-device
    forward — XLA's halo exchanges feed every conv the same rows it would see
    unsharded, and eval-mode BatchNorm is elementwise."""
    from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model
    from tinyfaces_tpu.parallel.spatial import spatial_forward_fn, spatial_sharding

    model = TinyFacesDetector(stage_sizes=(1, 1, 1))
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     input_size=(64, 64))
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)

    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    mesh = make_mesh(jax.devices()[:8])
    fwd = spatial_forward_fn(model, mesh)
    out = fwd(variables, x)
    assert out.sharding.is_equivalent_to(spatial_sharding(mesh), out.ndim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_pyramid_detector_spatial_sharding_matches_unsharded():
    """The fused pyramid under shard="spatial" (H-axis GSPMD partitioning)
    returns the same detections as the meshless detector."""
    from tinyfaces_tpu.data import load_templates
    from tinyfaces_tpu.evaluation import PyramidDetector, get_model

    model, variables = get_model()
    templates = load_templates()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)

    base = PyramidDetector(model, variables, templates)
    mesh = make_mesh(jax.devices()[:8])
    sp = PyramidDetector(model, variables, templates, mesh=mesh,
                         shard="spatial")

    kw = dict(prob_thresh=0.03, nms_thresh=0.3, scales=(0,))
    d0 = base.detect(img, **kw)
    d1 = sp.detect(img, **kw)
    assert d0.shape == d1.shape
    if d0.shape[0]:
        # The sharded and unsharded programs are separate XLA compilations
        # with different fusion boundaries, so agreement is fp32-rounding
        # relative, not bitwise — and random-init weights push regressed box
        # coords to ~1e13 via exp(), where any absolute tolerance is
        # meaningless.
        np.testing.assert_allclose(d1, d0, rtol=1e-4, atol=1e-3)


def test_choose_eval_sharding_auto():
    from jax.sharding import PartitionSpec as P

    from tinyfaces_tpu.parallel.spatial import choose_eval_sharding

    mesh = make_mesh(jax.devices()[:8])
    assert choose_eval_sharding(None, 4) is None
    assert choose_eval_sharding(mesh, 16, "auto").spec == P("data")
    assert choose_eval_sharding(mesh, 1, "auto").spec == P(None, "data")
    assert choose_eval_sharding(mesh, 8, "batch").spec == P("data")
    assert choose_eval_sharding(mesh, 8, "spatial").spec == P(None, "data")


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(devices_per_proc: int) -> dict:
    import os
    from pathlib import Path

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    env.pop("JAX_PLATFORMS", None)
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo_root + (
        (":" + env["PYTHONPATH"]) if env.get("PYTHONPATH") else ""
    )
    return env


def _run_sharded_eval(tmp_path, world: int, n_images: int,
                      devices_per_proc: int = 4):
    """Multi-host evaluation (VERDICT r2 #6, widened to world=4 in r5):
    `world` real processes, each initializing jax.distributed over loopback
    and sweeping its rank::world slice of a synthetic val split into one
    shared results_dir. The merged file tree must equal the full image
    list, with no overlap between ranks."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    from PIL import Image

    # synthetic WIDER val tree
    root = tmp_path / "wider"
    d = root / "WIDER_val" / "images" / "0--Ev"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    ann = []
    for i in range(n_images):
        img = rng.integers(0, 255, (96, 112, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / f"im_{i}.jpg")
        ann += [f"0--Ev/im_{i}.jpg", "1", "10 10 20 20 0 0 0 0 0 0"]
    sd = root / "wider_face_split"
    sd.mkdir()
    (sd / "val.txt").write_text("\n".join(ann) + "\n")
    results = tmp_path / "results"

    port = _free_port()
    worker = Path(__file__).parent / "eval_shard_worker.py"
    env = _worker_env(devices_per_proc)
    repo_root = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", str(world),
             str(pid), str(root), str(results)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(world)
    ]
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            assert p.returncode == 0, out[-2000:]
            assert re.search(rf"EVAL_SHARD_OK pid=\d n={n_images}", out), \
                out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    files = sorted(f.name for f in results.glob("*/*.txt"))
    assert files == sorted(f"im_{i}.txt" for i in range(n_images))


def test_two_process_sharded_evaluation(tmp_path):
    _run_sharded_eval(tmp_path, world=2, n_images=6)


def test_four_process_sharded_evaluation(tmp_path):
    # 4 processes x 2 devices; 7 images -> uneven rank slices (2/2/2/1)
    _run_sharded_eval(tmp_path, world=4, n_images=7, devices_per_proc=2)


def test_four_process_train_checkpoint_resume(tmp_path):
    """World-4 training with a checkpoint/resume seam (r4 verdict #6): four
    real jax.distributed processes (2 virtual devices each, 8 global) run
    the REAL train stack. Phase `full` runs 4 steps straight through;
    `part1` runs 2 steps and rank 0 writes the orbax checkpoint; `part2`
    restores on ALL ranks and runs the remaining 2 steps. Every rank's
    params+opt_state digest must be bitwise-identical across ranks AND
    across the seam (full == part1;part2)."""
    import re
    import subprocess
    import sys
    from pathlib import Path

    worker = Path(__file__).parent / "train_resume_worker.py"
    env = _worker_env(devices_per_proc=2)
    repo_root = str(Path(__file__).parent.parent)
    world = 4

    def run_phase(phase: str) -> list[str]:
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), f"127.0.0.1:{port}",
                 str(world), str(pid), str(tmp_path), phase],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=env, cwd=repo_root,
            )
            for pid in range(world)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
                assert p.returncode == 0, out[-2000:]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return outs

    digests = {}
    for phase in ("full", "part1", "part2"):
        outs = run_phase(phase)
        if phase == "part1":
            assert all("SAVED" in o for o in outs), outs[0][-2000:]
            continue
        for out in outs:
            m = re.search(r"DIGEST pid=(\d) phase=(\w+) ([0-9a-f]{64})", out)
            assert m, out[-2000:]
            digests[(phase, int(m.group(1)))] = m.group(3)

    full = {digests[("full", r)] for r in range(world)}
    resumed = {digests[("part2", r)] for r in range(world)}
    assert len(full) == 1, f"ranks diverged in full run: {full}"
    assert len(resumed) == 1, f"ranks diverged after resume: {resumed}"
    assert full == resumed, (
        f"checkpoint seam changed the training trajectory: "
        f"full={full} resumed={resumed}"
    )
