import time

import numpy as np

import jax

from etude_tpu.parallel.prefetch import DevicePrefetcher, prefetch_to_mesh
from etude_tpu.parallel.mesh import make_mesh
from etude_tpu.utils.profiling import StageTimer, annotate, trace


def test_stage_timer_spans():
    timer = StageTimer()
    with timer.span("a"):
        time.sleep(0.01)
    with timer.span("b"):
        pass
    summary = timer.summary()
    assert set(summary) == {"a", "b"}
    assert summary["a"] >= 0.01
    timer.print_summary()


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("ETUDE_TRACE_DIR", raising=False)
    with trace():
        pass  # no-op path


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path)):
        with annotate("span"):
            jax.numpy.ones(8).block_until_ready()
    # jax profiler writes a plugins/profile subtree.
    assert any(tmp_path.rglob("*.xplane.pb"))


def test_prefetcher_yields_all_batches():
    batches = [{"x": np.full((4,), i)} for i in range(5)]
    out = list(DevicePrefetcher(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["x"]), i)


def test_prefetcher_propagates_errors():
    def gen():
        yield {"x": np.zeros(2)}
        raise ValueError("boom")

    it = DevicePrefetcher(gen())
    next(it)
    try:
        next(it)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_prefetch_to_mesh_shards_batches():
    mesh = make_mesh(data_parallel=8)
    batches = [{"x": np.arange(32 * 3, dtype=np.int32).reshape(32, 3)}]
    out = list(prefetch_to_mesh(iter(batches), mesh, accum_steps=2))
    assert len(out) == 1
    x = out[0]["x"]
    assert x.shape == (2, 16, 3)
    assert not x.sharding.is_fully_replicated
