"""CTC beam search / timestamps + new callbacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemo_tpu.core.callbacks import EarlyStopping, EMACallback, StragglerDetectionCallback
from nemo_tpu.models.asr.parts.ctc_beam import (
    ctc_greedy_with_timestamps,
    ctc_prefix_beam_search,
)


def _peaked(seq, V=5):
    lp = np.full((len(seq), V), -8.0)
    for t, v in enumerate(seq):
        lp[t, v] = -0.01
    return lp


def test_beam_matches_greedy_on_peaked():
    lp = _peaked([0, 0, 4, 1, 1, 4, 2, 4])
    beams = ctc_prefix_beam_search(lp, beam_size=8)
    assert beams[0][0] == [0, 1, 2]
    assert beams[0][1] > beams[-1][1]


def test_beam_sums_paths():
    """Beam search must sum probability over alignments: an ambiguous frame
    that greedy resolves wrong can be recovered."""
    V = 3  # tokens {0,1}, blank=2
    lp = np.log(np.array([
        [0.45, 0.05, 0.50],   # slight preference for 0 / blank
        [0.45, 0.05, 0.50],
    ], np.float64))
    beams = ctc_prefix_beam_search(lp, beam_size=8)
    # prefix [0] accumulates over (0,-),( -,0),(0,0) paths and must beat blank-only
    assert beams[0][0] == [0]


def test_timestamps_spans():
    lp = _peaked([4, 0, 0, 0, 4, 1])
    out = ctc_greedy_with_timestamps(lp, frame_duration=0.1)
    assert out["tokens"] == [0, 1]
    t0 = out["timestamps"][0]
    assert abs(t0["start"] - 0.1) < 1e-9 and abs(t0["end"] - 0.4) < 1e-9


def test_early_stopping():
    class T:  # minimal trainer stub
        should_stop = False

    t = T()
    es = EarlyStopping(monitor="loss", patience=2)
    for v in [1.0, 0.9, 0.95, 0.96]:
        es.on_validation(t, 0, {"loss": v})
    assert t.should_stop


def test_ema_callback():
    class State:
        params = {"w": jnp.ones(3)}

    class T:
        state = State()

    t = T()
    ema = EMACallback(decay=0.5)
    ema.on_step_end(t, 0, {})
    t.state.params = {"w": jnp.zeros(3)}
    ema.on_step_end(t, 1, {})
    np.testing.assert_allclose(np.asarray(t.ema_params["w"]), 0.5)


def test_straggler_detection(caplog):
    class T:
        pass

    s = StragglerDetectionCallback(threshold=2.0)
    metrics = {}
    for i in range(12):
        m = {"step_time": 0.1}
        s.on_step_end(T(), i, m)
    m = {"step_time": 1.0}
    s.on_step_end(T(), 99, m)
    assert m.get("straggler") == 1.0


def test_nan_guard_callback():
    from nemo_tpu.core.callbacks import NanGuardCallback

    class T:
        should_stop = False

    import pytest as _pytest

    g = NanGuardCallback(action="raise")
    g.on_step_end(T(), 0, {"loss": 1.0, "grad_norm": 2.0})  # fine
    with _pytest.raises(FloatingPointError):
        g.on_step_end(T(), 1, {"loss": float("nan")})

    g2 = NanGuardCallback(action="stop", patience=1)
    t = T()
    g2.on_step_end(t, 0, {"loss": float("inf")})  # tolerated once
    assert not t.should_stop
    g2.on_step_end(t, 1, {"loss": float("nan")})
    assert t.should_stop
    # recovery resets the counter
    g3 = NanGuardCallback(action="stop", patience=1)
    t3 = T()
    g3.on_step_end(t3, 0, {"loss": float("nan")})
    g3.on_step_end(t3, 1, {"loss": 1.0})
    g3.on_step_end(t3, 2, {"loss": float("nan")})
    assert not t3.should_stop


def test_speed_runtime_optimizer_monitors():
    """SpeedMonitor/RuntimeEstimator/OptimizerMonitor enrich step metrics."""
    from nemo_tpu.core.callbacks import (
        OptimizerMonitor, RuntimeEstimator, SpeedMonitor, TimingCallback)

    class FakeState:
        params = {"w": jnp.ones((4, 4))}

    class FakeTrainer:
        max_steps = 100
        state = FakeState()

    cbs = [TimingCallback(), SpeedMonitor(tokens_per_step=1000),
           RuntimeEstimator(log_every=50), OptimizerMonitor(every_n_steps=50)]
    tr = FakeTrainer()
    metrics = {}
    for cb in cbs:
        cb.on_step_start(tr, 50)
    import time as _time
    _time.sleep(0.01)
    for cb in cbs:
        cb.on_step_end(tr, 50, metrics)
    assert metrics["tokens_per_sec"] > 0
    assert "eta_minutes" in metrics
    assert abs(metrics["param_norm"] - 4.0) < 1e-5


def test_layer_freeze_schedule():
    """layer_freeze zeroes updates for matching paths until the scheduled
    step (-1 = forever); other params train normally."""
    import optax

    from nemo_tpu.core.optim import layer_freeze

    params = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    opt = optax.chain(layer_freeze({"encoder/*": 2, "head/*": -1}),
                      optax.sgd(1.0))
    state = opt.init(params)
    g = {"encoder": {"w": jnp.ones(3)}, "head": {"w": jnp.ones(3)}}
    p = params
    for step in range(4):
        updates, state = opt.update(g, state, p)
        p = optax.apply_updates(p, updates)
    # encoder frozen for steps 0,1 → moved for steps 2,3 only
    np.testing.assert_allclose(np.asarray(p["encoder"]["w"]), 1.0 - 2.0)
    # head frozen forever
    np.testing.assert_allclose(np.asarray(p["head"]["w"]), 1.0)
