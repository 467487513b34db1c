"""LR scheduler policies (reference: core/optim/lr_scheduler.py ~20 policies)."""

def test_three_phase_and_sqrt_constant_schedules():
    """New reference policies: SquareRootConstantPolicy and the
    warmup-hold-anneal (WSD-family) pair follow their three phases."""
    from nemo_tpu.core.lr_schedulers import get_scheduler

    s = get_scheduler("SquareRootConstantPolicy", lr=1.0, constant_steps=100)
    assert abs(float(s(0)) - 0.1) < 1e-6          # 1/sqrt(100)
    assert abs(float(s(50)) - 0.1) < 1e-6
    assert abs(float(s(400)) - 0.05) < 1e-6       # 1/sqrt(400)

    for name, end_shape in [("WarmupHoldAnnealLinear", "linear"),
                            ("WarmupHoldAnnealOneMinusSquareRoot", "sqrt"),
                            ("WSD", "linear")]:
        s = get_scheduler(name, lr=1.0, max_steps=1000, warmup_steps=100,
                          hold_steps=400, min_lr=0.1)
        assert float(s(0)) <= 0.1 + 1e-6           # warmup start (min_lr floor)
        assert float(s(50)) > 0.4                  # mid-warmup rising
        assert abs(float(s(100)) - 1.0) < 0.02     # warmup end
        assert abs(float(s(300)) - 1.0) < 1e-6     # hold
        assert float(s(999)) <= 0.2                # near min at the end
        mid = float(s(750))                        # halfway through decay
        if end_shape == "linear":
            assert abs(mid - (1.0 - 0.9 * 0.5)) < 0.01
        else:
            assert abs(mid - max(0.1, 1.0 * (1 - 0.5 ** 0.5))) < 0.01


def test_all_registered_schedulers_finite():
    """Every registered policy yields finite positive lr across its run."""
    from nemo_tpu.core.lr_schedulers import (
        AVAILABLE_SCHEDULERS as SCHEDULERS, get_scheduler)

    for name in SCHEDULERS:
        kw = dict(lr=1e-3, max_steps=100, warmup_steps=10, constant_steps=10)
        if "Noam" in name:
            kw["d_model"] = 64
        s = get_scheduler(name, **kw)
        for step in (0, 5, 50, 99):
            v = float(s(step))
            assert v >= 0.0 and v == v, (name, step, v)
