"""LR-schedule policies from reference lr_config dicts (mmcv LrUpdater
semantics: step / cyclic one-cycle / CosineAnnealing)."""

import numpy as np

from nerfdet_tpu.train.optim import (build_lr_schedule,
                                     build_lr_schedule_from_config)


def test_step_policy_matches_legacy_builder():
    s_new = build_lr_schedule_from_config(2e-4, dict(step=(8, 11)), 100, 12)
    s_old = build_lr_schedule(2e-4, 100, decay_epochs=(8, 11))
    for t in (0, 500, 799, 800, 1099, 1100, 1199):
        assert abs(float(s_new(t)) - float(s_old(t))) < 1e-12, t


def test_step_policy_linear_warmup():
    s = build_lr_schedule_from_config(
        1e-3, dict(step=(20, 23), warmup="linear", warmup_iters=1000,
                   warmup_ratio=1e-3), 100, 24)
    assert abs(float(s(0)) - 1e-6) < 1e-9
    assert abs(float(s(1000)) - 1e-3) < 1e-9
    assert abs(float(s(1999)) - 1e-3) < 1e-9
    assert abs(float(s(2000)) - 1e-4) < 1e-9  # epoch-20 boundary decay


def test_cyclic_one_cycle():
    """cyclic_20e: 1e-4 -> 1e-3 (at 40% of the run) -> 1e-8, cosine
    interpolation both phases (reference CyclicLrUpdaterHook)."""
    c = build_lr_schedule_from_config(
        1e-4, dict(policy="cyclic", target_ratio=(10, 1e-4),
                   step_ratio_up=0.4), 100, 20)
    v = np.array([float(c(t)) for t in range(2000)])
    assert abs(v[0] - 1e-4) / 1e-4 < 0.02
    peak = int(v.argmax())
    assert abs(peak - 800) <= 2 and abs(v[peak] - 1e-3) / 1e-3 < 0.01
    assert v[-1] < 2e-7
    # monotone up then down
    assert (np.diff(v[: peak + 1]) >= -1e-12).all()
    assert (np.diff(v[peak:]) <= 1e-12).all()


def test_cosine_annealing_with_warmup():
    co = build_lr_schedule_from_config(
        3e-3, dict(policy="CosineAnnealing", warmup="linear",
                   warmup_iters=100, warmup_ratio=0.1,
                   min_lr_ratio=1e-5), 100, 80)
    assert abs(float(co(0)) - 3e-4) < 1e-9
    # at warmup end the cosine has advanced 100/8000 of the way
    assert abs(float(co(100)) - 3e-3) / 3e-3 < 1e-3
    assert float(co(7999)) < 1e-6
