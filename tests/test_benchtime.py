"""Robust bench timing policy (m3t_tpu/utils/benchtime.py).

Round 4's official bench record was ~50x slower than three reruns of the identical
command (axon tunnel pathology during the single timed window); these tests pin the
defense: medians resist injected slow windows, dispersion triggers bounded retries and
an ``unstable`` flag, and a whole-run sanity floor forces full re-measurement rounds.
"""

import pytest

from m3t_tpu.utils import benchtime


def _feeder(times):
    it = iter(times)

    def timed_window():
        return next(it)

    return timed_window


def test_injected_slow_window_does_not_poison_median():
    # One 50x-pathological window among five: the median must stay at the true
    # speed; the spread must expose the outlier; the single blip is forgiven by
    # the settling check (no retry burn, no unstable flag).
    good = 0.1
    stats = benchtime.measure_windows(
        _feeder([good, good, 5.0, good, good, good, good, good, good, good]),
        n_windows=5, max_extra=5)
    assert stats.median_s == pytest.approx(good)
    assert stats.max_s == pytest.approx(5.0)
    assert stats.rate(1.0) == pytest.approx(10.0)
    lo, hi = stats.rate_spread(1.0)
    assert lo == pytest.approx(0.2) and hi == pytest.approx(10.0)
    assert stats.n_extra == 0 and not stats.unstable


def test_stable_windows_no_retries():
    stats = benchtime.measure_windows(_feeder([0.1, 0.11, 0.1, 0.105, 0.1]),
                                      n_windows=5, max_extra=5)
    assert stats.n_extra == 0 and not stats.unstable
    assert len(stats.times) == 5


def test_persistent_dispersion_flags_unstable_with_bounded_retries():
    # Alternating 10x disagreement never settles: retries stop at the budget and
    # the record is flagged unstable.
    times = [0.1, 1.0] * 20
    stats = benchtime.measure_windows(_feeder(times), n_windows=4, max_extra=3)
    assert stats.unstable
    assert len(stats.times) == 7  # 4 + max_extra


def test_floor_triggers_full_rerun_and_best_round_wins():
    # Round 1 is uniformly pathological (every window 50x slow — per-window
    # medians cannot catch this); round 2 is healthy and must become the record.
    slow = [5.0] * 5
    fast = [0.1] * 5
    pauses = []
    stats = benchtime.measure_with_floor(
        _feeder(slow + fast), work_per_window=1.0, floor_rate=5.0,
        n_windows=5, max_rounds=3, pause=lambda: pauses.append(1))
    assert stats.median_s == pytest.approx(0.1)
    assert not stats.unstable
    assert pauses == [1]


def test_floor_never_met_returns_best_round_unstable():
    stats = benchtime.measure_with_floor(
        _feeder([5.0] * 5 + [4.0] * 5 + [6.0] * 5), work_per_window=1.0,
        floor_rate=5.0, n_windows=5, max_rounds=3)
    assert stats.median_s == pytest.approx(4.0)
    assert stats.unstable


def test_no_floor_is_single_round():
    calls = []

    def timed_window():
        calls.append(1)
        return 0.1

    stats = benchtime.measure_with_floor(timed_window, 1.0, floor_rate=0.0,
                                         n_windows=3)
    assert len(calls) == 3 and stats.median_s == pytest.approx(0.1)
