"""Unit tests for the bench's hardened window-timing methodology (round-5:
the round-4 driver artifact was invalidated by a tunnel hiccup that made one
timing window ~1000x the real rate)."""
import pytest

from bench import MAX_REL_SPREAD, robust_rates


def _fake_timer(durations):
    it = iter(durations)
    return lambda: next(it)


def test_all_good_windows():
    rates, info = robust_rates(
        _fake_timer([0.10, 0.11, 0.10, 0.09, 0.10]),
        steps_per_window=1000, num_windows=5, min_window_sec=1e-4,
    )
    assert len(rates) == 5
    assert info["impossible_windows"] == 0
    assert info["outlier_windows"] == 0


def test_impossible_window_discarded_and_retimed():
    # Third window "completes" in 1 us — the BENCH_r04 failure mode.  It
    # must be discarded and replaced by the extra budget.
    rates, info = robust_rates(
        _fake_timer([0.10, 0.105, 1e-6, 0.10, 0.095, 0.10, 0.10]),
        steps_per_window=1000, num_windows=5, min_window_sec=1e-4,
    )
    assert len(rates) == 5
    assert info["impossible_windows"] == 1
    med = sorted(rates)[len(rates) // 2]
    assert (max(rates) - min(rates)) / med <= MAX_REL_SPREAD


def test_gross_outlier_dropped():
    # A window 10x too fast but above the physical floor: caught by the
    # running-median outlier rejection instead.
    rates, info = robust_rates(
        _fake_timer([0.10, 0.11, 0.01, 0.10, 0.09, 0.10]),
        steps_per_window=1000, num_windows=5, min_window_sec=1e-4,
    )
    assert len(rates) == 5
    assert info["outlier_windows"] == 1
    assert max(rates) / min(rates) < 1.5


def test_hopeless_tunnel_runs_out_of_budget():
    durations = [1e-6] * 20
    rates, info = robust_rates(
        _fake_timer(durations), steps_per_window=1000, num_windows=5,
        max_extra=5, min_window_sec=1e-4,
    )
    assert len(rates) < 3
    assert info["timed_windows"] == 10  # num_windows + max_extra, no spin
