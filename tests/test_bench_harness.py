"""Unit tests for the bench harness's sample bookkeeping (no Spark).

The round-3 verdict's top item was the bench evidence channel; these pin
the two rules that keep the record honest:
  * the recorded time is the min over ALL samples — interference on this
    host is additive (a burst can only inflate a wall time), so a fast
    sample is valid evidence regardless of its probe bracket;
  * validity labels (under_sampled / unsettled) still come from the
    probe-clean subset, so a record resting on dirty-probed samples is
    flagged, never silently trusted.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import bench


def _s(sec, pre=1.0, post=1.0):
    return {"sec": sec, "pre": pre, "post": post}


def test_clean_samples_gate_on_probes_and_time_ratio():
    ss = [
        _s(10.0),                      # clean
        _s(9.0, pre=0.5),              # dirty pre
        _s(9.5, post=0.5),             # dirty post
        _s(25.0),                      # clean probes but > 2x best -> burst
    ]
    clean = bench._clean_samples(ss)
    assert [s["sec"] for s in clean] == [10.0]


def test_record_is_min_over_all_samples_not_min_over_clean(monkeypatch):
    """A probe-clean slow sample must not beat a faster sample whose
    post-probe caught a burst that landed after the measured work (the
    r3->r4 extract_two_phase 24.4s-vs-14.3s case)."""
    samples = iter(
        [
            (24.4, 1.0, 1.0),   # pass 0: slow but probe-clean
            (14.3, 1.0, 0.60),  # pass 1: fast, post-probe dirty
        ]
    )
    monkeypatch.setattr(bench, "_wait_quiet", lambda: next_probe[0])
    monkeypatch.setattr(bench, "_probe", lambda: next_probe[1])
    next_probe = [1.0, 1.0]

    clock = [0.0]

    def fake_perf():
        return clock[0]

    monkeypatch.setattr(bench.time, "perf_counter", fake_perf)

    def thunk():
        sec, pre, post = next(samples)
        next_probe[0], next_probe[1] = pre, post
        clock[0] += sec

    timings, ss, validity = bench._measure_interleaved(
        [("q", thunk)], min_clean=2, max_passes=2
    )
    assert timings["q"] == 14.3
    # ...and the honesty flag fires: only one clean sample < min_clean
    assert "q" in validity["under_sampled"]


def test_settled_requires_consistent_clean_samples():
    tight = [_s(10.0), _s(10.4)]
    spread = [_s(10.0), _s(14.0)]
    assert bench._settled(tight, target=2)
    assert not bench._settled(spread, target=2)
    assert not bench._settled([_s(10.0)], target=2)
