"""bench.py perf regression gate (VERDICT r4 item 2).

Done-condition: a deliberately slowed build must fail bench with a
nonzero exit. The gate is pure host logic, so it is unit-testable without
the chip: _perf_gate reads the committed BENCH_BASELINE.json and exits(1)
when the measured value drops >10% below the accepted number.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

METRIC = "pointrcnn_inference_scans_per_sec_per_chip"


def test_deliberate_slowdown_fails(monkeypatch):
    monkeypatch.delenv("MODEST_BENCH_NO_PERF_GATE", raising=False)
    with pytest.raises(SystemExit) as e:
        bench._perf_gate(METRIC, 4, 40.0)  # accepted is 58.187; floor ~52.4
    assert e.value.code == 1


def test_healthy_value_passes(monkeypatch):
    monkeypatch.delenv("MODEST_BENCH_NO_PERF_GATE", raising=False)
    bench._perf_gate(METRIC, 4, 58.2)  # no exit
    bench._perf_gate(METRIC, 4, 53.0)  # within 10% of 58.187


def test_unknown_batch_skips(monkeypatch):
    monkeypatch.delenv("MODEST_BENCH_NO_PERF_GATE", raising=False)
    bench._perf_gate(METRIC, 3, 1.0)  # no baseline for batch=3 -> skip


def test_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("MODEST_BENCH_NO_PERF_GATE", "1")
    bench._perf_gate(METRIC, 4, 1.0)  # dev A/B mode: no exit
