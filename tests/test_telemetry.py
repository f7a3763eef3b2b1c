"""Telemetry tests — mirror of reference ``tests/test_telemetry.py``:
timing accumulation, KSP stat recording (duck-typed CGInfo), periodic
logging, JSON summary save, summary ordering."""

import json
import logging
import time
from types import SimpleNamespace

from fenicsx_beat_tpu.telemetry import NullMonitor, PerformanceMonitor


def test_null_monitor():
    monitor = NullMonitor()
    with monitor.track_time("test_event"):
        pass
    monitor.record_ksp(None)
    monitor.advance_step(0.0, 0.1)


def test_performance_monitor_tracking():
    monitor = PerformanceMonitor()
    with monitor.track_time("dummy_work"):
        time.sleep(0.01)
    assert "dummy_work" in monitor.timings
    assert monitor.timings["dummy_work"] >= 0.01
    with monitor.track_time("dummy_work"):
        time.sleep(0.01)
    assert monitor.timings["dummy_work"] >= 0.02


def test_performance_monitor_record_ksp():
    monitor = PerformanceMonitor()
    info = SimpleNamespace(iterations=5, residual_norm=1e-6, converged=True)
    monitor.record_ksp(info)
    assert monitor.ksp_last_iterations == 5
    assert monitor.ksp_total_iterations == 5
    assert monitor.ksp_max_iterations == 5
    assert monitor.ksp_last_residual_norm == 1e-6
    assert monitor.ksp_last_converged_reason == 1

    monitor.record_ksp(SimpleNamespace(iterations=7, residual_norm=1e-7, converged=True))
    assert monitor.ksp_last_iterations == 7
    assert monitor.ksp_total_iterations == 12
    assert monitor.ksp_max_iterations == 7


def test_performance_monitor_logging(caplog):
    caplog.set_level(logging.INFO)
    monitor = PerformanceMonitor(log_frequency=2)
    with monitor.track_time("step_time"):
        pass
    monitor.advance_step(0.0, 0.1)
    assert len(caplog.records) == 0
    monitor.advance_step(0.1, 0.2)
    assert len(caplog.records) == 1
    assert "PDE step timing step=2" in caplog.records[0].message
    assert "step_time=" in caplog.records[0].message


def test_performance_monitor_save_summary(tmp_path):
    monitor = PerformanceMonitor()
    monitor.step_counter = 10
    monitor.ksp_total_iterations = 45
    monitor.timings["test_metric"] = 1.234

    filepath = tmp_path / "summary.json"
    monitor.save_summary(filepath)
    assert filepath.exists()
    data = json.loads(filepath.read_text())
    assert data["total_steps"] == 10
    assert data["ksp"]["total_iterations"] == 45
    assert data["timings"]["test_metric"] == 1.234


def test_performance_monitor_display(caplog):
    caplog.set_level(logging.INFO)
    monitor = PerformanceMonitor()
    monitor.step_counter = 5
    monitor.timings["fast_op"] = 0.1
    monitor.timings["slow_op"] = 5.0
    monitor.display_summary()

    assert len(caplog.records) == 1
    log_text = caplog.records[0].message
    assert "PERFORMANCE SUMMARY" in log_text
    assert "Total Steps:           5" in log_text
    # sorted descending by duration
    assert log_text.find("slow_op") < log_text.find("fast_op")
