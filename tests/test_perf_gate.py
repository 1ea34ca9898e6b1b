"""Perf-regression gate (scripts/perf_gate.py; VERDICT r4 next-item 3).

The gate is what makes the frozen per-round rooflines enforceable, so its
own failure modes — missed regressions, dropped metrics reading as green,
typo'd waivers gating nothing — get direct tests.
"""

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "perf_gate",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "perf_gate.py"),
)
perf_gate = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(perf_gate)


def _write(path, ledger):
    with open(path, "w") as f:
        json.dump(ledger, f)
    return str(path)


PREV = {
    "mode": "all",
    "reconstruct_bf16": {"batch": 16, "ms_per_batch": 72.84,
                         "imgs_per_sec": 219.7},
    "train_step_bf16": {"batch": 16, "ms_per_step": 257.09,
                        "imgs_per_sec": 62.2},
    "sr_pipeline_512_ddim50": {"timing_ms": {"total": 14.94},
                               "throughput_imgs_per_sec": 66.92},
}


def test_tracked_leaves_selects_throughput_only():
    leaves = perf_gate.tracked_leaves(PREV)
    assert leaves == {
        "reconstruct_bf16.imgs_per_sec": 219.7,
        "train_step_bf16.imgs_per_sec": 62.2,
        "sr_pipeline_512_ddim50.throughput_imgs_per_sec": 66.92,
    }  # ms twins + batch sizes + mode string excluded


def test_pass_within_tolerance_and_new_metric(tmp_path, capsys):
    prev = _write(tmp_path / "PERF_r04.json", PREV)
    cur = dict(PREV)
    cur["reconstruct_bf16"] = {"batch": 16, "imgs_per_sec": 215.0}  # -2.1%
    cur["encode_latents_bulk"] = {"pairs_per_sec_uncompressed": 5.0}  # new
    cur_p = _write(tmp_path / "PERF_r05.json", cur)
    assert perf_gate.main([cur_p, "--against", prev]) == 0
    out = capsys.readouterr().out
    assert "NEW     encode_latents_bulk.pairs_per_sec_uncompressed" in out
    assert "PASS" in out


def test_regression_beyond_tolerance_fails(tmp_path, capsys):
    prev = _write(tmp_path / "PERF_r04.json", PREV)
    cur = dict(PREV)
    cur["train_step_bf16"] = {"batch": 16, "imgs_per_sec": 55.0}  # -11.6%
    cur_p = _write(tmp_path / "PERF_r05.json", cur)
    assert perf_gate.main([cur_p, "--against", prev]) == 1
    assert "REGRESS" in capsys.readouterr().out
    # ... but a loosened tolerance or an explicit waiver passes (and the
    # waiver is printed so it lands in the round record).
    assert perf_gate.main([cur_p, "--against", prev,
                           "--tolerance", "0.15"]) == 0
    assert perf_gate.main([cur_p, "--against", prev, "--waive",
                           "train_step_bf16.imgs_per_sec"]) == 0
    assert "WAIVED" in capsys.readouterr().out


def test_dropped_metric_fails(tmp_path, capsys):
    prev = _write(tmp_path / "PERF_r04.json", PREV)
    cur = {k: v for k, v in PREV.items() if k != "sr_pipeline_512_ddim50"}
    cur_p = _write(tmp_path / "PERF_r05.json", cur)
    assert perf_gate.main([cur_p, "--against", prev]) == 1
    assert "missing now" in capsys.readouterr().out


def test_unknown_waiver_fails(tmp_path):
    prev = _write(tmp_path / "PERF_r04.json", PREV)
    cur_p = _write(tmp_path / "PERF_r05.json", PREV)
    assert perf_gate.main([cur_p, "--against", prev,
                           "--waive", "tyop.imgs_per_sec"]) == 1


def test_previous_ledger_autodetect(tmp_path):
    _write(tmp_path / "PERF_r02.json", PREV)
    p4 = _write(tmp_path / "PERF_r04.json", PREV)
    cur = _write(tmp_path / "PERF_r05.json", PREV)
    assert perf_gate.previous_ledger(cur) == p4  # latest M < N, not r02
    assert perf_gate.main([cur]) == 0
    # First round: nothing to gate, passes with a note.
    solo = _write(tmp_path / "PERF_r01.json", PREV)
    os.remove(tmp_path / "PERF_r02.json")
    os.remove(p4)
    os.remove(cur)
    assert perf_gate.previous_ledger(solo) is None
    assert perf_gate.main([solo]) == 0


def test_empty_current_ledger_fails(tmp_path):
    prev = _write(tmp_path / "PERF_r04.json", PREV)
    cur_p = _write(tmp_path / "PERF_r05.json", {"mode": "all"})
    assert perf_gate.main([cur_p, "--against", prev]) == 1
