"""Unit tests for bench.py's pallas differential gate (VERDICT r2 item 6:
a bench must not report a pallas number whose compiled kernel failed — or
skipped — its differential tests). The gate subprocess is stubbed; the
real compiled run happens on the chip via `bench.py ab`."""

import sys
import types

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench  # noqa: E402


class _Result:
    def __init__(self, returncode, stdout):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = ""


def _patch_run(monkeypatch, result, captured):
    import subprocess

    def fake_run(cmd, **kw):
        captured["cmd"] = cmd
        return result

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_gate_passes_when_tests_ran(monkeypatch):
    captured = {}
    _patch_run(monkeypatch, _Result(0, "5 passed in 12.3s"), captured)
    bench._pallas_differential_gate()
    # path is anchored to the repo, not the cwd (exit-4 collection errors
    # from another cwd used to be misreported as kernel failures)
    test_arg = [a for a in captured["cmd"] if a.endswith(".py")][0]
    assert test_arg.startswith("/") and "tests/test_pallas_tpu.py" in test_arg


def test_gate_rejects_failure(monkeypatch):
    _patch_run(monkeypatch, _Result(1, "1 failed"), {})
    with pytest.raises(SystemExit, match="failed its differential"):
        bench._pallas_differential_gate()


def test_gate_rejects_vacuous_all_skipped(monkeypatch):
    # all requires_tpu tests skipped (e.g. TPU plugin absent): exit 0 but
    # nothing was proven — the gate must refuse
    _patch_run(monkeypatch, _Result(0, "7 skipped in 0.5s"), {})
    with pytest.raises(SystemExit, match="0 tests"):
        bench._pallas_differential_gate()
