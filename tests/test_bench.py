"""Driver contract: bench.py prints exactly one parseable JSON line."""

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_bench_json_line():
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--platform", "cpu",
         "--impl", "xla", "--envs", "64", "--steps", "4", "--repeats", "2"],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    # every extra key is an annotation (roofline %, batch spread)
    assert all(
        k.endswith(("_pct", "_env_steps_per_sec"))
        for k in set(rec) - {"metric", "value", "unit", "vs_baseline"}
    ), rec
    assert rec["unit"] == "env-steps/s"
    assert rec["value"] > 0


def test_perf_envelope_not_stale():
    """The published README/VALIDATION perf ranges are generated spans
    (scripts/update_perf_envelope.py, VERDICT r4 item 4) — a fresh
    regeneration from the recorded captures must be a no-op, so the
    published envelope can never silently diverge from the evidence."""
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "update_perf_envelope.py"),
         "--check"],
        capture_output=True, text=True, timeout=60, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stdout + out.stderr


def test_bench_race_json_line():
    out = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), "--platform", "cpu",
         "--impl", "race", "--drones", "1", "--envs", "128", "--steps", "2",
         "--repeats", "1"],
        capture_output=True, text=True, timeout=600, cwd=str(ROOT),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["value"] > 0
