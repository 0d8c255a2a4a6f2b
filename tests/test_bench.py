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


def test_perf_envelope_mechanics(tmp_path):
    """Unit-level pins for the envelope generator: capture collection
    maps BENCH keys to canonical metrics (r3 race keys -> steplaunch;
    pre-r5 hover generations excluded), and the drift envelope widens
    the observed span by more than the documented ±10% band."""
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "upe", ROOT / "scripts" / "update_perf_envelope.py"
    )
    upe = ilu.module_from_spec(spec)
    spec.loader.exec_module(upe)

    caps = upe.collect_captures()
    srcs = {c["src"] for c in caps}
    assert "BENCH_r04.json" in srcs
    r3 = next(c for c in caps if c["src"] == "BENCH_r03.json")
    # r3's race keys measured the single-step-launch kernel
    assert "race1_steplaunch" in r3 and "race1_rollout" not in r3
    # pre-round-5 hover kernel generations never pollute the envelope
    for c in caps:
        rnd = c["src"]
        if rnd.startswith("BENCH_r") and int(
            rnd[7:9]
        ) in upe._HOVER_SKIP_ROUNDS:
            assert "hover" not in c and "hover_vpu" not in c, c["src"]

    rng = upe.ranges(caps)
    for key in ("hover", "race1_rollout", "race2_rollout"):
        lo, hi = rng[key]
        txt = upe.span_text(key, rng)
        assert "drift envelope" in txt
    # the envelope bound is strictly wider than ±10% of the observed span
    assert float(upe._fmt(100e6 * 0.88, "M", False)) <= 100 * 0.9
    assert float(upe._fmt(100e6 * 1.12, "M", True)) >= 100 * 1.1
