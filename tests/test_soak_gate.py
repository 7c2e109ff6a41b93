"""The standing-soak regression gate is a tested contract, not prose.

`SOAK_GOOD.json` at the repo root pins the standing soak's numbers
(docs/PERF.md "Standing soak"); `scripts/soak.py --standing --check`
gates fresh runs with `gate_problems()`. These tests pin the gate's
semantics hermetically — errors==0, QPS within -20% raw OR
phase-normalized by the same-session single-request control p50 — and
validate the committed artifact's shape, so a malformed or regressed
artifact (or a silently weakened gate) fails the suite instead of
being discovered at the next live soak.

Reference analog: the C++ suite's informal perf thresholds
(/root/reference/tests/test_ocr_worker.cpp:443-451) — here the
threshold is a committed artifact plus a pure, testable comparison.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "soak", os.path.join(REPO, "scripts", "soak.py")
)
soak = importlib.util.module_from_spec(spec)
spec.loader.exec_module(soak)

GOOD = {"qps": 65.56, "errors": 0, "control_p50_ms": 42.3}


def _fresh(qps, errors=0, control=42.3):
    return {"qps": qps, "errors": errors, "control_p50_ms": control}


class TestSoakGate:
    def test_equal_run_passes(self):
        assert soak.gate_problems(GOOD, _fresh(65.56)) == []

    def test_errors_fail_even_at_good_qps(self):
        problems = soak.gate_problems(GOOD, _fresh(80.0, errors=3))
        assert any("errors 3" in p for p in problems)

    def test_raw_qps_drop_fails_same_phase(self):
        # same control p50 -> the phase excuse is unavailable
        problems = soak.gate_problems(GOOD, _fresh(65.56 * 0.79))
        assert any(p.startswith("qps") for p in problems)
        assert soak.gate_problems(GOOD, _fresh(65.56 * 0.81)) == []

    def test_slow_phase_is_not_a_false_alarm(self):
        # 2x slower tunnel halves raw QPS; control-normalized it's fine
        assert soak.gate_problems(GOOD, _fresh(32.8, control=84.6)) == []

    def test_slow_phase_cannot_hide_a_real_regression(self):
        # 2x slower tunnel AND a genuine further collapse -> fail
        problems = soak.gate_problems(GOOD, _fresh(20.0, control=84.6))
        assert any(p.startswith("qps") for p in problems)

    def test_no_control_falls_back_to_raw(self):
        assert soak.gate_problems(GOOD, _fresh(60.0, control=None)) == []
        problems = soak.gate_problems(GOOD, _fresh(40.0, control=None))
        assert any(p.startswith("qps") for p in problems)

    def test_fast_phase_raw_pass_is_accepted(self):
        # raw_ok OR norm_ok: a fast phase that clears the raw bar passes
        # even though normalization would scale its requirement up
        assert soak.gate_problems(GOOD, _fresh(60.0, control=21.15)) == []


class TestSoakGoodArtifact:
    def test_committed_artifact_shape(self):
        with open(os.path.join(REPO, "SOAK_GOOD.json")) as f:
            good = json.load(f)
        assert good["standing"] is True
        assert good["errors"] == 0
        assert good["concurrency"] == 12
        assert good["qps"] > 0
        assert good["control_p50_ms"] > 0
        assert good["requests_ok"] > 1000
        # a run identical to the artifact must pass its own gate
        assert soak.gate_problems(good, dict(good)) == []
