"""Forced-wedge tests for the official bench's resilience layer
(tools/bench_resilience.py + bench.py headline assembly).

VERDICT r4 #1: two consecutive rounds lost their driver-parsed headline to
the tunneled runtime. These tests force every failure mode locally — a probe
that never returns, a probe that recovers after a backend re-init, a phase
child that wedges mid-run — and assert the pipeline degrades to a PARSEABLE,
non-null-where-possible headline instead of an empty artifact.
"""

import json
import os
import subprocess
import sys
import time

import pytest

from sonicscribe_tpu.tools import bench_resilience as br

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _hang_probe():
    time.sleep(30)  # daemon thread; abandoned, dies with the test process
    return 0.0


class TestWaitForDevice:
    def test_wedged_epoch_fails_after_bounded_retries(self):
        sleeps, reinits = [], []
        r = br.wait_for_device(
            probe=_hang_probe,
            attempts=3,
            timeout_s=0.1,
            spacing_s=0.2,
            reinit=lambda: reinits.append(1),
            sleep=sleeps.append,
        )
        assert r["ok"] is False
        probes = [a for a in r["attempts"] if a["action"] == "probe"]
        assert len(probes) == 3 and all(p["status"] == "hung" for p in probes)
        assert r["hung_probes"] == 3
        assert sleeps == [0.2, 0.2]  # spaced, not hammered
        assert len(reinits) == 2  # re-init between every retry

    def test_recovery_after_reinit(self):
        """First probe hangs (wedged), re-init 'fixes' the epoch, second
        probe succeeds: the round's measurement survives."""
        state = {"fixed": False}

        def probe():
            if not state["fixed"]:
                time.sleep(30)
            return 1.0

        def reinit():
            state["fixed"] = True

        r = br.wait_for_device(
            probe=probe, attempts=3, timeout_s=0.1, spacing_s=0.0,
            reinit=reinit, sleep=lambda s: None,
        )
        assert r["ok"] is True
        assert r["hung_probes"] == 1
        probes = [a for a in r["attempts"] if a["action"] == "probe"]
        assert [p["status"] for p in probes] == ["hung", "ok"]

    def test_probe_exception_is_recorded_not_fatal(self):
        calls = {"n": 0}

        def probe():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient")
            return 1.0

        r = br.wait_for_device(
            probe=probe, attempts=2, timeout_s=1.0, spacing_s=0.0,
            reinit=lambda: None, sleep=lambda s: None,
        )
        assert r["ok"] is True
        assert r["attempts"][0]["status"] == "error"
        assert "transient" in r["attempts"][0]["error"]

    def test_reinit_failure_does_not_abort_retry(self):
        def reinit():
            raise RuntimeError("clear_backends blew up")

        calls = {"n": 0}

        def probe():
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("sick")
            return 1.0

        r = br.wait_for_device(
            probe=probe, attempts=2, timeout_s=1.0, spacing_s=0.0,
            reinit=reinit, sleep=lambda s: None,
        )
        assert r["ok"] is True  # probe retried despite the reinit failure


class TestRunPhase:
    def test_ok_phase_returns_parsed_result(self, tmp_path):
        out = str(tmp_path / "out.json")
        cmd = [
            sys.executable, "-c",
            "import json,sys; json.dump({'value': 0.01}, open(sys.argv[1],'w'))",
            out,
        ]
        r = br.run_phase(cmd, out, timeout_s=30)
        assert r["status"] == "ok"
        assert r["result"] == {"value": 0.01}

    def test_crashed_phase_reports_rc_and_log_tail(self, tmp_path):
        out = str(tmp_path / "out.json")
        cmd = [
            sys.executable, "-c",
            "import sys; print('boom-detail'); sys.exit(7)",
        ]
        r = br.run_phase(cmd, out, timeout_s=30)
        assert r["status"] == "crashed"
        assert r["rc"] == 7
        assert "boom-detail" in r["log_tail"]

    def test_wedged_phase_is_abandoned_not_killed(self, tmp_path):
        """A child past its bound is ABANDONED (killing a chip-attached
        process wedges the runtime for hours): run_phase returns 'timeout'
        promptly, and the child survives to finish its work."""
        out = str(tmp_path / "out.json")
        cmd = [
            sys.executable, "-c",
            "import json,sys,time; time.sleep(1.5); "
            "json.dump({'late': True}, open(sys.argv[1],'w'))",
            out,
        ]
        t0 = time.monotonic()
        r = br.run_phase(cmd, out, timeout_s=0.3)
        assert r["status"] == "timeout"
        assert time.monotonic() - t0 < 1.0  # returned at the bound
        # the abandoned child was NOT killed: it completes on its own
        deadline = time.monotonic() + 10
        while not os.path.exists(out) and time.monotonic() < deadline:
            time.sleep(0.05)
        assert os.path.exists(out), "child was killed instead of abandoned"

    def test_empty_output_is_distinguished(self, tmp_path):
        out = str(tmp_path / "out.json")
        r = br.run_phase([sys.executable, "-c", "pass"], out, timeout_s=30)
        assert r["status"] == "no-output"


class TestHeadlineAssembly:
    def _bench(self):
        sys.path.insert(0, REPO)
        import bench

        return bench

    def test_value_non_null_when_stream_phase_lost(self):
        """The r4 failure mode, fixed: a lost stream phase degrades to
        stream_error — the headline value stays non-null."""
        bench = self._bench()
        h = bench.assemble_headline(
            {"value": 0.0104, "single_stream_rtf_30s": 0.05,
             "p50_interim_ms": 120.0, "decode_tokens_per_s_single_stream": 170.0},
            {"stream_error": "stream phase timeout after 3900 s"},
            "native",
        )
        assert h["metric"] == "file_rtf_batched"
        assert h["value"] == 0.0104
        assert h["vs_baseline"] == pytest.approx(0.02 / 0.0104, abs=1e-3)
        assert "timeout" in h["stream_error"]
        json.dumps(h)  # headline must serialize

    def test_quant_suffix_mapping(self):
        bench = self._bench()
        h = bench.assemble_headline(
            {"value": 0.01},
            {
                "realtime_streams": 50,
                "stream_vad": "silero-cost-probe",
                "stream_interim_p50_ms": 250.0,
                "stream_interim_p50_ms_int8": 240.0,
                "stream_interim_p50_ms_int8dec": 230.0,
                "stream_interim_p95_ms": 400.0,
            },
            "native",
        )
        assert h["interim_p50_ms"] == {
            "native": 250.0, "int8": 240.0, "int8dec": 230.0
        }
        assert h["interim_p95_ms"] == {"native": 400.0}

    def test_quick_cpu_end_to_end(self, tmp_path):
        """The full parent→children pipeline on CPU (tiny model): both
        phases run as real subprocesses; the last stdout line must be a
        parseable headline with a non-null value."""
        env = dict(os.environ)
        env["BENCH_FILE_TIMEOUT_S"] = "900"
        env["BENCH_STREAM_TIMEOUT_S"] = "900"
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--quick", "--cpu", "--energy-vad"],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        assert lines, p.stdout + p.stderr
        head = json.loads(lines[-1])
        assert head["metric"] == "file_rtf_batched"
        assert head["value"] is not None and head["value"] > 0
        partial = json.loads(lines[0])
        assert partial.get("partial") is True  # early line is marked
        # the quick run's detail went to the TAGGED file, not the
        # headline's companion (VERDICT r4 #7)
        assert head["detail"].startswith("BENCH_DETAIL_")
        det_path = os.path.join(REPO, head["detail"])
        assert os.path.exists(det_path)
        with open(det_path) as f:
            det = json.load(f)
        assert det["value"] == head["value"]
        assert "realtime_streams" in det  # stream phase merged in
