"""Smoke tests for bench.py — the driver runs it unattended on real TPU
hardware to produce the recorded benchmark artifact, so its code paths must
never rot. Tiny shapes on CPU; the numbers are meaningless here, only the
plumbing (JSON record shape, slope math, pipeline warmup) is under test."""

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(*args, env=None):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'bench.py'), *args],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu', **(env or {})},
        timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.slow
def test_bench_device_mode_record_shape():
    rec = _run_bench('--mode', 'device', '--chunklength', '2',
                     '--chunks', '8', '--reps', '1')
    if 'device_compute' not in rec:
        # a loaded CPU host can produce a non-positive slope (short run
        # slower than the long run per-chunk); one retry de-flakes it
        rec = _run_bench('--mode', 'device', '--chunklength', '2',
                         '--chunks', '8', '--reps', '1')
    assert rec['metric'] == 'realtime_factor_device'
    assert rec['value'] > 0
    # bench.py rounds vs_baseline to 3 decimals, so compare against the
    # same rounding (a rel tolerance flakes whenever the rounding step
    # itself exceeds it — observed in a judge run at 0.345 vs 0.3454)
    assert rec['vs_baseline'] == pytest.approx(
        round(rec['value'] / 100.0, 3), abs=5e-4)
    # the compute-slope field must be present and sane on a working backend
    assert 'device_compute' in rec and rec['device_compute'] > 0


@pytest.mark.slow
def test_bench_device_mode_small_chunks_no_crash():
    # --chunks 2 used to divide by zero in the slope math
    rec = _run_bench('--mode', 'device', '--chunklength', '2',
                     '--chunks', '2', '--reps', '1')
    assert rec['value'] > 0
    assert 'device_compute' not in rec  # too few chunks for a slope


@pytest.mark.slow
def test_bench_pipeline_mode_record_shape():
    rec = _run_bench('--mode', 'pipeline', '--chunklength', '2',
                     '--files', '1', '--seconds-per-file', '4')
    assert rec['metric'] == 'realtime_factor_pipeline'
    assert rec['value'] > 0


@pytest.mark.slow
def test_bench_both_mode_full_record():
    """'both' (the driver's default) must carry the whole capability story:
    a device headline (compute slope preferred, link-bound fallback), the
    link number, and the pipeline at default AND tuned (mu-law) wire."""
    rec = _run_bench('--chunklength', '2', '--chunks', '8', '--reps', '2',
                     '--files', '1', '--seconds-per-file', '4',
                     '--draws', '2')
    assert rec['metric'] in ('realtime_factor_device_compute',
                             'realtime_factor_device')
    assert rec['value'] > 0
    assert rec['vs_baseline'] == pytest.approx(
        round(rec['value'] / 100.0, 3), abs=5e-4)
    # link-bound rows are medians over >=2 draws with an honest spread —
    # one draw of the tunnel's duty cycle is not a representative number
    for key in ('device_link', 'pipeline_default', 'pipeline_tuned_mulaw'):
        assert rec[key] > 0
        sp = rec[f'{key}_spread']
        assert sp['draws'] == 2
        assert sp['min'] <= sp['median'] <= sp['max']
        assert rec[key] == sp['median']
    # the HEADLINE carries the same variance honesty (round-5): when the
    # compute slope resolved, its value is the median of the draws and the
    # spread rides along. (On a loaded CPU host a draw can produce a
    # non-positive slope and be dropped, so the spread may legitimately
    # cover fewer draws than --reps — but never more.)
    if rec['metric'] == 'realtime_factor_device_compute' \
            and 'device_compute_spread' in rec:
        sp = rec['device_compute_spread']
        assert 1 < sp['draws'] <= 2
        assert sp['min'] <= sp['median'] <= sp['max']
        assert rec['value'] == sp['median']


def test_bench_preflight_failure_emits_honest_record():
    """A dead device backend (observed: the tunnel hangs jax.devices()
    forever) must yield a zero-value record quickly, not an infinite hang
    of the driver's unattended round-end run."""
    rec = _run_bench(
        '--mode', 'device', '--preflight-timeout', '2',
        '--preflight-retries', '0',
        env={'BUZZ_BENCH_PREFLIGHT_CODE': 'import time; time.sleep(60)'})
    assert rec['value'] == 0.0 and rec['vs_baseline'] == 0.0
    assert rec['metric'] == 'realtime_factor_device'
    assert 'unreachable' in rec['error']


def test_bench_watchdog_expiry_emits_honest_record():
    """A mid-run hang (link dying after preflight passed) hits the
    wall-clock watchdog and still produces a record."""
    rec = _run_bench(
        '--mode', 'pipeline', '--watchdog', '3', '--preflight-timeout', '60',
        env={'BUZZ_BENCH_TEST_SLEEP': '120'})
    assert rec['value'] == 0.0 and rec['vs_baseline'] == 0.0
    assert rec['metric'] == 'realtime_factor_pipeline'
    assert 'watchdog' in rec['error']


@pytest.mark.slow
def test_bench_pipeline_devices_mode():
    """--devices in pipeline mode measures the replica-DP layout."""
    rec = _run_bench('--mode', 'pipeline', '--chunklength', '2',
                     '--files', '2', '--seconds-per-file', '4',
                     '--devices', '2')
    assert rec['metric'] == 'realtime_factor_pipeline'
    assert rec['value'] > 0
