#!/usr/bin/env python
"""Benchmark: realtime factor (audio-seconds analyzed per wall-second) on one
chip — the reference's own runtime metric (rate logs at reference
`src/inference/worker.py:54-65`), against the BASELINE.json north star of
100x realtime per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method: stream N full-length chunks of synthetic audio through the flagship
model's fused classify graph exactly as the pipeline's inferer does (async
dispatch, materialize on collection). Decode is benchmarked separately via
--mode pipeline (full CLI path over generated WAV files).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_REALTIME = 100.0  # north star: >=100x realtime per v5e chip

# The driver runs this script unattended at round end. The tunneled device
# backend can die outright (observed 2026-08-17: jax.devices() itself hangs
# forever), which would turn the recorded-bench run into an infinite hang and
# lose the round's artifact. So the real measurement runs in a supervised
# child process: a quick preflight proves one real dispatch completes, then
# the full bench runs under a wall-clock watchdog; either failure emits an
# honest zero-value record instead of hanging.
_CHILD_ENV = 'BUZZ_BENCH_CHILD'

# the probe (one real dispatch, synced by host materialization, with the
# JAX_PLATFORMS re-pin) is shared with doctor's triage check —
# utils.backend_preflight holds the single copy and its rationale


def _failure_record(mode, reason):
    metric = {'device': 'realtime_factor_device',
              'pipeline': 'realtime_factor_pipeline',
              'both': 'realtime_factor_device_compute'}[mode]
    rec = {'metric': metric, 'value': 0.0,
           'unit': 'audio-seconds per wall-second per chip',
           'vs_baseline': 0.0, 'error': reason}
    # point the reader at the most recent recorded hardware run — a zero
    # from a dead link says nothing about the chip
    prior = sorted(f for f in os.listdir(os.path.dirname(
        os.path.abspath(__file__)) or '.')
        if f.startswith('BENCH_r') and f.endswith('.json'))
    if prior:
        rec['last_recorded_hardware_run'] = prior[-1]
    return rec


def _preflight_ok(timeout, retries, retry_sleep):
    from buzzdetect_tpu.utils import backend_preflight
    code = os.environ.get('BUZZ_BENCH_PREFLIGHT_CODE') or None
    for attempt in range(retries + 1):
        if attempt:
            time.sleep(retry_sleep)
        ok, _why = backend_preflight(timeout, code=code)
        if ok:
            return True
    return False


def _supervised(args, argv):
    """Preflight the backend, then run the bench in a watched child.

    Returns the record to print (the child's own JSON on success)."""
    if not _preflight_ok(args.preflight_timeout, args.preflight_retries,
                         args.preflight_retry_sleep):
        return _failure_record(
            args.mode, 'device backend unreachable: preflight dispatch did '
            f'not complete within {args.preflight_timeout:.0f}s '
            f'x{args.preflight_retries + 1} attempts (tunnel outage?)')
    # start_new_session so a timeout can kill the whole process GROUP: a
    # plain child kill leaves descendants holding the stdout pipe and the
    # post-kill communicate() would block forever — the very hang this
    # supervisor exists to prevent
    import signal
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + argv,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={**os.environ, _CHILD_ENV: '1'}, start_new_session=True)
    try:
        stdout, stderr = proc.communicate(timeout=args.watchdog)
    except subprocess.TimeoutExpired:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except OSError:
            pass
        try:
            stdout, stderr = proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        return _failure_record(
            args.mode, f'bench hung past the {args.watchdog:.0f}s watchdog '
            '(device link died mid-run?)')
    if proc.returncode != 0:
        return _failure_record(
            args.mode,
            'bench child failed: ' + (stderr or '').strip()[-500:])
    for line in reversed((stdout or '').strip().splitlines()):
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and 'metric' in rec:
            return rec
    return _failure_record(args.mode, 'bench child printed no JSON record')


def bench_device(chunklength: float, n_chunks: int, framehop: float,
                 bf16: bool, frontend: str = None, reps: int = 3):
    import numpy as np
    import jax
    from buzzdetect_tpu.models.registry import load_model

    compute_dtype = None
    if bf16:
        import jax.numpy as jnp
        compute_dtype = jnp.bfloat16

    model = load_model('model_general_v3', framehop_prop=framehop,
                       initialize=True, compute_dtype=compute_dtype,
                       frontend=frontend)
    fl = model.embedder.framelength_s
    chunklength = round(chunklength / fl) * fl
    n_samples = int(chunklength * 16000)

    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal(n_samples).astype(np.float32) * 0.1
              for _ in range(min(n_chunks, 4))]
    clf = getattr(model, 'classifier', None)
    if clf is not None:
        # feed the wire dtype the inferer actually receives: the native
        # decode stage emits the wire format inside its decode pass (fused,
        # overlapped in decode threads — measured by --mode pipeline), so
        # the device path starts from wire-format host buffers
        chunks = [clf.to_wire(c) for c in chunks]

    # compile + warm
    out, n_valid = model.predict_async(chunks[0])
    np.asarray(out)

    audio_seconds = chunklength * n_chunks

    # end-to-end device path (wire transfer + graph, overlapped via async
    # dispatch). The axon tunnel's bandwidth bursts/throttles between runs
    # (docs/tuning.md documents a 2-5x spread), so keep EVERY timed loop:
    # the caller reports the median with a min/median/max spread rather
    # than one draw from the link's duty cycle.
    link_rtfs = []
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        futures = []
        for i in range(n_chunks):
            out, n_valid = model.predict_async(chunks[i % len(chunks)])
            futures.append(out)
        # host materialization of the last output is the only trustworthy
        # barrier here: stream ordering covers all prior dispatches, and
        # block_until_ready can return early through the axon tunnel
        np.asarray(futures[-1])
        link_rtfs.append(audio_seconds / (time.perf_counter() - t0))

    # compute-only: same graph on device-resident inputs — what the chip
    # itself sustains once data is on-board (production TPU-VM PCIe is far
    # faster than the tunnel, so this bounds the deployed number).
    # Measured as a SLOPE: time N back-to-back dispatches minus a short run,
    # syncing via host materialization of the final output (device stream
    # ordering makes that a full barrier). block_until_ready is NOT used:
    # through the axon tunnel it returns before execution completes.
    # ``reps`` independent draws (fresh short+long timed loops each) feed a
    # min/median/max spread: single-draw slopes on the tunneled link have a
    # measured ~±2-4% run-to-run scatter (docs/tuning.md "round-5 bench
    # spread"), so effects below that are NOT resolvable at this surface —
    # the honest bar the round-4 front-block reconciliation needed.
    compute_rtfs = []
    if clf is not None and n_chunks > 2:
        devs = [jax.device_put(
            clf._pad_to(c, clf._target_length(len(c)))) for c in chunks]

        def run(k):
            t0 = time.perf_counter()
            f = None
            for i in range(k):
                f = clf.classify_resident(devs[i % len(devs)])
            np.asarray(f)
            return time.perf_counter() - t0

        run(2)  # warm
        for _ in range(max(1, reps)):
            short = min(run(2) for _ in range(2))
            long = min(run(n_chunks) for _ in range(2))
            per_chunk = (long - short) / (n_chunks - 2)
            if per_chunk > 0:
                compute_rtfs.append(chunklength / per_chunk)

    return link_rtfs, compute_rtfs


def bench_pipeline(chunklength: float, n_files: int, seconds_per_file: float,
                   batch_chunks: int = 1, sample_rate: int = 16000,
                   resample_on_device: bool = False,
                   transfer_dtype: str = None, devices=None,
                   draws: int = 1):
    """Full path: WAV decode -> pipeline -> CSV (host + device).

    A warmup pass first runs one file through analyze() so backend
    initialization and XLA compilation (one-time costs, cached) stay out of
    the steady-state measurement. ``draws`` independent timed runs follow
    (fresh output dir each) and ALL their rates are returned — the pipeline
    rides the tunneled host->device link, whose duty cycle swings the rate
    2-5x between draws, so the caller reports a median + spread rather
    than one sample.
    """
    import tempfile
    import numpy as np
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.utils import write_wav

    rng = np.random.default_rng(0)
    kw = dict(chunklength=chunklength, verbosity_print='ERROR',
              batch_chunks=batch_chunks,
              resample_on_device=resample_on_device,
              transfer_dtype=transfer_dtype, devices=devices)
    with tempfile.TemporaryDirectory() as td:
        warm_audio = os.path.join(td, 'warm')
        os.makedirs(warm_audio)
        n = int(seconds_per_file * sample_rate)
        write_wav(os.path.join(warm_audio, 'w.wav'),
                  (rng.standard_normal(n) * 0.1).astype(np.float32),
                  sample_rate)
        analyze(modelname='model_general_v3', dir_audio=warm_audio,
                dir_out=os.path.join(td, 'warm_out'), **kw)

        dir_audio = os.path.join(td, 'audio')
        os.makedirs(dir_audio)
        for i in range(n_files):
            write_wav(os.path.join(dir_audio, f'f{i}.wav'),
                      (rng.standard_normal(n) * 0.1).astype(np.float32),
                      sample_rate)
        rtfs = []
        for d in range(max(1, draws)):
            dir_out = os.path.join(td, f'out{d}')
            t0 = time.perf_counter()
            analyze(modelname='model_general_v3', dir_audio=dir_audio,
                    dir_out=dir_out, **kw)
            rtfs.append(n_files * seconds_per_file
                        / (time.perf_counter() - t0))
    return rtfs


def main():
    ap = argparse.ArgumentParser()
    # default 'both': the driver-recorded artifact carries the device-graph
    # headline AND the user-visible full-pipeline (decode -> CSV) number
    ap.add_argument('--mode', choices=['both', 'device', 'pipeline'],
                    default='both')
    # unset: device rows use the 960 s tuned configuration for v5e (big
    # batches amortize dispatch; see docs/tuning.md) and pipeline rows use
    # the product default 200 s; an EXPLICIT value applies to both
    ap.add_argument('--chunklength', type=float, default=None)
    ap.add_argument('--chunks', type=int, default=20)
    ap.add_argument('--framehop', type=float, default=1.0)
    ap.add_argument('--reps', type=int, default=3,
                    help='device mode: timed loops; the median is reported '
                         'with a min/median/max spread (tunnel bandwidth '
                         'varies 2-5x between runs)')
    ap.add_argument('--draws', type=int, default=3,
                    help='pipeline rows: independent timed runs; the median '
                         'is reported with a min/median/max spread')
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--files', type=int, default=4)
    ap.add_argument('--seconds-per-file', type=float, default=300.0)
    ap.add_argument('--batch-chunks', type=int, default=1)
    ap.add_argument('--sample-rate', type=int, default=16000,
                    help='source WAV rate for pipeline mode')
    ap.add_argument('--transfer-dtype', default=None,
                    choices=['float32', 'int16', 'mulaw'],
                    help='pipeline mode: host->device wire format (mulaw '
                         'halves transfer bytes on bandwidth-limited links)')
    ap.add_argument('--resample-on-device', action='store_true',
                    help='pipeline mode: native-rate decode + on-device '
                         'resample (ops/resample.py)')
    ap.add_argument('--devices', default=None,
                    help="pipeline rows (pipeline/both modes): per-chip "
                         "replica count (int or 'all') — measure the "
                         "replica-DP layout on real multi-chip hardware")
    ap.add_argument('--frontend', choices=['auto', 'xla', 'pallas'],
                    default=None,
                    help='device mode: frontend implementation (default '
                         'auto = the hop-banked XLA frontend, the fastest '
                         'measured; pallas = the fused kernel)')
    ap.add_argument('--no-watchdog', action='store_true',
                    help='run the measurement in-process (no supervision)')
    ap.add_argument('--watchdog', type=float, default=3300.0,
                    help='wall-clock limit for the supervised bench run; on '
                         'expiry an honest zero-value record is emitted')
    ap.add_argument('--preflight-timeout', type=float, default=240.0)
    ap.add_argument('--preflight-retries', type=int, default=2)
    ap.add_argument('--preflight-retry-sleep', type=float, default=30.0)
    args = ap.parse_args()

    if os.environ.get(_CHILD_ENV) != '1' and not args.no_watchdog:
        print(json.dumps(_supervised(args, sys.argv[1:])))
        return
    # test hook: lets the suite exercise the watchdog-expiry path without a
    # real device-link hang
    time.sleep(float(os.environ.get('BUZZ_BENCH_TEST_SLEEP', 0) or 0))

    devices = args.devices
    if devices is not None and devices != 'all':
        try:
            devices = int(devices)
        except ValueError:
            ap.error("--devices must be an integer or 'all'")
        if devices < 1:
            ap.error('--devices must be >= 1')

    record = {
        'unit': 'audio-seconds per wall-second per chip',
    }

    def spread(vals):
        """min/median/max over the draws — the honest shape for any rate
        that rides the tunneled link's 2-5x duty cycle. The scalar row
        keys stay the MEDIAN so the artifact reads single-number."""
        import statistics
        vals = sorted(vals)
        return {'min': round(vals[0], 2),
                'median': round(statistics.median(vals), 2),
                'max': round(vals[-1], 2),
                'draws': len(vals)}

    chunkl_device = 960.0 if args.chunklength is None else args.chunklength
    chunkl_pipeline = 200.0 if args.chunklength is None else args.chunklength
    if args.mode == 'device':
        links, computes = bench_device(chunkl_device, args.chunks,
                                       args.framehop, args.bf16,
                                       args.frontend, args.reps)
        sp = spread(links)
        record.update(metric='realtime_factor_device', value=sp['median'])
        if len(links) > 1:
            record['value_spread'] = sp
        if computes:
            # graph-only rate with data already on-device: the link-transfer
            # ceiling removed (the tunnel, not the chip, bounds `value`)
            csp = spread(computes)
            record['device_compute'] = csp['median']
            if len(computes) > 1:
                record['device_compute_spread'] = csp
    elif args.mode == 'pipeline':
        rtfs = bench_pipeline(chunkl_pipeline, args.files,
                              args.seconds_per_file, args.batch_chunks,
                              args.sample_rate, args.resample_on_device,
                              args.transfer_dtype, devices,
                              draws=args.draws)
        sp = spread(rtfs)
        record.update(metric='realtime_factor_pipeline', value=sp['median'])
        if len(rtfs) > 1:
            record['value_spread'] = sp
    else:  # 'both': the driver-recorded artifact — the full capability story
        links, computes = bench_device(chunkl_device, args.chunks,
                                       args.framehop, args.bf16,
                                       args.frontend, args.reps)
        # HEADLINE = device_compute (the chip's sustained graph rate): the
        # stable capability number. The end-to-end `device_link` figure
        # rides this environment's tunneled host->device link, whose duty
        # cycle swings rates 2-5x between draws (docs/tuning.md); a
        # production TPU-VM's PCIe is not the bottleneck the tunnel is.
        # EVERY measured row carries min/median/max over its draws (when
        # >1), with the scalar key holding the median — including the
        # headline: its ~±2-4% draw-to-draw scatter is the metric's
        # resolving power, and effects smaller than it (e.g. the round-4
        # front block's 1-2.5%) are only attributable via the long-run
        # wall probes, not this artifact.
        link_sp = spread(links)
        if computes:
            csp = spread(computes)
            record.update(metric='realtime_factor_device_compute',
                          value=csp['median'])
            if len(computes) > 1:
                record['device_compute_spread'] = csp
        else:  # slope unavailable (too few chunks): fall back honestly
            record.update(metric='realtime_factor_device',
                          value=link_sp['median'])
        record['device_link'] = link_sp['median']
        if len(links) > 1:
            record['device_link_spread'] = link_sp
        # pipeline at the product DEFAULT configuration (200 s chunks,
        # int16 wire — the literal default, regardless of --transfer-dtype,
        # so the record key never lies) and at the measured-best TUNED
        # configuration (mu-law wire — halves transfer bytes on the
        # throttled link; activations shift well under one output rounding
        # digit, docs/tuning.md)
        defaults = bench_pipeline(
            chunkl_pipeline, args.files, args.seconds_per_file,
            args.batch_chunks, args.sample_rate, args.resample_on_device,
            None, devices, draws=args.draws)
        sp_default = spread(defaults)
        record['pipeline_default'] = sp_default['median']
        if len(defaults) > 1:
            record['pipeline_default_spread'] = sp_default
        mulaws = bench_pipeline(
            chunkl_pipeline, args.files, args.seconds_per_file,
            args.batch_chunks, args.sample_rate, args.resample_on_device,
            'mulaw', devices, draws=args.draws)
        sp_mulaw = spread(mulaws)
        record['pipeline_tuned_mulaw'] = sp_mulaw['median']
        if len(mulaws) > 1:
            record['pipeline_tuned_mulaw_spread'] = sp_mulaw

    # derived from the ROUNDED value so the pair is always self-consistent
    record['vs_baseline'] = round(record['value'] / BASELINE_REALTIME, 3)
    print(json.dumps(record))


if __name__ == '__main__':
    main()
