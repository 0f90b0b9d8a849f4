#!/usr/bin/env python
"""Host-cost breakdown of a full pipeline run: a sampling profiler over ALL
threads (decode workers, dispatch, writer, coordinator) during one
``analyze()`` pass, answering "where does the host spend its wall time when
the chip is not the bottleneck?".

Method: a sampler thread walks ``sys._current_frames()`` at ~200 Hz and
histograms (thread-role, function) pairs; cProfile can't see worker threads
and the JAX profiler sees device ops, so this fills the host-side gap. The
JAX trace (``analyze(profile_dir=...)``) remains the tool for device-side
questions.

Usage:
  python tools/profile_pipeline.py [--files 4] [--seconds-per-file 300]
        [--transfer-dtype mulaw] [--chunklength 200] [--top 12]
"""

import argparse
import collections
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


#: leaf frames that mean "blocked/idle", not "spending CPU": queue waits,
#: joins, sleeps — a pipeline thread parked on its queue is the HEALTHY
#: state, so these are reported separately from busy work
_IDLE_LEAVES = ('threading.py:wait', 'threading.py:_wait_for_tstate_lock',
                'threading.py:join', 'time.sleep', 'selectors.py:select')


class Sampler:
    """~200 Hz stack sampler across every live thread."""

    def __init__(self, hz=200):
        self.hz = hz
        self.samples = collections.Counter()   # (role, frame_id) -> hits
        self.per_role = collections.Counter()  # role -> hits
        self.busy = collections.Counter()      # busy-only (role, frame) hits
        self.busy_total = 0
        self.total = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name='stack_sampler')

    @staticmethod
    def _role(name: str) -> str:
        for prefix in ('streamer', 'analyzer', 'writer', 'logger'):
            if name.startswith(prefix):
                return prefix
        return 'main/other'

    def _run(self):
        me = threading.get_ident()
        names = {}
        while not self._stop.is_set():
            names.update({t.ident: t.name for t in threading.enumerate()})
            for ident, frame in sys._current_frames().items():
                if ident == me:
                    continue
                role = self._role(names.get(ident, '?'))
                # innermost frame in repo code, else the true innermost:
                # attributes time to OUR function that is running/blocking,
                # not to queue.get internals
                f, chosen = frame, frame
                while f is not None:
                    fn = f.f_code.co_filename
                    if 'buzzdetect_tpu' in fn or 'tools/' in fn:
                        chosen = f
                        break
                    f = f.f_back
                code = chosen.f_code
                leaf = frame.f_code  # what it is concretely doing
                key = (role,
                       f'{os.path.basename(code.co_filename)}:'
                       f'{code.co_name}',
                       f'{os.path.basename(leaf.co_filename)}:'
                       f'{leaf.co_name}')
                self.samples[key] += 1
                self.per_role[role] += 1
                self.total += 1
                if key[2] not in _IDLE_LEAVES:
                    self.busy[key] += 1
                    self.busy_total += 1
            time.sleep(1.0 / self.hz)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--files', type=int, default=4)
    ap.add_argument('--seconds-per-file', type=float, default=300.0)
    ap.add_argument('--chunklength', type=float, default=200.0)
    ap.add_argument('--transfer-dtype', default=None,
                    choices=['float32', 'int16', 'mulaw'])
    ap.add_argument('--batch-chunks', type=int, default=1)
    ap.add_argument('--sample-rate', type=int, default=16000)
    ap.add_argument('--top', type=int, default=12)
    ap.add_argument('--jax-trace', default=None,
                    help='also capture a JAX profiler trace here')
    args = ap.parse_args()

    import numpy as np
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.utils import write_wav

    rng = np.random.default_rng(0)
    kw = dict(chunklength=args.chunklength, verbosity_print='ERROR',
              transfer_dtype=args.transfer_dtype,
              batch_chunks=args.batch_chunks, profile_dir=args.jax_trace)
    with tempfile.TemporaryDirectory() as td:
        def write(path, seconds):
            n = int(seconds * args.sample_rate)
            write_wav(path, rng.standard_normal(n) * 0.1, args.sample_rate)

        warm = os.path.join(td, 'warm')
        os.makedirs(warm)
        write(os.path.join(warm, 'w.wav'), args.seconds_per_file)
        analyze(modelname='model_general_v3', dir_audio=warm,
                dir_out=os.path.join(td, 'warm_out'),
                **{**kw, 'profile_dir': None})

        dir_audio = os.path.join(td, 'audio')
        os.makedirs(dir_audio)
        for i in range(args.files):
            write(os.path.join(dir_audio, f'f{i}.wav'), args.seconds_per_file)

        t0 = time.perf_counter()
        with Sampler() as s:
            analyze(modelname='model_general_v3', dir_audio=dir_audio,
                    dir_out=os.path.join(td, 'out'), **kw)
        wall = time.perf_counter() - t0

    audio = args.files * args.seconds_per_file
    print(f'\npipeline: {audio:.0f} audio-seconds in {wall:.2f}s '
          f'= {audio / wall:.0f}x realtime '
          f'(wire={args.transfer_dtype or "int16 (default)"})')
    print(f'{s.total} stack samples, {s.busy_total} busy '
          f'({100 * s.busy_total / max(1, s.total):.0f}% — the rest is '
          f'threads parked on queues, the healthy state); share by role:')
    for role, hits in s.per_role.most_common():
        print(f'  {role:10s} {100 * hits / max(1, s.total):5.1f}%')
    print(f'\ntop {args.top} BUSY frames (role, our-frame <- doing), '
          f'% of wall x threads:')
    for (role, ours, leaf), hits in s.busy.most_common(args.top):
        doing = '' if leaf == ours else f'  <- {leaf}'
        print(f'  {100 * hits / max(1, s.total):5.1f}%  [{role}] '
              f'{ours}{doing}')


if __name__ == '__main__':
    main()
