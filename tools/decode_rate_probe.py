#!/usr/bin/env python
"""Measure host decode throughput per codec: audio-seconds decoded per
wall-second per core, through the full native stage (demux -> decode ->
equal-weight downmix -> 16 kHz resample -> chosen wire format).

Why it matters: at N x realtime device throughput, the host must decode
at N x realtime too or the chips starve (the reference hit exactly this
wall on GPUs — `docs/source/tuning.rst:57-62` — and answered with up to
24 streamer threads per device). This table sizes that answer for a
deployment: streamers_needed ~= target_realtime_factor / rate(codec).

Usage: python tools/decode_rate_probe.py [--seconds 120] [--wire int16]
Emits one JSON line per codec plus a markdown table on stderr.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# (codec, container, source_rate) — opus only encodes at 48 kHz
FAMILIES = [
    ('pcm_s16le', 'wav', 44100),
    ('flac', 'flac', 44100),
    ('libmp3lame', 'mp3', 44100),
    ('aac', 'm4a', 44100),
    ('wmav2', 'wma', 44100),
    ('ac3', 'mts', 44100),
    ('libvorbis', 'ogg', 44100),
    ('libopus', 'opus', 48000),
]


def measure(path, wire, target_rate=16000):
    from buzzdetect_tpu.audio.ffi import NativeStream
    t = NativeStream(path, target_rate=target_rate)
    read = {'float32': t.read, 'int16': t.read_s16, 'mulaw': t.read_mulaw}
    fn = read[wire]
    slab = target_rate * 10
    # warm the page cache so we measure decode, not disk
    while len(fn(slab)) == slab:
        pass
    t.seek(0)
    t0 = time.perf_counter()
    total = 0
    while True:
        got = fn(slab)
        total += len(got)
        if len(got) < slab:
            break
    wall = time.perf_counter() - t0
    t.close()
    return (total / target_rate) / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=120.0,
                    help='fixture length per codec (44.1 kHz stereo)')
    ap.add_argument('--wire', default='int16',
                    choices=['float32', 'int16', 'mulaw'])
    ap.add_argument('--trials', type=int, default=3)
    args = ap.parse_args()

    from buzzdetect_tpu.audio.ffi import encode_fixture
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for codec, ext, src_rate in FAMILIES:
            path = os.path.join(tmp, f'fx.{ext}')
            encode_fixture(path, codec, src_rate, 2, args.seconds)
            rate = max(measure(path, args.wire)
                       for _ in range(args.trials))
            rows.append((codec, ext, rate))
            print(json.dumps({'codec': codec, 'container': ext,
                              'decode_realtime_factor': round(rate, 1),
                              'wire': args.wire,
                              'source': f'{src_rate / 1000:g} kHz stereo '
                                        f'-> 16 kHz mono'}))
    print('\n| codec | container | decode rate (x realtime/core) |',
          file=sys.stderr)
    print('|---|---|---|', file=sys.stderr)
    for codec, ext, rate in rows:
        print(f'| {codec} | {ext} | {rate:.0f}x |', file=sys.stderr)


if __name__ == '__main__':
    main()
