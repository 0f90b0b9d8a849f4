#!/usr/bin/env python
"""Compiled-on-TPU probe for the fused Pallas frontend: parity vs the XLA
frontend and a wall-clock comparison, on the real chip.

Round-1 history: the kernel only ran in interpreter mode — compiled builds
failed in this environment. Compiling on real hardware in round 2 exposed
two Mosaic layout constraints (1-D->2-D in-kernel reshapes; memref slices
must be 8x128-tile-aligned); the kernel was redesigned around them (see
ops/pallas_frontend.py module docstring) and now compiles and matches.

Usage: python tools/pallas_tpu_probe.py [--seconds 60] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=60.0)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax

    from buzzdetect_tpu.ops.frontend import (FrontendConfig, pad_waveform,
                                             log_mel_spectrogram)
    from buzzdetect_tpu.ops.pallas_frontend import log_mel_spectrogram_pallas

    dev = jax.devices()[0]
    cfg = FrontendConfig().with_framehop(1.0)
    wav = np.asarray(pad_waveform(
        (np.random.default_rng(0).standard_normal(int(args.seconds * 16000))
         * 0.1).astype(np.float32), cfg))
    wav_dev = jax.device_put(wav)

    pallas_fn = jax.jit(lambda w: log_mel_spectrogram_pallas(w, cfg))
    xla_fn = jax.jit(lambda w: log_mel_spectrogram(w, cfg))

    out_p = np.asarray(pallas_fn(wav_dev))   # compile + run
    out_x = np.asarray(xla_fn(wav_dev))
    maxdiff = float(np.abs(out_p - out_x).max())

    iters = max(1, args.iters)  # --iters 0 would crash on unbound out / /0

    def clock(fn):
        fn(wav_dev).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(wav_dev)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    t_pallas = clock(pallas_fn)
    t_xla = clock(xla_fn)

    print(json.dumps({
        'platform': f'{dev.platform} {dev}',
        'compiled_pallas': 'OK',
        'audio_seconds': args.seconds,
        'max_abs_diff_vs_xla': maxdiff,
        'pallas_ms': round(t_pallas * 1e3, 3),
        'xla_frontend_ms': round(t_xla * 1e3, 3),
        'speedup_vs_xla': round(t_xla / t_pallas, 3),
    }))


if __name__ == '__main__':
    main()
