#!/usr/bin/env python
"""AOT serving: export the classify graph once, then score chunks from the
serialized artifact alone — no model code, weight bundle, or tracing on the
serving host (reference has no analog; see docs/api.md "AOT export").

The artifact bakes the weights in as StableHLO constants at a fixed chunk
shape and wire dtype, so a serving process is just: load, feed wire-format
buffers, read score rows. Run: python examples/serve_aot.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    from buzzdetect_tpu.models.export import (export_classifier,
                                              save_exported, load_exported)
    from buzzdetect_tpu.utils import quantize_int16

    # --- build side (once, anywhere) ------------------------------------
    # 60 s chunks on the int16 wire; platforms lists every backend the
    # artifact must load on (('cpu','tpu') is the portable default)
    blob, meta = export_classifier('model_general_v3', chunk_seconds=60.0,
                                   platforms=('cpu',),
                                   transfer_dtype='int16')
    with tempfile.TemporaryDirectory() as td:
        d = save_exported(os.path.join(td, 'serving'), blob, meta)
        print(f'exported {len(blob) / 1e6:.1f} MB artifact -> {d}')
        print(f"  chunk: {meta['chunk_seconds']} s "
              f"({meta['input_samples']} samples {meta['input_dtype']}), "
              f"{meta['n_patches']} frames @ {meta['framehop_s']} s hop")

        # --- serving side (no model code needed beyond load_exported) ---
        call, meta = load_exported(d)
        rate = meta['samplerate']
        t = np.arange(meta['input_samples']) / rate
        x = 0.02 * np.random.default_rng(0).standard_normal(len(t))
        x[t < 5] += sum(0.15 / k * np.sin(2 * np.pi * 220 * k * t[t < 5])
                        for k in (1, 2, 3))  # a buzzy first 5 seconds
        scores = np.asarray(call(quantize_int16(x.astype(np.float32))))

        assert scores.shape == (meta['n_patches'], len(meta['classes']))
        top = np.argmax(scores, axis=1)
        print(f'scored {scores.shape[0]} frames; strongest class of the '
              f'first 5:')
        for i in range(5):
            t0 = i * meta['framehop_s']
            print(f'  {t0:6.2f}s  {meta["classes"][top[i]]:20s} '
                  f'{scores[i, top[i]]:+.2f}')


if __name__ == '__main__':
    main()
