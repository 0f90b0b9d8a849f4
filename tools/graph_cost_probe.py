#!/usr/bin/env python
"""Per-stage on-chip cost breakdown of the classify graph.

Times each stage of the fused graph separately on device-resident inputs
(slope method, same as bench.py: N back-to-back dispatches minus a short
run, synced by host materialization — block_until_ready returns early
through the tunneled link), so optimization effort goes where the
milliseconds are:

    full       waveform -> scores            (the product graph)
    frontend   waveform -> log-mel patches   (DFT + mel + log + framing)
    dft        waveform -> |spectrum|        (the banked matmuls + mag)
    embed      patches -> embeddings         (MobileNet conv stack)
    head       embeddings -> scores

Usage: python tools/graph_cost_probe.py [--seconds 960] [--chunks 20]
       [--bf16]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def slope_time(fn, inputs, n_long, reps=2):
    """Seconds per call via the dispatch-slope method."""
    import numpy as np

    def run(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(inputs[i % len(inputs)])
        np.asarray(out)  # host materialization = the only reliable barrier
        return time.perf_counter() - t0

    run(2)  # warm (compile)
    short = min(run(2) for _ in range(reps))
    long = min(run(n_long) for _ in range(reps))
    return max(0.0, (long - short) / (n_long - 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--chunks', type=int, default=20)
    ap.add_argument('--bf16', action='store_true')
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.models.convert import load_bundle
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    from buzzdetect_tpu.models import yamnet as yamnet_lib
    from buzzdetect_tpu.models.heads import apply_head
    from buzzdetect_tpu.ops.frontend import (log_mel_patches,
                                             log_mel_spectrogram)

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
    arrays, _ = load_bundle(os.path.join(repo, 'models', 'model_general_v3'))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    clf = ChunkClassifier(arrays, framehop_prop=1.0, compute_dtype=dtype)
    cfg = clf.cfg
    params = clf._device_params()

    n = int(round(args.seconds / 0.96) * 0.96 * 16000)
    rng = np.random.default_rng(0)
    wavs = [jax.device_put(clf._pad_to(
        (rng.standard_normal(n) * 0.1).astype(np.float32),
        clf._target_length(n))) for _ in range(3)]

    full = clf.classify_resident
    frontend = jax.jit(partial(log_mel_patches, cfg=cfg))
    spect = jax.jit(lambda w: log_mel_spectrogram(w, cfg))
    patches = [jax.device_put(np.asarray(frontend(w))) for w in wavs]
    embed = jax.jit(partial(yamnet_lib.embed, params['yamnet'],
                            compute_dtype=dtype))
    embs = [jax.device_put(np.asarray(embed(p))) for p in patches]
    head = jax.jit(partial(apply_head, params['head']))

    stages = [
        ('full graph', full, wavs),
        ('frontend (dft+mel+log+patches)', frontend, wavs),
        ('log-mel spectrogram only', spect, wavs),
        ('embed (conv stack)', embed, patches),
        ('head', head, embs),
    ]
    label = 'bf16' if args.bf16 else 'f32'
    print(f'chunk = {args.seconds:.0f} s, compute_dtype = {label}, '
          f'slope over {args.chunks} dispatches:')
    total = None
    for name, fn, inputs in stages:
        sec = slope_time(fn, inputs, args.chunks)
        if total is None:
            total = sec
        rtf = args.seconds / sec if sec > 0 else float('inf')
        share = 100 * sec / total if total else 0.0
        print(f'  {name:32s} {sec * 1e3:8.2f} ms  ({rtf:10,.0f}x rt, '
              f'{share:5.1f}% of full)')


if __name__ == '__main__':
    main()
