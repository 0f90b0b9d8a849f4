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
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


from buzzdetect_tpu.utils import dispatch_slope as slope_time  # noqa: E402


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
    n_pad = clf._target_length(n)

    # generate on-device: uploading ~60 MB waveforms through a throttled
    # tunnel would take minutes and say nothing about the graph
    @jax.jit
    def gen(key):
        x = jax.random.normal(key, (n_pad,), jnp.float32) * 0.1
        return jnp.where(jnp.arange(n_pad) < n, x, 0.0)

    wavs = [gen(jax.random.PRNGKey(i)) for i in range(3)]

    full = clf.classify_resident
    frontend = jax.jit(partial(log_mel_patches, cfg=cfg))
    spect = jax.jit(lambda w: log_mel_spectrogram(w, cfg))
    patches = [frontend(w) for w in wavs]  # stay device-resident
    # the standalone stages must measure the SAME implementations the
    # product graph runs (clf.conv is the auto-resolved fused-Pallas/XLA
    # choice) — an all-XLA embed stage next to a fused-conv full graph
    # would misattribute the conv cost by the fusion's own ~1.37x
    embed = jax.jit(partial(yamnet_lib.embed, params['yamnet'],
                            compute_dtype=dtype, conv=clf.conv))
    embs = [embed(p) for p in patches]
    head = jax.jit(partial(apply_head, params['head']))

    stages = [
        ('full graph', full, wavs),
        ('frontend (dft+mel+log+patches)', frontend, wavs),
        ('log-mel spectrogram only', spect, wavs),
        (f'embed (conv stack, {clf.conv})', embed, patches),
        ('head', head, embs),
    ]
    label = 'bf16' if args.bf16 else 'f32'
    print(f'chunk = {args.seconds:.0f} s, compute_dtype = {label}, '
          f'slope over {args.chunks} dispatches, median of 5 trials '
          f'(read the median; distrust spreads over 2x):')
    total = None
    for name, fn, inputs in stages:
        best, med, worst = slope_time(fn, inputs, args.chunks)
        if total is None:
            total = med
        rtf = args.seconds / med if med > 0 else float('inf')
        share = 100 * med / total if total else 0.0
        print(f'  {name:32s} {med * 1e3:8.2f} ms '
              f'[{best * 1e3:.2f}..{worst * 1e3:.2f}]  '
              f'({rtf:10,.0f}x rt, {share:5.1f}% of full)')


if __name__ == '__main__':
    main()
