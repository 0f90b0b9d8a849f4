#!/usr/bin/env python
"""AOT serving-artifact round-trip on the CURRENT platform (run it on the
TPU host): export the fused classify graph, serialize, reload, execute, and
compare scores against the live (traced) classifier.

Evidence for the serving-parity requirement the reference meets with its
SavedModel (`models/model_general_v3/saved_model.pb`): our StableHLO
artifact must reproduce live scores on the hardware it serves on, not just
on the CPU the round-trip test uses.

Usage: python tools/aot_tpu_probe.py [--seconds 9.6]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=9.6)
    ap.add_argument('--modelname', default='model_general_v3')
    args = ap.parse_args()

    import numpy as np
    import jax
    from buzzdetect_tpu.models.export import (export_classifier,
                                              save_exported, load_exported)
    from buzzdetect_tpu.models.registry import load_model

    dev = jax.devices()[0]
    blob, meta = export_classifier(args.modelname,
                                   chunk_seconds=args.seconds,
                                   platforms=('cpu', 'tpu'),
                                   transfer_dtype='int16')
    with tempfile.TemporaryDirectory() as td:
        d = save_exported(os.path.join(td, 'serving'), blob, meta)
        call, meta2 = load_exported(d)

        # the live comparator must run the SAME graph configuration the
        # artifact baked (the export records it): a default live model on
        # TPU auto-resolves the fused pallas kernels at HIGHEST, while a
        # default export bakes the XLA path at its HIGH default — a
        # mismatched comparison would measure the documented 7-9e-4
        # path difference, not AOT fidelity
        model = load_model(args.modelname, initialize=True,
                           transfer_dtype='int16',
                           conv=meta2['conv'],
                           conv_precision=meta2['conv_precision'])
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(meta2['input_samples'])
               * 0.1).astype(np.float32)
        wire = model.classifier.to_wire(wav)

        aot = np.asarray(call(wire))[:meta2['n_patches']]
        live = model.classifier.predict(wire)
    diff = float(np.abs(aot - live).max())

    print(json.dumps({
        'platform': f'{dev.platform} {dev}',
        'artifact_bytes': len(blob),
        'export_platforms': meta['platforms'],
        'n_patches': meta2['n_patches'],
        'max_abs_diff_aot_vs_live': diff,
        'ok': bool(diff <= 1e-4),
    }))
    return 0 if diff <= 1e-4 else 1


if __name__ == '__main__':
    sys.exit(main())
