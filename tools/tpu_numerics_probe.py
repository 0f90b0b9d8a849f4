#!/usr/bin/env python
"""Validate the <=1e-3 score-parity contract ON REAL TPU HARDWARE.

The CPU test suite proves the classify graph matches the TensorFlow oracle
to <=1e-3 (tests/test_classifier.py, tests/test_frontend.py). This probe
closes the remaining link: it runs the SAME graph on the real TPU chip and
on the in-process CPU backend and compares scores — if TPU matches CPU,
parity with TF follows transitively. The interesting failure mode it
guards is the MXU's bf16-operand default: every matmul on the score path
pins an explicit precision — the fused-pallas convs HIGHEST (6-pass f32
emulation, the single-chip default), the XLA conv path HIGH (3-pass, the
mesh/fallback default — measured 7-9e-4, attested here by its own row),
the DFT/mel matmuls HIGH (measured 6.7e-06 score impact, see
ops/frontend.py::DFT_PRECISION) — and this probe is the hardware check
that those pins actually hold the budget.

Run under the TPU platform (the default env). Exits nonzero on violation.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# need BOTH backends in one process: the TPU under test and the CPU
# reference. Must happen before the first jax import (the platform pin).
plats = os.environ.get('JAX_PLATFORMS', '')
if plats and 'cpu' not in plats.split(','):
    os.environ['JAX_PLATFORMS'] = plats + ',cpu'

BUDGET = 1e-3


def main():
    import numpy as np
    import jax
    from buzzdetect_tpu.models.classifier import ChunkClassifier
    from buzzdetect_tpu.models.convert import load_bundle

    if jax.default_backend() != 'tpu':
        raise SystemExit('this probe must run with the TPU backend active')

    dir_model = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'models', 'model_general_v3')
    arrays, _ = load_bundle(dir_model)
    rng = np.random.default_rng(3)

    worst = 0.0
    # rows vary the FRONTEND implementation and (last row) the conv path:
    # conv='xla' with auto precision runs the shipped XLA-path default —
    # 3-pass Precision.HIGH (what mesh/sharded runs and pallas fallbacks
    # execute; measured 7-9e-4 worst-case on 60 s inputs) — so the budget
    # is attested for BOTH serving configurations, not just the fused
    # single-chip default (conv auto -> pallas at HIGHEST).
    for label, seconds, framehop, frontend, conv in [
            ('xla fh=1.0', 10.0, 1.0, 'xla', 'auto'),
            ('xla fh=0.5', 4.8, 0.5, 'xla', 'auto'),
            ('pallas fh=1.0', 10.0, 1.0, 'pallas', 'auto'),
            ('xla-conv HIGH fh=1.0', 60.0, 1.0, 'xla', 'xla'),
    ]:
        wav = (rng.standard_normal(int(seconds * 16000)) * 0.1
               ).astype(np.float32)
        tpu = ChunkClassifier(arrays, framehop_prop=framehop,
                              frontend=frontend, conv=conv,
                              transfer_dtype='float32').predict(wav)
        with jax.default_device(jax.devices('cpu')[0]):
            cpu = ChunkClassifier(arrays, framehop_prop=framehop,
                                  frontend='xla',
                                  transfer_dtype='float32').predict(wav)
        dev = float(np.abs(tpu - cpu).max())
        worst = max(worst, dev)
        status = 'ok' if dev <= BUDGET else 'VIOLATION'
        print(f'  [{status}] {label}: {tpu.shape[0]} frames, '
              f'max |TPU - CPU| = {dev:.2e}')

    print(f'worst deviation {worst:.2e} vs budget {BUDGET}')
    if worst > BUDGET:
        raise SystemExit(1)
    print('TPU numerics hold the <=1e-3 parity budget '
          '(transitively vs the TF oracle via the CPU golden tests)')


if __name__ == '__main__':
    main()
