#!/usr/bin/env python
"""Measure the conv-precision knob (HIGH vs HIGHEST) at the PRODUCT surface.

Round-3 measured "conv HIGHEST->HIGH buys 1.11-1.14x at 1.5e-4 score
deviation" on the then-current graph; round 5 ships HIGH as the default
(models/classifier.py conv_precision='auto'), so this probe re-attests both
halves of that trade ON THE SHIPPED GRAPH — the full classify program
(frontend + packed-front/fused-tail pallas conv + head) — rather than on a
stage in isolation (the round-4 lesson: stage-level wins can vanish at the
product surface, docs/tuning.md).

Outputs, per variant  {pallas, xla} x {high, highest}:
* on-chip max |score delta| vs the same-conv HIGHEST oracle, for a noisy
  input AND a near-silence worst case (log(mel+1e-3) amplifies mel error
  where the signal is tiny — the frontend-precision probe's finding);
* long-run wall time per dispatch (100 unique dispatches per sample,
  interleaved across variants so tunnel drift hits all equally, ticket
  scalar defeating the runtime's identical-dispatch dedup; repeats to
  ~1.5% where slope medians scatter ~15% — docs/tuning.md methodology).

Usage:
    python tools/conv_precision_tpu_probe.py [--seconds 960] [--rounds 6]
    python tools/conv_precision_tpu_probe.py --variants pallas:high pallas:highest
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

N_INPUTS = 8  # distinct on-device inputs (see pallas_conv_tpu_probe.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--rounds', type=int, default=6)
    ap.add_argument('--wall-dispatches', type=int, default=100)
    ap.add_argument('--variants', nargs='*',
                    default=['pallas:highest', 'pallas:high',
                             'xla:highest', 'xla:high'],
                    help="conv:precision pairs to race (first listed with "
                         "each conv is that conv's parity oracle)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.models.heads import apply_head
    from buzzdetect_tpu.ops.frontend import (FrontendConfig, log_mel_patches,
                                             padded_length)

    dev = jax.devices()[0]
    print(f'backend: {dev.platform} ({dev.device_kind})', flush=True)

    cfg = FrontendConfig()
    params = jax.device_put(yam.fold_batchnorm(yam.init_raw_params(seed=7)))
    rng = np.random.default_rng(3)
    head = jax.device_put({
        'head/kernel': rng.standard_normal((1024, 13)).astype(np.float32)
        * 0.05,
        'head/bias': np.zeros(13, np.float32)})

    n = padded_length(int(args.seconds * cfg.sample_rate), cfg)
    # on-device inputs (the tunnel throttles past ~3 GB of upload): noisy
    # field-like audio for timing + parity, near-silence for the parity
    # worst case
    keys = [jax.random.PRNGKey(i) for i in range(N_INPUTS)]
    wavs = [jax.random.normal(k, (n,), jnp.float32) * 0.1 for k in keys]
    silence = jax.random.normal(jax.random.PRNGKey(99), (n,),
                                jnp.float32) * 1e-4

    @partial(jax.jit, static_argnames=('conv', 'prec'))
    def scores(wav, conv, prec):
        patches = log_mel_patches(wav, cfg)
        emb = yam.embed(params, patches, conv=conv, conv_precision=prec)
        return apply_head(head, emb)

    @partial(jax.jit, static_argnames=('conv', 'prec'))
    def timed(wav, i, conv, prec):
        patches = log_mel_patches(wav + i * 1e-7, cfg)
        emb = yam.embed(params, patches, conv=conv, conv_precision=prec)
        return jnp.sum(apply_head(head, emb))

    variants = [tuple(v.split(':')) for v in args.variants]
    oracle, supported = {}, []
    for conv, prec in variants:
        t0 = time.perf_counter()
        try:
            s_noise = np.asarray(scores(wavs[0], conv, prec))
            s_sil = np.asarray(scores(silence, conv, prec))
            float(timed(wavs[0], jnp.float32(0.0), conv, prec))
        except Exception as e:
            # e.g. Mosaic's in-kernel dot lowering supports only
            # DEFAULT/HIGHEST ("Unsupported dot precision: HIGH")
            print(f'{conv}:{prec}: UNSUPPORTED on this toolchain '
                  f'({type(e).__name__}: {str(e)[:120]})', flush=True)
            continue
        supported.append((conv, prec))
        print(f'{conv}:{prec}: compiled + first runs in '
              f'{time.perf_counter() - t0:.0f} s', flush=True)
        if conv not in oracle:
            oracle[conv] = (s_noise, s_sil)
        d_noise = float(np.abs(s_noise - oracle[conv][0]).max())
        d_sil = float(np.abs(s_sil - oracle[conv][1]).max())
        print(f'  max |delta| vs {conv}-oracle: noise {d_noise:.3e}, '
              f'near-silence {d_sil:.3e}', flush=True)
    variants = supported

    # cross-conv parity at matched precision (pallas vs xla should stay at
    # f32-rounding distance at HIGHEST; HIGH may differ more, both inside
    # the budget)
    if len({c for c, _ in variants}) > 1:
        for prec in {p for _, p in variants}:
            convs = sorted({c for c, p in variants if p == prec})
            if len(convs) == 2:
                a = np.asarray(scores(wavs[0], convs[0], prec))
                b = np.asarray(scores(wavs[0], convs[1], prec))
                print(f'  cross-conv ({convs[0]} vs {convs[1]}) at {prec}: '
                      f'max |delta| {np.abs(a - b).max():.3e}', flush=True)

    ticket = itertools.count(1)

    def run(conv, prec, k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = timed(wavs[i % N_INPUTS], jnp.float32(next(ticket)),
                        conv, prec)
        np.asarray(out)
        return time.perf_counter() - t0

    walls = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:
            walls[v].append(run(*v, args.wall_dispatches)
                            / args.wall_dispatches)
        print(f'round {r + 1}/{args.rounds} done', flush=True)

    print(f'\nfull classify graph, {args.seconds:.0f} s chunk, median wall '
          f'per dispatch over {args.rounds} rounds:')
    base = None
    for v in variants:
        ss = sorted(walls[v])
        med = ss[len(ss) // 2]
        spread = ss[-1] / max(ss[0], 1e-9)
        if base is None:
            base = med
        rtf = args.seconds / med
        print(f'  {v[0]:7s}:{v[1]:8s}: {med * 1e3:7.2f} ms '
              f'(spread {spread:.2f}x)  {base / med:5.3f}x vs first  '
              f'~{rtf:,.0f}x realtime')


if __name__ == '__main__':
    main()
