#!/usr/bin/env python
"""Measure DFT/mel matmul precision HIGH vs HIGHEST on real TPU hardware.

The frontend's windowed-DFT banks and mel projection run at
Precision.HIGHEST (6-pass f32 emulation) to hold the <=1e-3 score-parity
budget (ops/frontend.py). HIGH (3-pass) halves those matmuls' MXU cost; the
question is whether the dropped lo*lo cross term moves the *scores* — the
user-visible contract — by more than noise. This probe answers both halves
on-chip:

* deviation: classify scores with the frontend at HIGH vs HIGHEST on the
  same chip, plus each against the in-process CPU f32 reference (the same
  transitive oracle as tools/tpu_numerics_probe.py). Uses a realistic mix
  of tones+noise AND a near-silent waveform (log(mel+1e-3) amplifies
  absolute mel error exactly where energy ~ 0, so silence is the worst
  case, not loud signal).
* speed: slope-timed classify graph with each precision, trials
  interleaved (tunneled-link discipline of tools/graph_cost_probe.py).

Usage:
    python tools/frontend_precision_probe.py [--seconds 960] [--trials 5]
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

plats = os.environ.get('JAX_PLATFORMS', '')
if plats and 'cpu' not in plats.split(','):
    os.environ['JAX_PLATFORMS'] = plats + ',cpu'

N_INPUTS = 8  # see pallas_conv_tpu_probe.py: unique dispatches beat dedup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--trials', type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.ops import frontend as fe
    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.models.heads import init_head, apply_head

    if jax.default_backend() != 'tpu':
        raise SystemExit('needs the real TPU backend')
    tpu = jax.devices('tpu')[0]
    cpu = jax.devices('cpu')[0]
    print(f'backend: {tpu.device_kind}', flush=True)

    params = yam.fold_batchnorm(yam.init_raw_params(seed=7))
    head = init_head(1024, 13, seed=7)
    cfg = fe.FrontendConfig().with_framehop(1.0)

    def classify(wav, precision):
        old = fe.DFT_PRECISION
        fe.DFT_PRECISION = precision
        try:
            patches = fe.log_mel_patches(fe.pad_waveform(wav, cfg), cfg)
        finally:
            fe.DFT_PRECISION = old
        emb = yam.embed(params, patches)
        return apply_head(head, emb)

    # --- deviation, on realistic + worst-case (near-silent) audio ---------
    rng = np.random.default_rng(5)
    n = fe.padded_length(int(10.0 * 16000), cfg)
    t = np.arange(n) / 16000.0
    loud = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)
    quiet = (1e-5 * rng.standard_normal(n)).astype(np.float32)
    silent = np.zeros(n, np.float32)

    HI = jax.lax.Precision.HIGHEST
    H3 = jax.lax.Precision.HIGH
    worst = 0.0
    for label, wav in [('tones+noise', loud), ('near-silence', quiet),
                       ('digital silence', silent)]:
        w = jnp.asarray(wav)
        jc = jax.jit(classify, static_argnums=1)
        s_hi = np.asarray(jc(jax.device_put(w, tpu), HI))
        s_h3 = np.asarray(jc(jax.device_put(w, tpu), H3))
        with jax.default_device(cpu):
            s_cpu = np.asarray(jc(jax.device_put(w, cpu), HI))
        d_pair = float(np.abs(s_hi - s_h3).max())
        d_hi = float(np.abs(s_hi - s_cpu).max())
        d_h3 = float(np.abs(s_h3 - s_cpu).max())
        worst = max(worst, d_h3)
        print(f'{label:16s}: |HIGH-HIGHEST| {d_pair:.2e}   '
              f'|HIGHEST-cpu| {d_hi:.2e}   |HIGH-cpu| {d_h3:.2e}',
              flush=True)
    verdict = 'WITHIN' if worst <= 1e-3 else 'VIOLATES'
    print(f'worst |HIGH-cpu| score deviation: {worst:.2e} -> {verdict} '
          f'the 1e-3 budget', flush=True)

    # --- speed: full classify graph, interleaved slopes -------------------
    b_samples = fe.padded_length(int(args.seconds * 16000), cfg)
    waves = [jax.random.normal(jax.random.PRNGKey(i), (b_samples,),
                               jnp.float32) * 0.1 for i in range(N_INPUTS)]
    ticket = itertools.count(1)

    fns = {}
    for name, prec in [('HIGHEST', HI), ('HIGH', H3)]:
        @jax.jit
        def f(w, i, prec=prec):
            return jnp.sum(classify(w + i * 1e-7, prec))
        t0 = time.perf_counter()
        float(f(waves[0], jnp.float32(0.0)))
        print(f'{name}: compiled + first run in '
              f'{time.perf_counter() - t0:.0f} s', flush=True)
        fns[name] = f

    def run(fn, k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(waves[i % N_INPUTS], jnp.float32(next(ticket)))
        np.asarray(out)
        return time.perf_counter() - t0

    slopes = {name: [] for name in fns}
    for t_i in range(args.trials):
        for name, fn in fns.items():
            short = min(run(fn, 2) for _ in range(2))
            long = min(run(fn, N_INPUTS) for _ in range(2))
            slopes[name].append(max(0.0, (long - short) / (N_INPUTS - 2)))
        print(f'trial {t_i + 1}/{args.trials} done', flush=True)

    print(f'\nclassify f32, {args.seconds:.0f} s chunk, median slopes:')
    meds = {}
    for name in fns:
        ss = sorted(slopes[name])
        meds[name] = ss[len(ss) // 2]
        print(f'  frontend {name:8s}: {meds[name] * 1e3:8.2f} ms  '
              f'(spread {ss[-1] / max(ss[0], 1e-9):.1f}x)')
    print(f'  HIGH wins {meds["HIGHEST"] / max(meds["HIGH"], 1e-9):.3f}x '
          f'end-to-end')


if __name__ == '__main__':
    main()
