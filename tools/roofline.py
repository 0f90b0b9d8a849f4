#!/usr/bin/env python
"""Speed-of-light accounting for the classify graph on TPU v5e.

For every stage of the fused graph (DFT, mel, each conv layer, pooling,
head) this prints the analytical FLOP count and minimum HBM traffic per
chunk, the resulting roofline lower bound on time (whichever of the
compute engine or HBM bandwidth binds), and — with ``--measure`` on real
hardware — the achieved per-layer time via cumulative prefix graphs, so
"how far from light speed is this kernel" is a number, not a vibe.

Engine peaks are v5e datasheet values (197 bf16 TFLOP/s MXU, 819 GB/s
HBM); f32 matmuls at Precision.HIGHEST run 6 bf16 MXU passes (HIGH = 3),
so their peak is scaled accordingly. Depthwise convolutions do not map
onto the 128x128 systolic array at all — they are VPU work — and the VPU
peak is *measured*, not asserted (``--measure`` times a fused
multiply-add chain); without hardware a conservative 4 TFLOP/s estimate
is used and labeled as such.

Usage:
    python tools/roofline.py                 # analytical table only
    python tools/roofline.py --bf16
    python tools/roofline.py --measure       # + measured peaks & layers
    python tools/roofline.py --measure --layers 2,3,13,14

Measurement notes (tunneled dev link): slope method with host
materialization as the barrier, median of interleaved trials — see
tools/graph_cost_probe.py for why.
"""

import argparse
import math
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# v5e datasheet peaks (per chip)
MXU_BF16 = 197e12          # FLOP/s
HBM_BW = 819e9             # B/s
VPU_EST = 4e12             # FLOP/s, conservative estimate; --measure replaces

F32_HIGHEST_PASSES = 6     # Precision.HIGHEST = 6-pass bf16 emulation
F32_HIGH_PASSES = 3


def conv_out(h, w, stride):
    return math.ceil(h / stride), math.ceil(w / stride)


def graph_stages(seconds=960.0, n_classes=13, dtype_bytes=4):
    """Yield (name, engine, flops, hbm_bytes) per chunk.

    HBM bytes are the *minimum* traffic for an unfused graph: each stage
    reads its input once from HBM and writes its output once (weights are
    counted but negligible at 1000-patch batches). A fused kernel's floor
    is lower — only the stage boundary arrays it actually materializes.
    """
    from buzzdetect_tpu.models.yamnet import LAYER_DEFS
    from buzzdetect_tpu.ops.frontend import FrontendConfig

    cfg = FrontendConfig()
    n_samples = int(seconds * cfg.sample_rate)
    n_frames = n_samples // cfg.hop_samples          # ~96,000
    b = int(seconds / cfg.patch_window_seconds)      # patches at framehop 1.0

    win, bins, mel = cfg.window_samples, cfg.fft_bins, cfg.mel_bands

    # DFT as two banked matmuls (re+im): (frames, 400) @ (400, 257) x 2
    yield ('dft (banked matmuls)', 'mxu',
           2 * n_frames * win * bins * 2,
           # waveform read once (hop-banked, no gather), spectrum written
           (n_samples + n_frames * bins) * dtype_bytes
           + 2 * win * bins * dtype_bytes)
    # magnitude + mel projection + log: (frames, 257) @ (257, 64)
    yield ('mel + log', 'mxu',
           2 * n_frames * bins * mel + 4 * n_frames * bins,
           (n_frames * bins + n_frames * mel) * dtype_bytes)
    # patch framing is a gather-free reshape/slice: traffic only
    yield ('patch framing', 'vpu', 0,
           2 * b * cfg.patch_frames * mel * dtype_bytes)

    h, w, c = cfg.patch_frames, mel, 1
    for i, (kind, stride, filters) in enumerate(LAYER_DEFS):
        name = f'layer{i + 1}'
        if kind == 'conv':
            ho, wo = conv_out(h, w, stride)
            yield (f'{name} conv 3x3/{stride} {c}->{filters}', 'mxu',
                   2 * b * ho * wo * filters * 9 * c,
                   (b * h * w * c + b * ho * wo * filters + 9 * c * filters)
                   * dtype_bytes)
            h, w, c = ho, wo, filters
        else:
            ho, wo = conv_out(h, w, stride)
            yield (f'{name} dw 3x3/{stride} @{c}', 'vpu',
                   2 * b * ho * wo * c * 9,
                   (b * h * w * c + b * ho * wo * c + 9 * c) * dtype_bytes)
            yield (f'{name} pw 1x1 {c}->{filters}', 'mxu',
                   2 * b * ho * wo * c * filters,
                   (b * ho * wo * c + b * ho * wo * filters + c * filters)
                   * dtype_bytes)
            h, w, c = ho, wo, filters

    yield ('global avg pool', 'vpu', b * h * w * c,
           (b * h * w * c + b * c) * dtype_bytes)
    yield ('head 1024->classes', 'mxu', 2 * b * c * n_classes,
           (b * c + b * n_classes + c * n_classes) * dtype_bytes)


def lower_bound(flops, nbytes, engine, mxu_peak, vpu_peak, bw):
    t_compute = flops / (mxu_peak if engine == 'mxu' else vpu_peak)
    t_bw = nbytes / bw
    t = max(t_compute, t_bw)
    bound = ('BW' if t_bw >= t_compute else engine.upper())
    return t, bound


# --- empirical peaks ---------------------------------------------------------

def _slope(fn, inputs, n_long=16, trials=5):
    """Median seconds per call (floor 1e-12: ratios divide by this)."""
    from buzzdetect_tpu.utils import dispatch_slope
    return dispatch_slope(fn, inputs, n_long, trials, floor=1e-12)[1]


def measure_peaks(dtype):
    """Measured (mxu_flops, vpu_flops, hbm_bw) on the current backend."""
    import jax
    import jax.numpy as jnp

    # Every measurement cycles >= 2 distinct device-resident inputs:
    # dispatch_slope requires it (repeated identical dispatches dedup on
    # the tunneled runtime, collapsing the slope to the floor).
    n = 4096
    mats = [jax.device_put(jax.random.normal(
        jax.random.PRNGKey(k), (n, n), jnp.float32).astype(dtype))
        for k in (0, 10, 20)]
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    @jax.jit
    def mm(x):
        y = x
        for _ in range(4):
            y = jnp.dot(y, x, precision=prec,
                        preferred_element_type=jnp.float32).astype(dtype)
        return jnp.sum(y)
    t = _slope(mm, mats)
    mxu = 4 * 2 * n ** 3 / t

    vecs = [jax.device_put(jax.random.normal(
        jax.random.PRNGKey(k), (1 << 22,), jnp.float32))
        for k in (1, 11, 21)]

    @jax.jit
    def fma_chain(x):
        y = x
        for _ in range(256):  # 2 FLOP per element per step, stays fused
            y = y * 1.000001 + 1e-7
        return jnp.sum(y)
    t = _slope(fma_chain, vecs)
    vpu = 256 * 2 * vecs[0].size / t

    # two alternating 256 MB arrays: no consecutive repeat (so no dedup)
    # while bounding the probe's HBM footprint at 512 MB
    bigs = [jax.device_put(jax.random.normal(
        jax.random.PRNGKey(k), (1 << 14, 1 << 12), jnp.float32))
        for k in (2, 12)]
    k_steps = 16

    @jax.jit
    def stream(x):
        # K sequential roll+add passes: each reads and writes the full
        # array (rolls don't fuse with each other), scalar output so the
        # tunneled download doesn't pollute the slope.
        y = x
        for i in range(k_steps):
            y = jnp.roll(y, 1 + i, axis=0) + 1.0
        return jnp.sum(y)
    t = _slope(stream, bigs, n_long=8)
    bw = k_steps * 2 * 4 * bigs[0].size / t
    return mxu, vpu, bw


def measure_layers(which, dtype, seconds):
    """Measured per-conv-layer time via cumulative prefix graphs.

    Prefix k runs the frontend output through conv layers 1..k and reduces
    to a scalar; layer k's cost is prefix(k) - prefix(k-1). Each prefix is
    a fresh compile (~40-60 s on the tunneled link), so pass --layers to
    bound the wait.
    """
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.models import yamnet as yamnet_lib
    from buzzdetect_tpu.models.convert import load_bundle

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
    arrays, _ = load_bundle(os.path.join(repo, 'models', 'model_general_v3'))
    raw = {k[len('yamnet_raw/'):]: v for k, v in arrays.items()
           if k.startswith('yamnet_raw/')}
    params = jax.device_put(yamnet_lib.fold_batchnorm(raw))
    b = int(seconds / 0.96)
    # distinct inputs per dispatch: see the dedup note in measure_peaks
    patch_sets = [jax.device_put(jax.random.normal(
        jax.random.PRNGKey(k), (b, 96, 64), jnp.float32))
        for k in (3, 13, 23)]

    shapes = list(yamnet_lib._conv_shapes())

    def prefix(n_layers):
        keep = [s for s in shapes
                if int(s[0].split('/')[0][len('layer'):]) <= n_layers]

        @jax.jit
        def fn(x):
            x = x.astype(dtype)[..., None]
            for key, kind, stride, _shape in keep:
                kernel = params[f'{key}/kernel'].astype(dtype)
                bias = params[f'{key}/bias'].astype(jnp.float32)
                x = yamnet_lib._conv2d(x, kernel, stride,
                                       depthwise=(kind == 'depthwise'))
                x = jax.nn.relu(x.astype(jnp.float32) + bias).astype(dtype)
            return jnp.sum(x.astype(jnp.float32))
        return fn

    times = {0: 0.0}
    prev_needed = sorted(({k - 1 for k in which} | set(which)) - {0})
    for k in prev_needed:
        times[k] = _slope(prefix(k), patch_sets)
        print(f'  measured prefix(1..{k}): {times[k] * 1e3:8.2f} ms',
              flush=True)
    return {k: times[k] - times[k - 1] for k in which if k - 1 in times}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--measure', action='store_true',
                    help='measure engine peaks (and per-layer times with '
                         '--layers) on the current JAX backend')
    ap.add_argument('--layers', type=str, default='',
                    help='comma-separated conv layer numbers to measure '
                         '(cumulative prefix diffs; each is a fresh compile)')
    args = ap.parse_args()

    import numpy as np  # noqa: F401  (slope helpers)

    dtype_bytes = 2 if args.bf16 else 4
    if args.bf16:
        mxu_peak, label = MXU_BF16, 'bf16'
    else:
        mxu_peak, label = MXU_BF16 / F32_HIGHEST_PASSES, 'f32@HIGHEST'
    vpu_peak, bw, vpu_note = VPU_EST, HBM_BW, ' (estimate)'

    measured_layers = {}
    if args.measure:
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        print('measuring engine peaks on this backend...', flush=True)
        mxu_m, vpu_m, bw_m = measure_peaks(dtype)
        print(f'  matmul ({label}): {mxu_m / 1e12:7.1f} TFLOP/s '
              f'(datasheet-derived {mxu_peak / 1e12:.1f})')
        print(f'  vpu fma chain:    {vpu_m / 1e12:7.1f} TFLOP/s')
        print(f'  hbm stream:       {bw_m / 1e9:7.0f} GB/s '
              f'(datasheet {HBM_BW / 1e9:.0f})')
        mxu_peak, vpu_peak, bw = mxu_m, vpu_m, bw_m
        vpu_note = ' (measured)'
        if args.layers:
            which = sorted({int(x) for x in args.layers.split(',')})
            print(f'measuring conv layers {which} '
                  f'(one ~40-60 s compile per prefix)...', flush=True)
            measured_layers = measure_layers(which, dtype, args.seconds)

    stages = list(graph_stages(args.seconds, dtype_bytes=dtype_bytes))
    print(f'\nchunk = {args.seconds:.0f} s ({args.seconds / 0.96:.0f} '
          f'patches), compute = {label}, peaks: MXU '
          f'{mxu_peak / 1e12:.1f} TF/s, VPU {vpu_peak / 1e12:.1f} '
          f'TF/s{vpu_note}, HBM {bw / 1e9:.0f} GB/s')
    hdr = (f'{"stage":34s} {"engine":6s} {"GFLOP":>8s} {"MB":>8s} '
           f'{"floor":>9s} {"bound":>5s}')
    print(hdr + (f' {"measured":>9s} {"x-floor":>7s}' if measured_layers
                 else ''))
    tot_f = tot_b = tot_t = 0.0
    layer_floor = {}
    for name, engine, flops, nbytes, in stages:
        t, bound = lower_bound(flops, nbytes, engine, mxu_peak, vpu_peak, bw)
        tot_f, tot_b, tot_t = tot_f + flops, tot_b + nbytes, tot_t + t
        row = (f'{name:34s} {engine:6s} {flops / 1e9:8.2f} '
               f'{nbytes / 1e6:8.1f} {t * 1e3:7.3f}ms {bound:>5s}')
        if name.startswith('layer'):
            n = int(name.split()[0][len('layer'):])
            layer_floor[n] = layer_floor.get(n, 0.0) + t
        print(row)
    if measured_layers:
        print('\nmeasured conv layers (cumulative prefix diffs):')
        for k, t in sorted(measured_layers.items()):
            fl = layer_floor.get(k, 0.0)
            ratio = t / fl if fl else float('inf')
            print(f'  layer{k:<3d} measured {t * 1e3:8.2f} ms   '
                  f'floor {fl * 1e3:7.3f} ms   {ratio:6.1f}x off')
    print(f'\ntotals: {tot_f / 1e9:.1f} GFLOP, {tot_b / 1e6:.0f} MB minimum '
          f'HBM traffic, roofline floor {tot_t * 1e3:.2f} ms '
          f'({args.seconds / tot_t:,.0f}x realtime)')
    print('floor assumes an unfused graph (every stage boundary hits HBM); '
          'a fully fused kernel\'s floor is the compute column alone plus '
          'input+output traffic.')


if __name__ == '__main__':
    main()
