#!/usr/bin/env python
"""Compile + measure the fused Pallas conv tail on real TPU hardware.

Compares the production XLA embed graph against the hybrid graph (XLA
layers 1..start-1 + ops/pallas_conv.py fused tail) on a realistic 960 s
chunk batch, and attests numeric parity on-chip.

Measurement discipline (tunneled dev link — see docs/tuning.md):
* all inputs generated on-device with jax.random (the tunnel throttles
  after ~3 GB of upload);
* slope method: time k=2 vs k=N back-to-back dispatches, median of 5
  interleaved trials, host materialization (np.asarray of a scalar) as
  the only reliable barrier;
* every jit variant is a fresh ~40-60 s compile through the tunnel.

Usage:
    python tools/pallas_conv_tpu_probe.py [--start 8] [--pb 32] [--bf16]
    python tools/pallas_conv_tpu_probe.py --seconds 960 --trials 5
    # compare fused-block layouts head-to-head (same session, interleaved):
    python tools/pallas_conv_tpu_probe.py --variants 8::32 4:8:8,8::32
    # resolve small (<2x) ratios with the long-run wall method:
    python tools/pallas_conv_tpu_probe.py --variants front:1 front:1:mid \\
        --method wall
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_cost_probe import slope_time  # noqa: E402  (shared discipline)

N_INPUTS = 8  # distinct on-device batches — identical (fn, buffer) dispatches
              # get deduped somewhere in the tunneled runtime (measured 0.00).
              # A monotonic scalar folded into each graph makes every dispatch
              # unique even across trials (a repeated pair re-measures 0.00).


def parse_blocks(spec: str):
    """'4:8:8,8::32' -> ((4, 8, 8), (8, None, 32)).

    'front[:pbi[:mid]]' -> a packed-front config dict (layers 2-3 fused
    with g=4 lane packing on top of the default PALLAS_BLOCKS; 'mid'
    selects the fuse-through-layer-7 variant) — reruns the round-4
    front-block refutation (docs/tuning.md) on current hardware, e.g.:
        --variants 4:8:8,8::32 front:1 front:1:mid
    """
    if spec.startswith('front'):
        parts = spec.split(':')
        cfg = dict(groups=4,
                   block_packed=int(parts[1]) if len(parts) > 1 else 1)
        if len(parts) > 2 and parts[2] == 'mid':
            cfg['fuse_mid'] = True
        return cfg
    blocks = []
    for part in spec.split(','):
        start, stop, pb = part.split(':')
        blocks.append((int(start), int(stop) if stop else None, int(pb)))
    return tuple(blocks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--start', type=int, default=8,
                    help='first fused layer (sep layers only; >=2)')
    ap.add_argument('--pb', type=int, default=32,
                    help='patches per kernel block (32 keeps the late-layer '
                         'dots >=128 MXU rows: 32*6=192)')
    ap.add_argument('--variants', nargs='*', default=None,
                    help='fused-block layouts to race, each as comma-joined '
                         'start:stop:pb (empty stop = end). Overrides '
                         '--start/--pb; trials are interleaved across all '
                         'variants so link drift hits them equally.')
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--trials', type=int, default=5)
    ap.add_argument('--method', choices=['slope', 'wall'], default='slope',
                    help="variants mode: 'slope' isolates per-dispatch "
                         'cost (use for >2x effects); "wall" times a '
                         '100-dispatch run per sample and repeats to '
                         '~1.5%% — required to resolve small ratios '
                         '(the slope noise floor is ~15%% on the '
                         'tunneled link; docs/tuning.md round-4 '
                         'methodology note)')
    ap.add_argument('--wall-dispatches', type=int, default=100)
    args = ap.parse_args()

    if args.variants:
        return race_variants(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from buzzdetect_tpu.models import yamnet as yam
    from buzzdetect_tpu.ops.pallas_conv import fused_tail

    dev = jax.devices()[0]
    print(f'backend: {dev.platform} ({dev.device_kind})', flush=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    params = jax.device_put(yam.fold_batchnorm(yam.init_raw_params(seed=7)))
    b = int(args.seconds / 0.96)
    batches = [jax.random.normal(jax.random.PRNGKey(i), (b, 96, 64),
                                 jnp.float32) for i in range(N_INPUTS)]
    patches = batches[0]

    head_shapes = [s for s in yam._conv_shapes()
                   if int(s[0].split('/')[0][len('layer'):]) < args.start]

    def head(x):
        x = x.astype(dtype)[..., None]
        for key, kind, stride, _shape in head_shapes:
            kernel = params[f'{key}/kernel'].astype(dtype)
            bias = params[f'{key}/bias'].astype(jnp.float32)
            x = yam._conv2d(x, kernel, stride,
                            depthwise=(kind == 'depthwise'))
            x = jax.nn.relu(x.astype(jnp.float32) + bias).astype(dtype)
        return x

    # Timing fns take a perturbation scalar (a monotonic i folded into the
    # input makes each dispatch unique so the tunnel can't dedup it) and
    # reduce to a SCALAR output: downloading a (B,1024) result through the
    # throttled link costs a variable 0.1-0.3 s, 5x the slope signal —
    # measured spreads of 10^7 with full outputs vs 1.3x with scalars.
    def base_embed(x):
        return yam.embed(params, x, compute_dtype=dtype)

    def hybrid_embed(x):
        return fused_tail(params, head(x).astype(jnp.float32),
                          start_layer=args.start, block_patches=args.pb,
                          compute_dtype=dtype)

    base_full = jax.jit(base_embed)        # parity only (one run each)
    hybrid_full = jax.jit(hybrid_embed)

    @jax.jit
    def base(x, i):
        return jnp.sum(base_embed(x + i * 1e-6))

    @jax.jit
    def hybrid(x, i):
        return jnp.sum(hybrid_embed(x + i * 1e-6))

    @jax.jit
    def head_only(x, i):
        return jnp.sum(head(x + i * 1e-6).astype(jnp.float32))

    label = 'bf16' if args.bf16 else 'f32'
    print(f'compiling 3 variants (start={args.start}, pb={args.pb}, '
          f'{label}, b={b})...', flush=True)
    t0 = time.perf_counter()
    got = np.asarray(hybrid_full(patches))
    ref = np.asarray(base_full(patches))
    print(f'  compiled + first run in {time.perf_counter() - t0:.0f} s')

    diff = float(np.abs(got - ref).max())
    denom = float(np.abs(ref).max())
    print(f'on-chip parity: max |hybrid-base| = {diff:.3e} '
          f'(rel {diff / max(denom, 1e-30):.3e})')

    import itertools
    ticket = itertools.count(1)

    def med(fn):
        def call(x):
            return fn(x, jnp.float32(next(ticket)))
        lo, mid, hi = slope_time(call, batches, n_long=N_INPUTS,
                                 trials=args.trials)
        spread = hi / max(lo, 1e-9)
        return mid, spread

    t_base, s_base = med(base)
    t_hyb, s_hyb = med(hybrid)
    t_head, s_head = med(head_only)
    tail_base = t_base - t_head
    tail_fused = t_hyb - t_head
    print(f'\nembed {label}, {b} patches ({args.seconds:.0f} s audio), '
          f'median slopes (distrust spreads > 2x):')
    print(f'  base (all XLA)        : {t_base * 1e3:8.2f} ms  '
          f'(spread {s_base:.1f}x)')
    print(f'  hybrid (fused tail)   : {t_hyb * 1e3:8.2f} ms  '
          f'(spread {s_hyb:.1f}x)   {t_base / max(t_hyb, 1e-9):5.2f}x '
          f'end-to-end')
    print(f'  head 1..{args.start - 1} (shared)   : {t_head * 1e3:8.2f} ms  '
          f'(spread {s_head:.1f}x)')
    print(f'  tail {args.start}..14 XLA        : {tail_base * 1e3:8.2f} ms')
    print(f'  tail {args.start}..14 pallas     : {tail_fused * 1e3:8.2f} ms   '
          f'{tail_base / max(tail_fused, 1e-9):5.2f}x tail-only')


def race_variants(args):
    """Race the all-XLA embed against each --variants fused-block layout.

    Unlike the default mode (sequential slope_time per graph), trials here
    are interleaved variant-by-variant, so the tunneled link's duty-cycle
    drift degrades every variant equally instead of whichever ran last.
    """
    import itertools
    import numpy as np
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.models import yamnet as yam

    dev = jax.devices()[0]
    print(f'backend: {dev.platform} ({dev.device_kind})', flush=True)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    label = 'bf16' if args.bf16 else 'f32'

    params = jax.device_put(yam.fold_batchnorm(yam.init_raw_params(seed=7)))
    b = int(args.seconds / 0.96)
    batches = [jax.random.normal(jax.random.PRNGKey(i), (b, 96, 64),
                                 jnp.float32) for i in range(N_INPUTS)]
    ticket = itertools.count(1)

    def make(blocks):
        if blocks is None:
            def f(x, i):
                return jnp.sum(yam.embed(params, x + i * 1e-6,
                                         compute_dtype=dtype))
        elif isinstance(blocks, dict):
            # packed front config (round-4 refutation rerun): set the
            # trace-time knob INSIDE the traced fn so jit's deferred
            # tracing bakes the intended config, not the module default
            def f(x, i, front=blocks):
                saved = yam.PALLAS_FRONT
                yam.PALLAS_FRONT = front
                try:
                    return jnp.sum(yam.embed(params, x + i * 1e-6,
                                             compute_dtype=dtype,
                                             conv='pallas'))
                finally:
                    yam.PALLAS_FRONT = saved
        else:
            def f(x, i):
                x = (x + i * 1e-6).astype(dtype)[..., None]
                for key, kind, stride, _shape in yam._conv_shapes():
                    if int(key.split('/')[0][len('layer'):]) >= blocks[0][0]:
                        break
                    kernel = params[f'{key}/kernel'].astype(dtype)
                    bias = params[f'{key}/bias'].astype(jnp.float32)
                    x = yam._conv2d(x, kernel, stride,
                                    depthwise=(kind == 'depthwise'))
                    x = jax.nn.relu(
                        x.astype(jnp.float32) + bias).astype(dtype)
                return jnp.sum(yam._pallas_embed(params, x, dtype, blocks))
        return jax.jit(f)

    variants = [('all-XLA', None)] + [
        (spec, parse_blocks(spec)) for spec in args.variants]
    fns = {}
    for name, blocks in variants:
        print(f'compiling {name} ...', flush=True)
        t0 = time.perf_counter()
        fns[name] = make(blocks)
        got = float(fns[name](batches[0], jnp.float32(0.0)))
        print(f'  compiled + first run in {time.perf_counter() - t0:.0f} s '
              f'(sum {got:.1f})', flush=True)

    def run(fn, k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn(batches[i % N_INPUTS], jnp.float32(next(ticket)))
        np.asarray(out)
        return time.perf_counter() - t0

    slopes = {name: [] for name, _ in variants}
    for t in range(args.trials):
        for name, _ in variants:
            fn = fns[name]
            if args.method == 'wall':
                # long-run wall: amortizes dispatch noise over many
                # unique dispatches; repeats to ~1.5% where slope
                # medians scatter by ~15% (docs/tuning.md)
                k = args.wall_dispatches
                slopes[name].append(run(fn, k) / k)
            else:
                short = min(run(fn, 2) for _ in range(2))
                long = min(run(fn, N_INPUTS) for _ in range(2))
                slopes[name].append(
                    max(0.0, (long - short) / (N_INPUTS - 2)))
        print(f'trial {t + 1}/{args.trials} done', flush=True)

    kind = ('median wall per dispatch' if args.method == 'wall'
            else 'median slopes (distrust spreads > 2x)')
    print(f'\nembed {label}, {b} patches ({args.seconds:.0f} s audio), '
          f'{kind}:')
    base_med = None
    for name, _ in variants:
        ss = sorted(slopes[name])
        med, spread = ss[len(ss) // 2], ss[-1] / max(ss[0], 1e-9)
        if base_med is None:
            base_med = med
        print(f'  {name:24s}: {med * 1e3:8.2f} ms  (spread {spread:.1f}x)  '
              f'{base_med / max(med, 1e-9):5.2f}x vs XLA')


if __name__ == '__main__':
    main()
