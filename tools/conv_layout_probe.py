#!/usr/bin/env python
"""Measure pointwise-conv-as-flattened-matmul against the conv embed.

Hypothesis (from tools/roofline.py): the late conv layers run far off
their MXU floor because XLA tiles 1x1 convolutions over the spatial
dims, and by layer 13 a patch's spatial extent is 3x2 — six rows, less
than one 8-sublane tile, so the systolic array runs nearly empty no
matter how many patches are batched. Reshaping (B, H, W, C) ->
(B*H*W, C) and using a plain dot_general hands XLA a tall well-tiled
matmul instead (the math is identical: a 1x1 conv IS a per-position
matmul).

This probe times the shipped embed against the flattened-pw variant on
the current backend and reports per-chunk times plus numeric deviation.

Usage: python tools/conv_layout_probe.py [--bf16] [--seconds 960]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seconds', type=float, default=960.0)
    ap.add_argument('--bf16', action='store_true')
    ap.add_argument('--chunks', type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from graph_cost_probe import slope_time
    from buzzdetect_tpu.models import yamnet as yamnet_lib
    from buzzdetect_tpu.models.convert import load_bundle

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
    arrays, _ = load_bundle(os.path.join(repo, 'models', 'model_general_v3'))
    raw = {k[len('yamnet_raw/'):]: v for k, v in arrays.items()
           if k.startswith('yamnet_raw/')}
    params = jax.device_put(yamnet_lib.fold_batchnorm(raw))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    b = int(args.seconds / 0.96)
    patches = [jax.device_put(jax.random.normal(
        jax.random.PRNGKey(i), (b, 96, 64), jnp.float32)) for i in range(3)]

    def embed_flat_pw(params, x, compute_dtype):
        """yamnet_lib.embed with 1x1 convs as flattened dots."""
        precision = (jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
        x = x.astype(compute_dtype)[..., None]
        for key, kind, stride, shape in yamnet_lib._conv_shapes():
            kernel = params[f'{key}/kernel'].astype(compute_dtype)
            bias = params[f'{key}/bias'].astype(jnp.float32)
            if kind == 'full' and shape[0] == 1 and shape[1] == 1:
                bsz, h, w, c = x.shape
                y = jax.lax.dot_general(
                    x.reshape(bsz * h * w, c), kernel.reshape(c, shape[3]),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
                x = y.reshape(bsz, h, w, shape[3])
            else:
                x = yamnet_lib._conv2d(x, kernel, stride,
                                       depthwise=(kind == 'depthwise'))
                x = x.astype(jnp.float32)
            x = jax.nn.relu(x.astype(jnp.float32) + bias).astype(compute_dtype)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    base = jax.jit(partial(yamnet_lib.embed, params, compute_dtype=dtype))
    flat = jax.jit(partial(embed_flat_pw, params, compute_dtype=dtype))

    dev = float(jnp.max(jnp.abs(base(patches[0]) - flat(patches[0]))))
    label = 'bf16' if args.bf16 else 'f32'
    print(f'compute = {label}, {b} patches/chunk; max |base - flat| = '
          f'{dev:.2e}')
    for name, fn in [('conv pw (shipped)', base), ('flattened-dot pw', flat)]:
        best, med, worst = slope_time(fn, patches, args.chunks)
        print(f'  {name:20s} {med * 1e3:8.2f} ms '
              f'[{best * 1e3:.2f}..{worst * 1e3:.2f}]')


if __name__ == '__main__':
    main()
