#!/usr/bin/env python
"""Probe: do int8 pointwise convs beat bf16 on the real chip?

YAMNet's 13 pointwise (1x1) convs carry ~74% of the MACs and are pure
matmuls, so they are the only part of the graph that can ride the MXU's
int8 mode (TPU v5e: 788 TOPS int8 vs 394 TFLOPS bf16 — a 2x ceiling).
This probe builds a prototype embed with

  * stem 3x3 conv + all depthwise convs in bf16 (VPU-bound; int8 buys
    nothing there), and
  * pointwise convs as int8 x int8 -> int32 ``dot_general`` over the
    flattened (B*H*W, Cin) activations — symmetric per-output-channel
    weight scales (offline) and a dynamic per-tensor activation scale
    (abs-max, computed on device each layer),

and times it against the shipped bf16 and f32 embeds with the
dispatch-slope method (median of 5 interleaved trials — single slopes
through the tunneled link are unreliable). It also reports embedding
deviation vs f32 so the parity cost is recorded next to the win.

A WIN here (>~1.3x vs bf16) justifies promoting the int8 path into
``models/yamnet.py`` as a third compute mode; a LOSS gets recorded in
docs/tuning.md like the other refuted experiments.

Usage: python tools/int8_tpu_probe.py [--patches 1000] [--chunks 20]
"""

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


from buzzdetect_tpu.utils import dispatch_slope as slope_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--patches', type=int, default=1000,
                    help='batch of 96x64 log-mel patches (1000 ~= 960 s)')
    ap.add_argument('--chunks', type=int, default=20)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from buzzdetect_tpu.models.convert import load_bundle
    from buzzdetect_tpu.models import yamnet as yamnet_lib

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
    arrays, _ = load_bundle(os.path.join(repo, 'models', 'model_general_v3'))
    raw = {k[len('yamnet_raw/'):]: np.asarray(v) for k, v in arrays.items()
           if k.startswith('yamnet_raw/')}
    params = yamnet_lib.fold_batchnorm(raw)

    # --- offline weight quantization for the pointwise convs ---------------
    qparams = {}
    for key, kind, stride, shape in yamnet_lib._conv_shapes():
        kernel = params[f'{key}/kernel']
        if key.endswith('/pointwise_conv'):
            w = kernel.reshape(kernel.shape[2], kernel.shape[3])  # (Cin, Cout)
            s_w = np.max(np.abs(w), axis=0) / 127.0               # per out ch
            s_w = np.where(s_w == 0, 1.0, s_w)
            qparams[f'{key}/qkernel'] = np.clip(
                np.round(w / s_w), -127, 127).astype(np.int8)
            qparams[f'{key}/wscale'] = s_w.astype(np.float32)
        else:
            qparams[f'{key}/kernel'] = kernel
        qparams[f'{key}/bias'] = params[f'{key}/bias']

    def embed_q8(qp, patches, act_scales=None):
        """act_scales None -> dynamic per-tensor abs-max each layer (a full
        reduction: serializes layers and forces f32 materialization);
        act_scales dict -> static offline calibration (the quantize step is a
        fuseable elementwise mul+round+clip, no runtime reduction)."""
        x = patches.astype(jnp.bfloat16)
        if x.ndim == 3:
            x = x[..., None]
        for key, kind, stride, _shape in yamnet_lib._conv_shapes():
            bias = qp[f'{key}/bias'].astype(jnp.float32)
            if key.endswith('/pointwise_conv'):
                b, h, w, cin = x.shape
                if act_scales is None:
                    amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
                    s_a = jnp.maximum(amax, 1e-12) / 127.0
                else:
                    s_a = act_scales[key]
                qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s_a),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    qx.reshape(b * h * w, cin), qp[f'{key}/qkernel'],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32)
                     * (s_a * qp[f'{key}/wscale'])).reshape(b, h, w, -1)
            else:
                kernel = qp[f'{key}/kernel'].astype(jnp.bfloat16)
                y = yamnet_lib._conv2d(x, kernel, stride,
                                       depthwise=(kind == 'depthwise'))
            x = jax.nn.relu(y.astype(jnp.float32) + bias).astype(jnp.bfloat16)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    @jax.jit
    def _calibrate_on_device(patches):
        """Per-layer input abs-max from one f32 forward pass. Runs as ONE
        jit graph returning 13 scalars — materializing the intermediates on
        the host would drag ~0.5 GB through the throttled tunnel."""
        x = patches.astype(jnp.float32)
        if x.ndim == 3:
            x = x[..., None]
        scales = {}
        for key, kind, stride, _shape in yamnet_lib._conv_shapes():
            if key.endswith('/pointwise_conv'):
                scales[key] = jnp.max(jnp.abs(x)) / 127.0
            y = yamnet_lib._conv2d(x, jnp.asarray(params[f'{key}/kernel']),
                                   stride, depthwise=(kind == 'depthwise'))
            x = jax.nn.relu(y + params[f'{key}/bias'])
        return scales

    def calibrate_act_scales(patches):
        return {k: float(v) for k, v in
                _calibrate_on_device(patches).items()}

    @jax.jit
    def gen(key):
        # realistic log-mel magnitudes: roughly [-4, +2]
        return jax.random.normal(key, (args.patches, 96, 64),
                                 jnp.float32) * 1.5 - 1.0

    pats = [gen(jax.random.PRNGKey(i)) for i in range(3)]

    embed_f32 = jax.jit(partial(yamnet_lib.embed, params,
                                compute_dtype=jnp.float32))
    embed_bf16 = jax.jit(partial(yamnet_lib.embed, params,
                                 compute_dtype=jnp.bfloat16))
    embed_int8 = jax.jit(partial(embed_q8, qparams))
    act_scales = calibrate_act_scales(pats[0])
    embed_int8s = jax.jit(partial(embed_q8, qparams, act_scales=act_scales))

    # parity first (also warms the compiles)
    ref = np.asarray(embed_f32(pats[0]))
    dev_bf16 = float(np.max(np.abs(np.asarray(embed_bf16(pats[0])) - ref)))
    dev_int8 = float(np.max(np.abs(np.asarray(embed_int8(pats[0])) - ref)))
    dev_int8s = float(np.max(np.abs(np.asarray(embed_int8s(pats[1])) -
                                    np.asarray(embed_f32(pats[1])))))
    scale = float(np.max(np.abs(ref)))
    print(f'embedding abs-max (f32 ref): {scale:.4f}')
    print(f'max |bf16 - f32|: {dev_bf16:.5f}   '
          f'max |int8-dyn - f32|: {dev_int8:.5f}   '
          f'max |int8-static - f32| (held-out batch): {dev_int8s:.5f}')

    variants = [
        ('embed f32', embed_f32),
        ('embed bf16', embed_bf16),
        ('embed int8-dynamic', embed_int8),
        ('embed int8-static', embed_int8s),
    ]
    print(f'\n{args.patches} patches/call, slope over {args.chunks} '
          f'dispatches, median of 5 trials:')
    meds = {}
    for name, fn in variants:
        best, med, worst = slope_time(fn, pats, args.chunks)
        meds[name] = med
        print(f'  {name:24s} {med * 1e3:8.2f} ms '
              f'[{best * 1e3:.2f}..{worst * 1e3:.2f}]')
    for name in ('embed int8-dynamic', 'embed int8-static'):
        if meds.get(name, 0) > 0:
            print(f"{name} vs bf16: {meds['embed bf16'] / meds[name]:.2f}x   "
                  f"vs f32: {meds['embed f32'] / meds[name]:.2f}x")


if __name__ == '__main__':
    main()
