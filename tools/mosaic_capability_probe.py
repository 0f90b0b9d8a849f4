#!/usr/bin/env python
"""Which tensor-shape operations does this Mosaic toolchain compile?

The fused conv-stack kernel design (ops/pallas_conv.py) hinges on a few
layout-sensitive operations inside a Pallas TPU kernel — strided slices
for stride-2 convolution subsampling, leading-dim reshapes, dim collapses
into the sublane dim, and lane/sublane rolls for the 3x3 depthwise taps.
The pallas frontend kernel found two restrictions the docs don't state
(see ops/pallas_frontend.py header); this probe answers the rest on the
REAL toolchain instead of guessing: each candidate op compiles and runs
in a minimal kernel, and the result is checked against numpy.

Run on the TPU (each case is a small fresh compile):
    python tools/mosaic_capability_probe.py
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def probe(name, fn):
    try:
        ok, detail = fn()
        print(f'  {"PASS" if ok else "WRONG":6s} {name}  {detail}')
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = str(e).split('\n')[0][:110]
        print(f'  FAIL   {name}  [{type(e).__name__}] {msg}')
        if os.environ.get('PROBE_TRACE'):
            traceback.print_exc()


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f'backend: {jax.devices()[0].platform} ({jax.devices()[0]})')

    x4 = np.arange(4 * 16 * 16 * 128, dtype=np.float32).reshape(4, 16, 16, 128)
    x2 = np.arange(64 * 256, dtype=np.float32).reshape(64, 256)

    def run(kernel, out_shape, *args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    # 1. strided slices in each dim role (stride-2 conv subsampling)
    x3 = np.arange(16 * 16 * 128, dtype=np.float32).reshape(16, 16, 128)

    def case_stride_lane():
        def k(i, o):
            o[:] = i[:][:, :, ::2]
        out = run(k, (16, 16, 64), x3)
        return np.array_equal(out, x3[:, :, ::2]), 'x[:, :, ::2] (lane dim)'

    def case_stride_sublane():
        def k(i, o):
            o[:] = i[:][:, ::2, :]
        out = run(k, (16, 8, 128), x3)
        return np.array_equal(out, x3[:, ::2, :]), 'x[:, ::2, :] (sublane dim)'

    def case_stride_leading():
        def k(i, o):
            o[:] = i[:][::2]
        out = run(k, (2, 16, 16, 128), x4)
        return np.array_equal(out, x4[::2]), 'x[::2] (leading dim)'

    # 2. leading-dim reshape (split/merge that leaves tiled dims alone)
    def case_reshape_leading_split():
        def k(i, o):
            o[:] = i[:].reshape(2, 2, 16, 16, 128)[:, 0]
        out = run(k, (2, 16, 16, 128), x4)
        return np.array_equal(out, x4.reshape(2, 2, 16, 16, 128)[:, 0]), \
            '(4,16,16,128)->(2,2,16,16,128) + index'

    def case_reshape_leading_merge():
        def k(i, o):
            o[:] = i[:].reshape(64, 16, 128)
        out = run(k, (64, 16, 128), x4)
        return np.array_equal(out, x4.reshape(64, 16, 128)), \
            '(4,16,16,128)->(64,16,128)'

    # 3. collapse INTO the sublane dim: (B,H,W,C)->(B*H*W, C)
    def case_collapse_to_2d():
        def k(i, o):
            o[:] = i[:].reshape(4 * 16 * 16, 128)
        out = run(k, (4 * 16 * 16, 128), x4)
        return np.array_equal(out, x4.reshape(-1, 128)), \
            '(4,16,16,128)->(1024,128)'

    # 4. split the sublane dim: (R, W*C) -> (R, W, C)
    def case_split_minor():
        def k(i, o):
            o[:] = i[:].reshape(64, 2, 128)
        out = run(k, (64, 2, 128), x2)
        return np.array_equal(out, x2.reshape(64, 2, 128)), \
            '(64,256)->(64,2,128) (split lanes)'

    # 5. rolls for the depthwise taps
    def case_roll_sublane():
        def k(i, o):
            o[:] = pltpu.roll(i[:], 1, 1)
        out = run(k, (16, 16, 128), x3)
        return np.array_equal(out, np.roll(x3, 1, 1)), 'pltpu.roll axis=1'

    def case_roll_lane():
        def k(i, o):
            o[:] = pltpu.roll(i[:], 128, 2)
        out = run(k, (16, 16, 128), x3)
        return np.array_equal(out, np.roll(x3, 128, 2)), \
            'pltpu.roll axis=2 (lane, by 128)'

    # 6. jnp.pad+slice shift on sublane dim (the XLA-ish way to shift)
    def case_pad_slice_shift():
        def k(i, o):
            y = jnp.pad(i[:], ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
            o[:] = y
        out = run(k, (16, 16, 128), x3)
        ref = np.pad(x3, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
        return np.array_equal(out, ref), 'pad+slice shift (sublane)'

    # 7. transpose of the two minor dims (would enable W<->C tricks)
    def case_transpose_minor():
        def k(i, o):
            o[:] = jnp.swapaxes(i[:], 1, 2)
        out = run(k, (16, 128, 16), x3)
        return np.array_equal(out, np.swapaxes(x3, 1, 2)), \
            'swapaxes(sublane, lane)'

    # 8. dot on a leading-collapsed view (pw conv as flattened matmul)
    xs = np.random.default_rng(0).standard_normal(
        (4, 16, 16, 128)).astype(np.float32)

    def case_collapsed_dot():
        w = np.random.default_rng(1).standard_normal(
            (128, 128)).astype(np.float32)

        def k(i, wref, o):
            flat = i[:].reshape(4 * 16 * 16, 128)
            o[:] = jnp.dot(flat, wref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xs, w)
        return np.allclose(out, xs.reshape(-1, 128) @ w, atol=1e-4), \
            'reshape(B*H*W,C) @ (C,F) @HIGHEST'

    # 9. 2-D row gather with kernel-computed indices (stride-2 subsample)
    def case_row_gather():
        def k(i, o):
            flat = i[:].reshape(4 * 16 * 16, 128)   # patches of 16x16 rows
            # rows (p, 2*ho*16 + 2*wo) for ho in 0..7, wo in 0..7
            p = jax.lax.broadcasted_iota(jnp.int32, (4, 8, 8), 0)
            ho = jax.lax.broadcasted_iota(jnp.int32, (4, 8, 8), 1)
            wo = jax.lax.broadcasted_iota(jnp.int32, (4, 8, 8), 2)
            idx = (p * 256 + 2 * ho * 16 + 2 * wo).reshape(4 * 64)
            o[:] = jnp.take(flat, idx, axis=0)
        out = run(k, (256, 128), x4)
        ref = x4.reshape(4, 16, 16, 128)[:, ::2, ::2].reshape(256, 128)
        return np.array_equal(out, ref), 'take(rows) computed idx'

    # 10. iota + bitwise mask arithmetic on the sublane dim of a 3-D array
    def case_iota_mask():
        def k(i, o):
            pos = jax.lax.broadcasted_iota(jnp.int32, i.shape, 1)
            w = jnp.bitwise_and(pos, 3)            # pos % 4 (W = 4)
            o[:] = jnp.where(w == 0, 0.0, i[:])
        out = run(k, (16, 16, 128), x3)
        pos = np.arange(16).reshape(1, 16, 1) % 4
        ref = np.where(pos == 0, 0.0, x3)
        return np.array_equal(out, ref), 'mask rows where pos%4==0'

    # 11. non-pow2 modulo on an iota (patch-boundary masks when HW=24)
    def case_iota_mod24():
        def k(i, o):
            pos = jax.lax.broadcasted_iota(jnp.int32, i.shape, 1)
            o[:] = jnp.where(jnp.remainder(pos, 3) == 0, 0.0, i[:])
        out = run(k, (16, 16, 128), x3)
        pos = np.arange(16).reshape(1, 16, 1) % 3
        ref = np.where(pos == 0, 0.0, x3)
        return np.array_equal(out, ref), 'mask rows where pos%3==0'

    # 12. split the SUBLANE dim: (16,16,128)->(16,8,2,128) + index
    def case_split_sublane():
        def k(i, o):
            o[:] = i[:].reshape(16, 8, 2, 128)[:, :, 0]
        out = run(k, (16, 8, 128), x3)
        return np.array_equal(out, x3.reshape(16, 8, 2, 128)[:, :, 0]), \
            '(16,16,128)->(16,8,2,128)[:, :, 0]'

    # 13-17: front-block probes (round 4). Findings on this toolchain:
    # lane rolls by non-128 amounts normally PASS, but returned silently
    # WRONG results once in a session whose backend was already degraded
    # (subsequent compiles FAILED_PRECONDITION) — keep this case in the
    # sweep as a canary; minor-dim splits need the new minor to be a 128
    # multiple; lane-dim pad+slice shifts DO compile; swapaxes of the
    # two non-minor dims plus a leading merge compiles (the packed
    # front's un-interleave).
    xf = np.arange(8 * 48 * 1024, dtype=np.float32).reshape(8, 48, 1024)

    def case_roll_lane_32():
        def k(i, o):
            o[:] = pltpu.roll(i[:], 32, 2)
        out = run(k, xf.shape, xf)
        return np.array_equal(out, np.roll(xf, 32, 2)), \
            'pltpu.roll axis=2 by 32 (non-128)'

    def case_pad_slice_lane():
        def k(i, o):
            o[:] = jnp.pad(i[:], ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        out = run(k, xf.shape, xf)
        ref = np.pad(xf, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
        return np.array_equal(out, ref), 'lane shift via pad+slice'

    def case_split_minor_small():
        def k(i, o):
            o[:] = i[:].reshape(8, 48, 32, 32)
        out = run(k, (8, 48, 32, 32), xf)
        return np.array_equal(out, xf.reshape(8, 48, 32, 32)), \
            'split lanes -> new minor 32 (<128)'

    def case_swap_nonminor_merge():
        x5 = np.arange(2 * 384 * 512, dtype=np.float32).reshape(2, 384, 512)

        def k(i, o):
            y = i[:].reshape(2, 384, 4, 128)
            o[:] = jnp.swapaxes(y, 1, 2).reshape(8, 384, 128)
        out = run(k, (8, 384, 128), x5)
        ref = np.swapaxes(x5.reshape(2, 384, 4, 128), 1, 2).reshape(
            8, 384, 128)
        return np.array_equal(out, ref), 'swap(1,2)+merge un-interleave'

    def case_outer_broadcast_mul():
        xc = np.arange(32 * 96 * 128, dtype=np.float32).reshape(32, 96, 128)
        wc = np.arange(32, dtype=np.float32).reshape(32, 1, 1)

        def k(i, wref, o):
            o[:] = i[:] * wref[:]
        out = run(k, xc.shape, xc, wc)
        return np.array_equal(out, xc * wc), '(C,1,1)*(C,HW,pb)'

    # 18-19: dot precision (round 5). Finding on this toolchain: the
    # in-kernel dot lowering supports ONLY DEFAULT and HIGHEST —
    # Precision.HIGH raises NotImplementedError at lowering (2026-08-20),
    # which is why ops/pallas_conv.py EMULATES HIGH as hi/lo bf16 splits
    # + 3 DEFAULT-precision dots (_pw_dot). If dot_high ever flips to
    # PASS, the native form may beat the emulation — re-race them.
    def case_dot_high():
        w = np.random.default_rng(1).standard_normal(
            (128, 128)).astype(np.float32)

        def k(i, wref, o):
            flat = i[:].reshape(4 * 16 * 16, 128)
            o[:] = jnp.dot(flat, wref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGH)
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xs, w)
        return np.allclose(out, xs.reshape(-1, 128) @ w, atol=1e-3), \
            'dot @Precision.HIGH (native)'

    def case_dot_high_emulated():
        from buzzdetect_tpu.ops.pallas_conv import _pw_dot, _split_hi_lo
        w = np.random.default_rng(1).standard_normal(
            (128, 128)).astype(np.float32)
        whl = np.asarray(_split_hi_lo(jnp.asarray(w)))

        def k(i, wref, o):
            flat = i[:].reshape(4 * 16 * 16, 128)
            o[:] = _pw_dot(flat, wref, jnp.float32,
                           jax.lax.Precision.HIGH)
        out = pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xs, whl)
        return np.allclose(out, xs.reshape(-1, 128) @ w, atol=1e-3), \
            'dot @HIGH emulated (hi/lo bf16 x3)'

    for case in [case_stride_lane, case_stride_sublane, case_stride_leading,
                 case_reshape_leading_split, case_reshape_leading_merge,
                 case_collapse_to_2d, case_split_minor, case_roll_sublane,
                 case_roll_lane, case_pad_slice_shift, case_transpose_minor,
                 case_collapsed_dot, case_row_gather, case_iota_mask,
                 case_iota_mod24, case_split_sublane, case_roll_lane_32,
                 case_pad_slice_lane, case_split_minor_small,
                 case_swap_nonminor_merge, case_outer_broadcast_mul,
                 case_dot_high, case_dot_high_emulated]:
        probe(case.__name__[5:], case)


if __name__ == '__main__':
    main()
