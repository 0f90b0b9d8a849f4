"""Fused MobileNet tail (sep-conv stack + pooling) as one Pallas TPU kernel.

Why this kernel exists (measured on v5e, tools/roofline.py +
tools/conv_layout_probe.py, 2026-08): the late YAMNet layers run 4.5-5.4x
off their roofline floor under XLA. Two causes, both layout:

* activations shaped (B, 3, 2, 1024) tile as (sublane=2, lane=1024) — 2 of
  8 sublanes used, so every elementwise op and every conv pays ~4x its true
  cost (a bias+relu on that shape measured 93 GB/s effective against a
  435 GB/s streaming peak);
* each layer boundary round-trips HBM, which XLA cannot avoid because it
  does not fuse conv->conv.

The fix is to OWN the layout: this kernel keeps a block of patches resident
in VMEM with activations flattened to (Pb, H*W, C) — full 8-sublane tiles at
every layer — and runs the whole tail (depthwise + pointwise + bias + relu
per layer, then global average pooling) with zero intermediate HBM traffic.

Per-op mapping (constraints verified by tools/mosaic_capability_probe.py on
the real toolchain — strided slices do NOT compile; leading-dim reshapes,
sublane rolls, 2-D row gathers and minor transposes do):

* depthwise 3x3: 9 taps, each a per-patch sublane roll of the flattened
  spatial axis (axis=1 never crosses patch boundaries) followed by one
  fused multiply-add against precomputed masked weights — the edge-validity
  mask is static per (layer, tap), so it rides in as a tiny (9, H*W, 1)
  operand and folds into the tap weights ((HW,1)x(1,C) broadcast), deleting
  the per-tap full-size select a positional-iota mask would cost; the
  center tap is valid everywhere and needs neither roll nor mask, so it
  initializes the accumulator — pure VPU, 3 full-size ops per off-center
  tap (roll, mul, add);
* stride-2 subsample: keep the ODD positions (rows (2*ho+1)*W + 2*wo+1 —
  SAME padding on even input pads only bottom/right, so parity with the
  XLA/TF conv demands the odd offsets) via reshape-split + static index
  steps, since strided slices do not compile (see _subsample_rows);
* pointwise 1x1: the (Pb*HW, C) collapsed view @ (C, F) on the MXU at
  Precision.HIGHEST (f32 parity mode) or DEFAULT (bf16 mode) — Pb is
  chosen so Pb*HW >= 128 rows even at the 3x2-spatial layers;
* BatchNorm is already folded into kernel+bias upstream
  (models/yamnet.py::fold_batchnorm); bias+relu ride the same VMEM pass.

Reference parity: the stack mirrors models/yamnet.py::embed layer for
layer (reference embedders/yamnet/yamnet.py:77-106); numerics match the
XLA path to float32 rounding (tests/test_pallas_conv.py, interpret mode;
tools/pallas_conv_tpu_probe.py compiled on hardware).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from buzzdetect_tpu.models.yamnet import LAYER_DEFS

TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
CENTER = TAPS.index((0, 0))


@dataclass(frozen=True)
class SepSpec:
    """One depthwise-separable layer inside the fused stack."""
    index: int            # 1-based layer number in LAYER_DEFS
    h: int                # input spatial height
    w: int                # input spatial width (power of two)
    c_in: int
    c_out: int
    stride: int

    @property
    def name(self):
        return f'layer{self.index}'

    @property
    def h_out(self):
        return -(-self.h // self.stride)

    @property
    def w_out(self):
        return -(-self.w // self.stride)


def tail_specs(start_layer: int = 8, stop_layer: int = None):
    """SepSpecs for LAYER_DEFS[start_layer-1:stop_layer-1], with input
    spatial sizes (stop_layer is exclusive; None runs to the end).

    Only 'sep' layers qualify (the first full-conv layer stays XLA); the
    edge masks are precomputed host-side so no shape constraint beyond
    even H/W at stride-2 layers applies.
    """
    stop = len(LAYER_DEFS) + 1 if stop_layer is None else stop_layer
    h, w, c = 96, 64, 1
    specs = []
    for i, (kind, stride, filters) in enumerate(LAYER_DEFS, start=1):
        if start_layer <= i < stop:
            if kind != 'sep':
                raise ValueError(f'layer {i} is not a sep layer')
            specs.append(SepSpec(i, h, w, c, filters, stride))
        h, w, c = -(-h // stride), -(-w // stride), filters
    if not specs:
        raise ValueError(f'empty layer range [{start_layer}, {stop})')
    return tuple(specs)


def _tap_masks(spec: SepSpec) -> np.ndarray:
    """(9, H*W, 1) f32 edge-validity mask per tap: 1 where the tap's shifted
    read stays inside the patch's spatial plane. Static per layer, so it is
    precomputed host-side and folded into the tap weights inside the kernel
    ((HW,1)x(1,C) broadcast) instead of paying a full-size select per tap."""
    pos = np.arange(spec.h * spec.w)
    hpos, wpos = pos // spec.w, pos % spec.w
    return np.stack([
        ((hpos + dy >= 0) & (hpos + dy < spec.h)
         & (wpos + dx >= 0) & (wpos + dx < spec.w)).astype(np.float32)
        for dy, dx in TAPS]).reshape(9, spec.h * spec.w, 1)


def pack_tail_params(params: dict, specs, compute_dtype=jnp.float32):
    """Folded yamnet params -> the kernel's flat operand list.

    Per layer: dw taps (9, 1, C) [tap t = kernel[dy, dx, 0, :]], dw bias
    (1, C) f32, tap edge masks (9, H*W, 1) f32, pw kernel (C, F), pw bias
    (1, F) f32. Only the pointwise kernel is cast to the compute dtype
    (it feeds the MXU dot); dw taps and biases stay f32 for the VPU math.
    """
    ops = []
    for s in specs:
        # jnp ops throughout: params may be tracers (this runs inside the
        # classifier's jitted graph)
        dw = jnp.asarray(params[f'{s.name}/depthwise_conv/kernel'])
        pw = jnp.asarray(params[f'{s.name}/pointwise_conv/kernel'])
        ops += [
            # dw taps stay f32: they feed the f32 VPU multiply-adds (where
            # bf16 buys no throughput) — compute_dtype touches only the
            # MXU dot operands, as the kernel docstring promises
            dw.reshape(9, 1, s.c_in).astype(jnp.float32),
            jnp.asarray(params[f'{s.name}/depthwise_conv/bias'],
                        jnp.float32).reshape(1, s.c_in),
            jnp.asarray(_tap_masks(s)),
            pw.reshape(s.c_in, s.c_out).astype(compute_dtype),
            jnp.asarray(params[f'{s.name}/pointwise_conv/bias'],
                        jnp.float32).reshape(1, s.c_out),
        ]
    return ops


def _subsample_rows(x, spec: SepSpec, pb: int):
    """(Pb, H*W, C) -> (Pb, Ho*Wo, C), keeping rows ((2ho+1)*W + 2wo+1).

    SAME padding for a 3x3 stride-2 conv on even input pads only the
    bottom/right (pad_total=1), so output (ho, wo) is the stride-1 centered
    conv evaluated at (2ho+1, 2wo+1) — the ODD positions. Strided slices
    don't compile on this toolchain (see tools/mosaic_capability_probe.py),
    but splitting a dim in two and statically indexing one half does — so
    stride-2 is two split+index steps (H, then W), all on probed-PASS
    reshapes.
    """
    assert spec.stride == 2 and spec.h % 2 == 0 and spec.w % 2 == 0
    c = x.shape[-1]
    y = x.reshape(pb, spec.h // 2, 2, spec.w, c)[:, :, 1]   # odd rows
    y = y.reshape(pb, spec.h // 2, spec.w // 2, 2, c)[:, :, :, 1]  # odd cols
    return y.reshape(pb, spec.h_out * spec.w_out, c)


def _tail_kernel(*refs, specs, pb, compute_dtype, gap):
    """refs = [x_ref, (dw, dw_b, masks, pw, pw_b) * len(specs), out_ref].

    Activations stay float32 on the VPU side regardless of compute_dtype:
    Mosaic's dynamic_rotate only handles 32-bit vectors ("Rotate with
    non-32-bit data" compile error on bf16), and the depthwise taps
    accumulate in f32 anyway. compute_dtype only selects the MXU dot
    operands' dtype/precision — where the bf16 throughput lives.
    """
    x_ref, out_ref = refs[0], refs[-1]
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    x = x_ref[:].astype(jnp.float32)

    for li, spec in enumerate(specs):
        dw_ref, dwb_ref, mask_ref, pw_ref, pwb_ref = \
            refs[1 + 5 * li: 6 + 5 * li]
        hw = spec.h * spec.w

        # center tap: valid everywhere, zero shift — it seeds the
        # accumulator, saving a zeros-init add and a mask multiply
        acc = x * dw_ref[CENTER]
        for t, (dy, dx) in enumerate(TAPS):
            if t == CENTER:
                continue
            # circular roll bringing x[pos + shift] to pos (shift may be
            # negative; pltpu.roll wants a non-negative amount, so wrap);
            # wrapped-in garbage is zeroed by the masked weights
            shift = (-(dy * spec.w + dx)) % hw
            shifted = pltpu.roll(x, shift, 1)
            acc = acc + shifted * (mask_ref[t] * dw_ref[t])
        if spec.stride > 1:
            acc = _subsample_rows(acc, spec, pb)
        y = jax.nn.relu(acc + dwb_ref[:])

        hwo = spec.h_out * spec.w_out
        flat = y.reshape(pb * hwo, spec.c_in).astype(compute_dtype)
        z = jax.lax.dot_general(
            flat, pw_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        x = jax.nn.relu(z.reshape(pb, hwo, spec.c_out) + pwb_ref[:])

    if gap:
        out_ref[:] = jnp.mean(x.astype(jnp.float32), axis=1)
    else:
        out_ref[:] = x.astype(jnp.float32)


def fused_tail(params: dict, x: jnp.ndarray, *, start_layer: int = 8,
               stop_layer: int = None, block_patches: int = 32,
               compute_dtype=jnp.float32, gap: bool = True,
               interpret: bool = False) -> jnp.ndarray:
    """(B, H, W, C) activations entering `start_layer` -> (B, 1024)
    embeddings (gap=True) or the last fused layer's activations
    (gap=False: (B, Ho*Wo, C_out), flattened spatial).

    With stop_layer set, only layers [start_layer, stop_layer) are fused —
    the mid-stack block (e.g. 4..7) uses this to stay inside the ~16 MB
    VMEM budget while the 8..14 block carries its ~10 MB of weights.
    B is padded up to a multiple of block_patches internally; callers get
    exactly B rows back.
    """
    specs = tail_specs(start_layer, stop_layer)
    s0, sl = specs[0], specs[-1]
    b, h, w, c = x.shape
    assert (h, w, c) == (s0.h, s0.w, s0.c_in), \
        f'expected {(s0.h, s0.w, s0.c_in)} input, got {(h, w, c)}'
    pb = block_patches
    b_pad = -(-b // pb) * pb
    x = x.reshape(b, h * w, c)
    if b_pad != b:
        x = jnp.concatenate(
            [x, jnp.zeros((b_pad - b, h * w, c), x.dtype)], axis=0)

    ops = pack_tail_params(params, specs, compute_dtype)
    if gap:
        out_shape = jax.ShapeDtypeStruct((b_pad, sl.c_out), jnp.float32)
        out_spec = pl.BlockSpec((pb, sl.c_out), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)
    else:
        hwo = sl.h_out * sl.w_out
        out_shape = jax.ShapeDtypeStruct((b_pad, hwo, sl.c_out),
                                         jnp.float32)
        out_spec = pl.BlockSpec((pb, hwo, sl.c_out), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)

    kernel = partial(_tail_kernel, specs=specs, pb=pb,
                     compute_dtype=compute_dtype, gap=gap)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // pb,),
        in_specs=[pl.BlockSpec((pb, h * w, c), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops),
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(x, *ops)
    return out[:b]
