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
* stride-2: each tap reads at the OUTPUT grid via four shared parity
  planes built by reshape-split + static index steps (strided slices do
  not compile — see _parity_planes/_tap_read), so tap math runs at 1/4
  size; the all-odd plane (rows (2*ho+1)*W + 2*wo+1) is the center tap —
  SAME padding on even input pads only bottom/right, so parity with the
  XLA/TF conv demands the odd offsets;
* pointwise 1x1: the (Pb*HW, C) collapsed view @ (C, F) on the MXU — at
  the caller's ``precision`` (the product ships HIGH for f32, HIGHEST via
  --strict_f32, DEFAULT under bf16; models/yamnet.py::conv_mxu_precision)
  — Pb is chosen so Pb*HW >= 128 rows even at the 3x2-spatial layers;
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
    """(9, HWo, 1) f32 edge-validity mask per tap: 1 where the tap's shifted
    read stays inside the patch's spatial plane. Static per layer, so it is
    precomputed host-side and folded into the tap weights inside the kernel
    ((HWo,1)x(1,C) broadcast) instead of paying a full-size select per tap.

    For stride-2 layers the masks are evaluated at the OUTPUT grid (input
    positions (2ho+1, 2wo+1) — the odd offsets, see _parity_planes): the
    kernel reads each tap's operand at the output grid BEFORE the
    multiply-add, so the tap math runs at 1/4 size instead of computing
    three quarters of the depthwise output only to discard it."""
    if spec.stride > 1:
        hpos = np.repeat(2 * np.arange(spec.h_out) + 1, spec.w_out)
        wpos = np.tile(2 * np.arange(spec.w_out) + 1, spec.h_out)
    else:
        pos = np.arange(spec.h * spec.w)
        hpos, wpos = pos // spec.w, pos % spec.w
    return np.stack([
        ((hpos + dy >= 0) & (hpos + dy < spec.h)
         & (wpos + dx >= 0) & (wpos + dx < spec.w)).astype(np.float32)
        for dy, dx in TAPS]).reshape(9, spec.h_out * spec.w_out, 1)


def _resolve_precision(precision, compute_dtype):
    """None -> the historical rule (HIGHEST for f32 operands, DEFAULT for
    bf16); resolved ONCE at the pallas_call wrapper so the packers and the
    kernel body always agree on the pw operand layout (hi/lo split vs
    plain cast)."""
    if precision is not None:
        return precision
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(compute_dtype) == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _split_hi_lo(w):
    """f32 -> (2, ...) bf16 hi/lo split: w ~= hi + lo to ~16 mantissa bits.

    The operand form of the MXU's 3-pass HIGH emulation (see _pw_dot):
    same total bytes as the f32 original (2 x bf16), so the kernels'
    VMEM budget is unchanged."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.stack([hi, lo])


def _pw_dot(flat, w_ref, compute_dtype, precision):
    """The pointwise contraction at the requested MXU precision.

    Mosaic's in-kernel dot lowering supports only DEFAULT and HIGHEST
    ("Unsupported dot precision: HIGH", probed 2026-08-20 —
    tools/mosaic_capability_probe.py), so Precision.HIGH is EMULATED:
    the packers ship the weight as a (2, K, F) bf16 hi/lo split
    (w ~= hi + lo), the activation splits on the fly, and the dot runs
    as the same 3 one-pass products XLA's HIGH lowers to —
    hi@hi + hi@lo + lo@hi (the dropped lo@lo term is below f32 rounding).
    3 MXU passes instead of HIGHEST's 6, identical VMEM (2xbf16 = 1xf32).
    """
    dims = (((1,), (0,)), ((), ()))
    if precision == jax.lax.Precision.HIGH:
        a = flat.astype(jnp.float32)
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def one(x, w):
            return jax.lax.dot_general(
                x, w, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
        w_hi, w_lo = w_ref[0], w_ref[1]
        return one(a_hi, w_hi) + one(a_hi, w_lo) + one(a_lo, w_hi)
    return jax.lax.dot_general(
        flat.astype(compute_dtype), w_ref[:], dims,
        preferred_element_type=jnp.float32, precision=precision)


def _pack_pw(pw, compute_dtype, precision):
    """Pointwise weight operand for _pw_dot: hi/lo split under emulated
    HIGH, plain compute-dtype cast otherwise."""
    if precision == jax.lax.Precision.HIGH:
        return _split_hi_lo(pw.astype(jnp.float32))
    return pw.astype(compute_dtype)


def pack_tail_params(params: dict, specs, compute_dtype=jnp.float32,
                     precision=None):
    """Folded yamnet params -> the kernel's flat operand list.

    Per layer: dw taps (9, 1, C) [tap t = kernel[dy, dx, 0, :]], dw bias
    (1, C) f32, tap edge masks (9, H*W, 1) f32, pw kernel (C, F) — or its
    (2, C, F) bf16 hi/lo split under emulated HIGH (_pw_dot) — and pw
    bias (1, F) f32. Only the pointwise kernel is cast to the compute
    dtype (it feeds the MXU dot); dw taps and biases stay f32 for the
    VPU math.
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
            _pack_pw(pw.reshape(s.c_in, s.c_out), compute_dtype, precision),
            jnp.asarray(params[f'{s.name}/pointwise_conv/bias'],
                        jnp.float32).reshape(1, s.c_out),
        ]
    return ops


def front_specs(groups: int = 4, start_layer: int = 2, stop_layer: int = 4):
    """Virtual SepSpecs for the packed front block: ``groups`` patches share
    the lane dim, so every channel count is multiplied by ``groups``.

    The front layers' true channel counts (32/64) fill less than half a
    128-wide lane tile, which is why the plain tail layout LOSES there
    (measured 10.3 vs 8.4 ms embed at pb=2 — the 4x lane padding taxes
    every VPU op, and the padded activations VMEM-OOM above pb=2). Packing
    g=4 patches side by side in the lane dim makes every layer a full
    multiple of 128 lanes while keeping ALL kernel ops identical to the
    proven tail kernel: the depthwise rolls ride the per-patch flattened
    spatial axis (axis 1 — patches never mix), the masks depend only on
    spatial position, and the pointwise contraction becomes block-diagonal
    over groups — which costs NOTHING on the MXU versus the unpacked form,
    because a K=32 dot pays the systolic array's K=128 minimum anyway
    (the block-diagonal form simply spends the padding on real work).
    """
    specs = tail_specs(start_layer, stop_layer)
    return tuple(SepSpec(s.index, s.h, s.w, s.c_in * groups,
                         s.c_out * groups, s.stride) for s in specs)


def front_pw_splits(groups: int, start_layer: int = 2, stop_layer: int = 4):
    """Per-layer number of pointwise sub-dots for the packed front.

    A single block-diagonal ``kron(I_g, W)`` dot is free ONLY while
    g*C <= 128 (the MXU's systolic K minimum — the padding a K=C dot
    would pay anyway is spent on real work). Past that, block-diagonal
    zeros become real MXU passes: layer 3 at g=4, C=64 would contract
    K=256 where K=128 suffices — 2x the pointwise MACs. So each layer
    contracts in ``n = ceil(g*C / 128)`` sub-dots of q=g/n lane groups,
    each a dense-K ``kron(I_q, W)``, concatenated along lanes (probed)."""
    splits = []
    for s in tail_specs(start_layer, stop_layer):
        q = max(1, min(groups, 128 // s.c_in))
        if groups % q:
            raise ValueError(f'groups={groups} not divisible by q={q} '
                             f'at layer {s.index}')
        splits.append(groups // q)
    return tuple(splits)


def pack_front_params(params: dict, groups: int, compute_dtype=jnp.float32,
                      start_layer: int = 2, stop_layer: int = 4,
                      precision=None):
    """Folded yamnet params -> packed-front operand list.

    Same five operands per layer as ``pack_tail_params``, built for the
    packed layout: depthwise taps and biases tile ``groups`` times along
    lanes (each patch's channels see the same per-channel tap weights);
    the pointwise kernel becomes block-diagonal ``kron(I_q, W)`` over the
    q groups of one sub-dot (front_pw_splits) so each lane group
    contracts only its own patch's channels.
    """
    ops = []
    splits = front_pw_splits(groups, start_layer, stop_layer)
    for s, n in zip(tail_specs(start_layer, stop_layer), splits):
        dw = jnp.asarray(params[f'{s.name}/depthwise_conv/kernel'])
        pw = jnp.asarray(params[f'{s.name}/pointwise_conv/kernel'])
        eye = jnp.eye(groups // n, dtype=jnp.float32)
        ops += [
            jnp.tile(dw.reshape(9, 1, s.c_in).astype(jnp.float32),
                     (1, 1, groups)),
            jnp.tile(jnp.asarray(params[f'{s.name}/depthwise_conv/bias'],
                                 jnp.float32).reshape(1, s.c_in),
                     (1, groups)),
            jnp.asarray(_tap_masks(s)),
            _pack_pw(jnp.kron(eye, pw.reshape(s.c_in, s.c_out)
                              .astype(jnp.float32)),
                     compute_dtype, precision),
            jnp.tile(jnp.asarray(params[f'{s.name}/pointwise_conv/bias'],
                                 jnp.float32).reshape(1, s.c_out),
                     (1, groups)),
        ]
    return ops


def _parity_planes(x, spec: SepSpec, pb: int):
    """(Pb, H*W, C) -> {(ph, pw): (Pb, Ho*Wo, C)}: the four stride-2
    parity subsamples, each flattened on the output grid.

    SAME padding for a 3x3 stride-2 conv on even input pads only the
    bottom/right (pad_total=1), so output (ho, wo) is the stride-1
    centered conv evaluated at (2ho+1, 2wo+1) — the ODD positions, plane
    (1, 1). Strided slices don't compile on this toolchain
    (tools/mosaic_capability_probe.py), but splitting a dim in two and
    statically indexing one half does — each plane is two probed-PASS
    split+index steps (H, then W).

    Built ONCE per stride-2 layer and shared by all 9 taps: tap (dy, dx)
    reads input rows (2ho+1+dy, 2wo+1+dx), which is parity plane
    ((1+dy)%2, (1+dx)%2) realigned by a quarter-size sublane roll for the
    +1 offsets (_tap_read). The naive alternatives both lose: a full
    depthwise output subsampled at the end wastes 3/4 of the tap VPU work,
    and per-tap full-size rolls keep full-size copies live on Mosaic's
    kernel stack (a measured 17.3 MB scoped-vmem OOM at pbi=1)."""
    c = x.shape[-1]
    planes = {}
    for ph in (0, 1):
        y = x.reshape(pb, spec.h // 2, 2, spec.w, c)[:, :, ph]
        y = y.reshape(pb, spec.h // 2, spec.w // 2, 2, c)
        for pw_ in (0, 1):
            planes[(ph, pw_)] = y[:, :, :, pw_].reshape(
                pb, spec.h_out * spec.w_out, c)
    return planes


def _tap_read(planes, spec: SepSpec, dy: int, dx: int):
    """The stride-2 tap operand at the output grid: parity plane +
    quarter-size realign roll. Edge wrap garbage is zeroed by the
    output-grid masks (_tap_masks)."""
    y = planes[((1 + dy) % 2, (1 + dx) % 2)]
    hwo = spec.h_out * spec.w_out
    shift = (dy == 1) * spec.w_out + (dx == 1)
    if shift:
        y = pltpu.roll(y, (-shift) % hwo, 1)
    return y


def _unpack_lanes(x, pb, groups):
    """(Pb, HW, g*C) packed -> (Pb*g, HW, C) per-patch rows.

    Lane-tile split (minor stays a 128 multiple), non-minor swap, leading
    merge — all probed PASS on this toolchain (swap_then_merge). Doing
    this INSIDE the kernel is the point: outside, XLA charges a measured
    ~0.63 ms relayout for the same unpack at B=1000."""
    hw, c = x.shape[1], x.shape[2] // groups
    y = x.reshape(pb, hw, groups, c)
    return jnp.swapaxes(y, 1, 2).reshape(pb * groups, hw, c)


def _tail_kernel(*refs, specs, pb, compute_dtype, gap, unpack=None,
                 pw_splits=None, unpack_after=None, precision=None):
    """refs = [x_ref, (dw, dw_b, masks, pw, pw_b) * len(specs), out_ref].

    Activations stay float32 on the VPU side regardless of compute_dtype:
    Mosaic's dynamic_rotate only handles 32-bit vectors ("Rotate with
    non-32-bit data" compile error on bf16), and the depthwise taps
    accumulate in f32 anyway. compute_dtype only selects the MXU dot
    operands' dtype; ``precision`` their MXU emulation depth (None keeps
    the historical rule: HIGHEST for f32 operands, DEFAULT for bf16 —
    the product threads HIGH here via models/yamnet.py::embed).

    With ``unpack_after=i`` the first i+1 specs run in the packed-lane
    layout (``unpack`` patches per row, virtual channel counts); the
    activations are then un-interleaved in VMEM and the remaining specs
    run per-patch — fusing the packed front into the plain mid-stack
    without the layer-boundary HBM round trip. With ``unpack_after=None``
    and ``unpack`` set, the un-interleave instead happens at the output
    write (a front-only kernel).
    """
    x_ref, out_ref = refs[0], refs[-1]
    if precision is None:
        precision = (jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    x = x_ref[:].astype(jnp.float32)
    pb_now = pb

    for li, spec in enumerate(specs):
        dw_ref, dwb_ref, mask_ref, pw_ref, pwb_ref = \
            refs[1 + 5 * li: 6 + 5 * li]
        hw = spec.h * spec.w

        # stride-2 layers read each tap at the OUTPUT grid via the four
        # shared parity planes (_parity_planes + _tap_read; masks are
        # precomputed at the output grid) so the tap math runs at 1/4
        # size — the naive full-resolution depthwise-then-subsample both
        # wastes 3/4 of the tap VPU work and OOMs Mosaic's scoped vmem
        # with full-size rolled temporaries.
        planes = (_parity_planes(x, spec, pb_now)
                  if spec.stride > 1 else None)
        # center tap: valid everywhere, zero shift — it seeds the
        # accumulator, saving a zeros-init add and a mask multiply
        if planes is not None:
            acc = planes[(1, 1)] * dw_ref[CENTER]
        else:
            acc = x * dw_ref[CENTER]
        for t, (dy, dx) in enumerate(TAPS):
            if t == CENTER:
                continue
            if planes is not None:
                shifted = _tap_read(planes, spec, dy, dx)
            else:
                # circular roll bringing x[pos + shift] to pos (shift may
                # be negative; pltpu.roll wants a non-negative amount, so
                # wrap); wrapped-in garbage is zeroed by the masked weights
                shift = (-(dy * spec.w + dx)) % hw
                shifted = pltpu.roll(x, shift, 1)
            acc = acc + shifted * (mask_ref[t] * dw_ref[t])
        y = jax.nn.relu(acc + dwb_ref[:])

        hwo = spec.h_out * spec.w_out
        n = pw_splits[li] if pw_splits is not None else 1
        if n == 1:
            flat = y.reshape(pb_now * hwo, spec.c_in)
            z = _pw_dot(flat, pw_ref, compute_dtype, precision)
        else:
            # packed front past g*C=128: contract in n dense-K sub-dots
            # over lane-tile slices instead of one block-diagonal dot
            # whose zero blocks would be real MXU passes (front_pw_splits)
            kq = spec.c_in // n
            y4 = y.reshape(pb_now, hwo, n, kq)
            zs = [_pw_dot(y4[:, :, i, :].reshape(pb_now * hwo, kq),
                          pw_ref, compute_dtype, precision)
                  for i in range(n)]
            z = jnp.concatenate(zs, axis=-1)
        x = jax.nn.relu(z.reshape(pb_now, hwo, spec.c_out) + pwb_ref[:])

        if unpack_after is not None and li == unpack_after:
            x = _unpack_lanes(x, pb_now, unpack)
            pb_now = pb_now * unpack

    if gap:
        out_ref[:] = jnp.mean(x.astype(jnp.float32), axis=1)
    elif unpack and unpack_after is None:
        # front-only kernel: un-interleave at the output write
        out_ref[:] = _unpack_lanes(x.astype(jnp.float32), pb_now, unpack)
    else:
        out_ref[:] = x.astype(jnp.float32)


def fused_front(params: dict, x: jnp.ndarray, *, groups: int = 4,
                block_packed: int = 2, compute_dtype=jnp.float32,
                start_layer: int = 2, stop_layer: int = 4,
                unpack: bool = True, plain_through: int = None,
                interpret: bool = False, precision=None) -> jnp.ndarray:
    """Packed layer-1 activations through the fused front, one kernel.

    ``x``: (Bo, 48, 32, groups*32) — ``groups`` patches' layer-1 outputs
    packed along the channel/lane dim (models/yamnet.py::packed_l1).
    Returns (Bo*groups, 24*16, 128) per-patch activations entering layer 4
    (flattened spatial; the un-interleave happens INSIDE the kernel, where
    it is a probed lane-tile split + swap — outside, XLA charges a
    measured ~0.63 ms relayout for the same unpack at B=1000).

    With ``plain_through`` set (e.g. 8), the SAME kernel continues past
    the packed layers: un-interleave in VMEM after ``stop_layer - 1``,
    then plain per-patch layers ``stop_layer..plain_through-1`` — the
    fuse_mid variant, which skips the packed block's output round trip
    (2 x 196 MB at B=1000) at the cost of a bigger kernel. The shipped
    default (best measured: full classify graph 1.013x/1.025x across two
    long-run sessions, docs/tuning.md round-4 front-block ceiling).
    Returns (Bo*groups, Ho*Wo, C) entering ``plain_through``.

    Design (reference parity: embedders/yamnet/yamnet.py:77-106, layers
    2-3): identical op set to the tail kernel — the packing makes layers
    2-3 full-lane (see ``front_specs``) where the plain layout measured
    SLOWER than XLA. Parity to f32 rounding vs the XLA path
    (tests/test_pallas_conv.py).
    """
    fspecs = front_specs(groups, start_layer, stop_layer)
    pspecs = (tail_specs(stop_layer, plain_through)
              if plain_through is not None else ())
    if pspecs and not unpack:
        raise ValueError('plain_through requires unpack=True (the plain '
                         'layers run per-patch)')
    specs = fspecs + pspecs
    s0, sl = fspecs[0], specs[-1]
    bo, h, w, c = x.shape
    assert (h, w, c) == (s0.h, s0.w, s0.c_in), \
        f'expected {(s0.h, s0.w, s0.c_in)} packed input, got {(h, w, c)}'
    precision = _resolve_precision(precision, compute_dtype)
    pbi = block_packed
    bo_pad = -(-bo // pbi) * pbi
    x = x.reshape(bo, h * w, c)
    if bo_pad != bo:
        x = jnp.concatenate(
            [x, jnp.zeros((bo_pad - bo, h * w, c), x.dtype)], axis=0)

    ops = pack_front_params(params, groups, compute_dtype,
                            start_layer, stop_layer, precision) \
        + (pack_tail_params(params, pspecs, compute_dtype, precision)
           if pspecs else [])
    pw_splits = (front_pw_splits(groups, start_layer, stop_layer)
                 + (1,) * len(pspecs))
    hwo = sl.h_out * sl.w_out
    c_out = (sl.c_out if pspecs or not unpack
             else sl.c_out // groups)
    rows_out = pbi * groups if unpack else pbi
    kernel = partial(_tail_kernel, specs=specs, pb=pbi,
                     compute_dtype=compute_dtype, gap=False,
                     unpack=groups if unpack else None,
                     pw_splits=pw_splits,
                     unpack_after=len(fspecs) - 1 if pspecs else None,
                     precision=precision)
    out = pl.pallas_call(
        kernel,
        grid=(bo_pad // pbi,),
        in_specs=[pl.BlockSpec((pbi, h * w, c), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ops),
        out_specs=pl.BlockSpec((rows_out, hwo, c_out),
                               lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (bo_pad * (groups if unpack else 1), hwo, c_out),
            jnp.float32),
        interpret=interpret,
    )(x, *ops)
    return out[:bo * groups] if unpack else out[:bo]


def fused_tail(params: dict, x: jnp.ndarray, *, start_layer: int = 8,
               stop_layer: int = None, block_patches: int = 32,
               compute_dtype=jnp.float32, gap: bool = True,
               interpret: bool = False, precision=None) -> jnp.ndarray:
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
    precision = _resolve_precision(precision, compute_dtype)
    pb = block_patches
    b_pad = -(-b // pb) * pb
    x = x.reshape(b, h * w, c)
    if b_pad != b:
        x = jnp.concatenate(
            [x, jnp.zeros((b_pad - b, h * w, c), x.dtype)], axis=0)

    ops = pack_tail_params(params, specs, compute_dtype, precision)
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
                     compute_dtype=compute_dtype, gap=gap,
                     precision=precision)
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
