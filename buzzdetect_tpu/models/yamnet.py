"""YAMNet (MobileNet-v1 audio embedder) as a functional JAX model.

Architecture parity with the published YAMNet used by the reference
(`embedders/yamnet/yamnet.py:77-106`): a 3x3/stride-2 full conv to 32
channels, followed by 13 depthwise-separable blocks up to 1024 channels, each
conv followed by BatchNorm (center=True, scale=False, eps=1e-4) and ReLU,
ending in global average pooling to a 1024-d embedding per patch.

TPU-first design:
* pure functions over an explicit parameter pytree — jit/vmap/pjit compose
  directly; no framework objects;
* NHWC layout with ``lax.conv_general_dilated`` (XLA's native TPU conv path);
* inference uses *BatchNorm-folded* weights (fold happens once at load time),
  so each block is conv + bias + ReLU — maximum fusion, no extra HBM traffic;
* optional bfloat16 compute (f32 accumulation) for throughput; float32 is the
  default to honor the 1e-3 parity budget;
* optional channel sharding annotations for tensor parallelism live in
  ``buzzdetect_tpu.parallel`` — the model itself stays sharding-agnostic.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (kind, stride, output_filters); every kernel is 3x3.
LAYER_DEFS = (
    ('conv', 2, 32),
    ('sep', 1, 64),
    ('sep', 2, 128),
    ('sep', 1, 128),
    ('sep', 2, 256),
    ('sep', 1, 256),
    ('sep', 2, 512),
    ('sep', 1, 512),
    ('sep', 1, 512),
    ('sep', 1, 512),
    ('sep', 1, 512),
    ('sep', 1, 512),
    ('sep', 2, 1024),
    ('sep', 1, 1024),
)

N_EMBEDDINGS = 1024
BN_EPSILON = 1e-4


# --- parameter construction --------------------------------------------------

def _conv_shapes():
    """Yield (name, kind, stride, kernel_shape) for every conv in the net.

    Kernel shapes are HWIO; depthwise kernels are (3, 3, 1, C) with
    feature_group_count = C.
    """
    in_ch = 1
    for i, (kind, stride, filters) in enumerate(LAYER_DEFS):
        name = f'layer{i + 1}'
        if kind == 'conv':
            yield f'{name}/conv', 'full', stride, (3, 3, in_ch, filters)
        else:
            yield f'{name}/depthwise_conv', 'depthwise', stride, (3, 3, 1, in_ch)
            yield f'{name}/pointwise_conv', 'full', 1, (1, 1, in_ch, filters)
        in_ch = filters


def init_raw_params(seed: int = 0):
    """Deterministic raw (unfolded) parameters: truncated-normal kernels,
    fresh BatchNorm statistics. Used when no pretrained checkpoint is
    installed and as the starting point for training."""
    rng = np.random.default_rng(seed)
    params = {}
    for key, kind, _stride, shape in _conv_shapes():
        fan_in = shape[0] * shape[1] * (shape[2] if kind == 'full' else 1)
        std = float(np.sqrt(2.0 / fan_in))
        k = rng.standard_normal(shape).astype(np.float32) * std
        np.clip(k, -2 * std, 2 * std, out=k)
        ch = shape[3]
        params[f'{key}/kernel'] = k
        params[f'{key}/bn_beta'] = np.zeros(ch, np.float32)
        params[f'{key}/bn_mean'] = np.zeros(ch, np.float32)
        params[f'{key}/bn_var'] = np.ones(ch, np.float32)
    return params


def fold_batchnorm(raw: dict) -> dict:
    """Fold BatchNorm (center only, no scale) into conv kernel + bias:

        y = (conv(x) - mean) / sqrt(var + eps) + beta
          = conv(x) * s + (beta - mean * s),   s = 1/sqrt(var + eps)

    Returns the inference parameter pytree {conv: {kernel, bias}}.
    """
    folded = {}
    for key, kind, _stride, _shape in _conv_shapes():
        kernel = np.asarray(raw[f'{key}/kernel'], np.float32)
        beta = np.asarray(raw[f'{key}/bn_beta'], np.float32)
        mean = np.asarray(raw[f'{key}/bn_mean'], np.float32)
        var = np.asarray(raw[f'{key}/bn_var'], np.float32)
        scale = 1.0 / np.sqrt(var + BN_EPSILON)
        folded[f'{key}/kernel'] = kernel * scale  # broadcast over last axis
        folded[f'{key}/bias'] = beta - mean * scale
    return folded


# --- forward pass -------------------------------------------------------------

def conv_mxu_precision(compute_dtype, conv_precision: str):
    """MXU precision for the conv stack's dots, from the product knob.

    f32 operands: an unqualified dot runs the MXU in bf16-operand mode
    (~3 lost decimal digits — far outside the 1e-3 TF-parity budget), so
    f32 always gets a multi-pass emulation: ``'highest'`` = 6-pass exact
    f32 (the oracle; the fused-pallas default) or ``'high'`` = 3-pass
    bf16-operand-split (the XLA-conv-path default: measured 1.166x on the
    classify graph at 7.3-8.5e-4 real-bundle score deviation — inside the
    1e-3 TF-parity budget; docs/tuning.md "round-5 conv precision").
    bf16 compute always runs DEFAULT (1-pass; the operands are already
    bf16, emulation adds nothing).
    """
    # validate BEFORE the dtype short-circuit: a typo'd knob must fail
    # loudly on the bf16 path too, not only when f32 happens to run
    if conv_precision not in ('high', 'highest'):
        raise ValueError(
            f"conv_precision must be 'high' or 'highest', "
            f"got {conv_precision!r}")
    if jnp.dtype(compute_dtype) != jnp.float32:
        return jax.lax.Precision.DEFAULT
    return (jax.lax.Precision.HIGHEST if conv_precision == 'highest'
            else jax.lax.Precision.HIGH)


def _conv2d(x, kernel, stride, *, depthwise=False,
            precision=jax.lax.Precision.HIGHEST):
    groups = kernel.shape[3] if depthwise else 1
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# fused Pallas blocks when conv='pallas': (start_layer, stop_layer, patches
# per kernel block). Layers 8-14 are where XLA runs 4.5-5.4x off the
# roofline floor (sublane-starved (3,2) and (6,4) spatial tiles + per-layer
# HBM round trips); layers 4-7 sit at the *unfused* HBM wall, which a
# VMEM-resident block lowers by deleting the inter-layer round trips.
# Two blocks instead of one because VMEM is ~16 MB: the 8..14 block already
# holds ~10 MB of f32 weights, and the 4..7 block's activations are 4x
# larger per patch (pb=16 there is a measured Mosaic scoped-vmem OOM at
# 20.9 MB). Block sizes keep every pointwise dot >= 128 MXU rows (32*6=192
# at the 3x2-spatial layers; 8*96=768 at layer 5). Measured on v5e f32,
# 1000-patch chunks, interleaved slopes (tools/pallas_conv_tpu_probe.py
# --variants): embed 12.84 ms all-XLA, 9.87 ms tail-only, 9.35 ms with
# both blocks (1.37x). With PALLAS_FRONT (below) active, layers 2-3
# run lane-packed in the same kernel as 4-7, so only the (8, None)
# block here remains separate; without it, layers 1-3 stay XLA (C<=64
# pads to <1/2 lane occupancy in VMEM, and the 9-tap VPU cost on padded
# lanes would exceed the HBM traffic the fusion saves).
PALLAS_BLOCKS = ((4, 8, 8), (8, None, 32))
PALLAS_TAIL_START = PALLAS_BLOCKS[0][0]  # first layer the blocks cover

# Fused packed front block (ops/pallas_conv.py::fused_front): layers 2-3
# with `groups` patches packed along the lane dim (full 128-lane occupancy
# at the front's 32/64 channel counts), layer 1 as an XLA grouped conv
# over the packed batch; fuse_mid continues the same kernel through
# layers 4-7 after an in-VMEM un-interleave. SHIPS as a small, stable
# win: +3.9% whole-embed / +1.0-2.5% full classify graph, measured with
# the round-4 long-run wall method (two 8-round sessions; the
# dispatch-slope method's ±15% noise floor scattered this same effect
# across 0.97x-1.29x — docs/tuning.md "round-4 front-block ceiling").
# This is FAR below the 1.15x the round-3 verdict targeted, and the
# measurements show why no front kernel can reach it at f32 parity: the
# front is compute/precision-bound, not layout/bandwidth-bound like the
# tail — its pointwise dots have a ~1.5 ms MXU floor at HIGHEST (0.99 ms
# measured for the layer-2 dot alone as a bare XLA matmul) and the
# 27-op masked 9-tap depthwise runs at ~1.3 vreg-ops/cycle on this
# Mosaic toolchain (~1.4-2 ms), so fused compute alone nearly matches
# XLA's entire 3.5 ms front cost; fusion only recovers the margins.
# Parity is exact to f32 rounding (tests/test_pallas_conv.py); a compile
# failure on a future toolchain degrades to all-XLA via conv-auto's
# fallback rather than failing the run. Override without code edits via
# BUZZDETECT_PALLAS_FRONT ('g:pbi', 'g:pbi:mid', or 'off').
PALLAS_FRONT = dict(groups=4, block_packed=1, fuse_mid=True)


def _front_from_env(default):
    """BUZZDETECT_PALLAS_FRONT='g:pbi[:mid]' -> a PALLAS_FRONT config;
    'off' -> disabled (all-XLA layers 1-3); unset/blank -> ``default``.
    Malformed values fail loudly — a typo silently falling back would
    un-apply the operator's requested experiment with no sign anything
    was ignored."""
    import os
    spec = os.environ.get('BUZZDETECT_PALLAS_FRONT', '').strip()
    if not spec:
        return default
    if spec.lower() in ('off', 'none', '0'):
        return None
    parts = spec.split(':')
    try:
        cfg = dict(groups=int(parts[0]), block_packed=int(parts[1]))
    except (IndexError, ValueError):
        raise ValueError(
            f"BUZZDETECT_PALLAS_FRONT must be 'g:pbi' or 'g:pbi:mid' "
            f"(e.g. '4:1'); got {spec!r}") from None
    if len(parts) > 3 or (len(parts) == 3 and parts[2] != 'mid'):
        raise ValueError(
            f"BUZZDETECT_PALLAS_FRONT third field must be 'mid'; "
            f"got {spec!r}")
    if len(parts) == 3:
        cfg['fuse_mid'] = True
    return cfg


_FRONT_ENV_APPLIED = False


def resolve_front():
    """Apply the BUZZDETECT_PALLAS_FRONT env override LAZILY — at the first
    pallas-conv model build, not at module import. A malformed knob used to
    raise during import, which took down every entry point including
    ``doctor`` (the tool you'd use to diagnose it) with a bare traceback;
    now import always succeeds and the loud failure happens at model init,
    where the classifier can surface the message. The parsed override is
    written back into ``PALLAS_FRONT`` once; later direct assignment
    (tools/pallas_conv_tpu_probe.py patches it per variant) still wins."""
    global PALLAS_FRONT, _FRONT_ENV_APPLIED
    if not _FRONT_ENV_APPLIED:
        PALLAS_FRONT = _front_from_env(PALLAS_FRONT)
        _FRONT_ENV_APPLIED = True
    return PALLAS_FRONT


def packed_l1(params, x, groups: int, compute_dtype=jnp.float32,
              precision=None):
    """Patches (B, 96, 64, 1) -> packed layer-1 activations
    (ceil(B/groups), 48, 32, groups*32).

    The pack transpose happens at PATCH granularity — 25 KB/patch, the
    smallest point in the whole stack (measured 0.15 ms at B=1000; the
    same transpose on layer-2 activations would cost ~8x that) — and
    layer 1 runs as ONE grouped conv over the packed batch, each lane
    group convolving its own patch (feature_group_count=groups).
    """
    b = x.shape[0]
    bo = -(-b // groups)
    if bo * groups != b:
        x = jnp.concatenate(
            [x, jnp.zeros((bo * groups - b, *x.shape[1:]), x.dtype)], axis=0)
    xp = x[..., 0].reshape(bo, groups, 96, 64).transpose(0, 2, 3, 1)
    kernel = jnp.tile(params['layer1/conv/kernel'].astype(compute_dtype),
                      (1, 1, 1, groups))
    bias = jnp.tile(params['layer1/conv/bias'].astype(jnp.float32), (groups,))
    if precision is None:
        # keyed off COMPUTE_DTYPE, not xp.dtype: raw patches are always
        # f32, so an xp.dtype key would run layer 1 at HIGHEST with a
        # bf16 kernel — inconsistent with the tail kernel's DEFAULT
        # precision under bf16 compute
        precision = conv_mxu_precision(compute_dtype, 'highest')
    y = jax.lax.conv_general_dilated(
        xp, kernel, window_strides=(2, 2), padding='SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=groups,
        preferred_element_type=jnp.float32, precision=precision)
    return jax.nn.relu(y + bias).astype(compute_dtype)


def _pallas_embed(params, x, compute_dtype, blocks, precision=None):
    """Run the fused-block sequence; x enters blocks[0][0] in NHWC."""
    # lazy import: ops.pallas_conv imports LAYER_DEFS from this module
    from buzzdetect_tpu.ops.pallas_conv import fused_tail, tail_specs
    for bi, (start, stop, pb) in enumerate(blocks):
        last = bi == len(blocks) - 1
        x = fused_tail(params, x, start_layer=start, stop_layer=stop,
                       block_patches=pb, compute_dtype=compute_dtype,
                       gap=last, precision=precision)
        if not last:
            s = tail_specs(start, stop)[-1]
            x = x.reshape(x.shape[0], s.h_out, s.w_out, s.c_out)
    return x


def embed(params: dict, patches: jnp.ndarray,
          compute_dtype=jnp.float32, conv: str = 'xla',
          conv_precision: str = 'highest') -> jnp.ndarray:
    """Log-mel patches -> embeddings.

    ``patches``: (B, 96, 64) or (B, 96, 64, 1) float32.
    Returns (B, 1024) float32 embeddings (pre-head, post-GAP).

    ``conv='pallas'`` runs layers 4-7 and 8-14+pooling as two fused Pallas
    kernels (ops/pallas_conv.py, PALLAS_BLOCKS; TPU or interpret mode only)
    — measured 1.37x on the whole embed at f32-rounding parity on a v5e.
    'xla' is the portable path.

    ``conv_precision`` ('highest'|'high', f32 only — see
    ``conv_mxu_precision``) selects the MXU emulation depth for the conv
    and pointwise dots. The OP-LEVEL default stays 'highest' (exact-f32
    oracle; kernel-parity tests rely on it); the PRODUCT resolution lives
    in ChunkClassifier: 'high' for the XLA conv path (measured 1.166x at
    7.3-8.5e-4 real-bundle score deviation — inside the 1e-3 budget) but
    'highest' for the pallas path, where Mosaic refuses native HIGH and
    the in-kernel 3-pass EMULATION (ops/pallas_conv.py::_pw_dot) measures
    1.128-1.167x at ~1e-2 real-bundle deviation — the emulation's MATH is
    near-exact (interpret-mode parity 2.5e-6; the tests pin it), but the
    compiled MXU's accumulation-order seeds get amplified by relu gating
    through the stack (docs/tuning.md "Round-5 conv precision" has the
    localization A/B). Explicit conv='pallas' + 'high' still runs the
    emulated kernels, for study and future toolchains.
    """
    precision = conv_mxu_precision(compute_dtype, conv_precision)
    x = patches.astype(compute_dtype)
    if x.ndim == 3:
        x = x[..., None]

    front = resolve_front() if conv == 'pallas' else None
    if conv == 'pallas' and front is not None:
        # packed front path: XLA does only the pack + grouped layer 1;
        # layers 2-3 run packed in a fused kernel — with fuse_mid, the
        # SAME kernel continues through layers 4-7 after an in-VMEM
        # un-interleave, deleting the layer-3/4 HBM round trip
        from buzzdetect_tpu.ops.pallas_conv import fused_front, tail_specs
        b = x.shape[0]
        g = front['groups']
        xp = packed_l1(params, x, g, compute_dtype, precision=precision)
        if front.get('fuse_mid'):
            stop = PALLAS_BLOCKS[-1][0]  # the final block's start layer
            y = fused_front(params, xp, groups=g,
                            block_packed=front['block_packed'],
                            plain_through=stop,
                            compute_dtype=compute_dtype,
                            precision=precision)[:b]
            s = tail_specs(4, stop)[-1]
            blocks = tuple(bl for bl in PALLAS_BLOCKS if bl[0] >= stop)
        else:
            y = fused_front(params, xp, groups=g,
                            block_packed=front['block_packed'],
                            compute_dtype=compute_dtype,
                            precision=precision)[:b]
            s = tail_specs(2, 4)[-1]
            blocks = PALLAS_BLOCKS
        y = y.reshape(b, s.h_out, s.w_out, s.c_out)
        return _pallas_embed(params, y, compute_dtype, blocks, precision)

    stop = PALLAS_BLOCKS[0][0] if conv == 'pallas' else len(LAYER_DEFS) + 1
    for key, kind, stride, _shape in _conv_shapes():
        if int(key.split('/')[0][len('layer'):]) >= stop:
            break
        kernel = params[f'{key}/kernel'].astype(compute_dtype)
        bias = params[f'{key}/bias'].astype(jnp.float32)
        x = _conv2d(x, kernel, stride, depthwise=(kind == 'depthwise'),
                    precision=precision)
        x = jax.nn.relu(x.astype(jnp.float32) + bias).astype(compute_dtype)

    if conv == 'pallas':
        return _pallas_embed(params, x, compute_dtype, PALLAS_BLOCKS,
                             precision)

    # global average pool over the spatial axes -> (B, 1024)
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def embed_train(raw_params: dict, patches: jnp.ndarray, *,
                momentum: float = 0.99):
    """Training-mode forward pass with live BatchNorm.

    Returns (embeddings, new_raw_params) where the BN running statistics have
    been updated with this batch (exponential moving average).
    """
    x = patches.astype(jnp.float32)
    if x.ndim == 3:
        x = x[..., None]

    new_params = dict(raw_params)
    for key, kind, stride, _shape in _conv_shapes():
        kernel = raw_params[f'{key}/kernel']
        x = _conv2d(x, kernel, stride, depthwise=(kind == 'depthwise'))
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        beta = raw_params[f'{key}/bn_beta']
        x = (x - mean) * jax.lax.rsqrt(var + BN_EPSILON) + beta
        x = jax.nn.relu(x)
        new_params[f'{key}/bn_mean'] = (momentum * raw_params[f'{key}/bn_mean']
                                        + (1 - momentum) * mean)
        new_params[f'{key}/bn_var'] = (momentum * raw_params[f'{key}/bn_var']
                                       + (1 - momentum) * var)

    return jnp.mean(x, axis=(1, 2)), new_params


@partial(jax.jit, static_argnames=('compute_dtype', 'conv', 'conv_precision'))
def embed_jit(params, patches, compute_dtype=jnp.float32, conv='xla',
              conv_precision='highest'):
    return embed(params, patches, compute_dtype, conv, conv_precision)
