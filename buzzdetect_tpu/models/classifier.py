"""The end-to-end chunk classifier: one jit graph from waveform to scores.

This is the device-side heart of the framework: for a 16 kHz mono chunk it
runs pad -> log-mel patches -> MobileNet embed -> dense head as a single
XLA-compiled program (reference equivalent: the TFSMLayer call chain at
`models/model_general_v3/model.py:18-30`, rebuilt as one fused graph).

Shape discipline (TPU requirement): XLA compiles per input shape. Chunk
lengths are uniform for full chunks but ragged for file tails and resume
gaps, so the classifier pads each waveform up to a cached *compiled length*
(smallest already-compiled length that fits, else compile exactly) and
discards the patch rows beyond the chunk's true patch count. Zero-padding is
semantically identical to the reference's pad_waveform, so discarded rows are
the only difference. In steady state every full chunk reuses one compiled
program and ragged tails pad up into it.
"""

import threading
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from buzzdetect_tpu.ops.frontend import (
    FrontendConfig, padded_length, num_patches, log_mel_patches,
    log_mel_spectrogram, patches_from_log_mel)
from buzzdetect_tpu.models import yamnet as yamnet_lib
from buzzdetect_tpu.models.heads import apply_head
from buzzdetect_tpu.utils import encode_mulaw, quantize_int16

_LN256 = float(np.log(256.0))


def _to_float(waveform):
    """Undo the wire format on-device (see transfer_dtype): int16 is linear
    PCM; int8 is continuous mu-law (mu=255, utils.encode_mulaw) — expanded
    with one expm1, fused by XLA into the frontend's first pass."""
    if waveform.dtype == jnp.int16:
        return waveform.astype(jnp.float32) * (1.0 / 32768.0)
    if waveform.dtype == jnp.int8:
        y = waveform.astype(jnp.float32) * (1.0 / 127.0)
        mag = jnp.expm1(jnp.abs(y) * np.log(256.0)) * (1.0 / 255.0)
        return jnp.sign(y) * mag
    return waveform


def _shard_patches(patches, mesh):
    """Shard the (leading) patch axis over the mesh's 'data' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.lax.with_sharding_constraint(
        patches, NamedSharding(mesh, P('data', None, None)))


def _honor_platform_env():
    """Make JAX_PLATFORMS authoritative: some preinstalled platform plugins
    prepend themselves to the platform list, silently overriding the user's
    env var. If the env names a platform and no backend is up yet, pin it."""
    import os
    want = os.environ.get('JAX_PLATFORMS', '').strip()
    if want and (jax.config.jax_platforms or '') != want:
        try:
            jax.config.update('jax_platforms', want)
        except Exception:
            pass  # backend already initialized; leave it be


_honor_platform_env()


def _host_cache_key():
    """Cache-partition key for this host's microarchitecture.

    XLA:CPU AOT executables bake in the compile host's CPU features; loading
    an entry compiled on a different microarchitecture emits cpu_aot_loader
    feature-mismatch errors and can SIGILL (observed when ~/.cache rides a
    volume that moves between machines). TPU executables don't have this
    hazard, but partitioning the whole cache by host is cheap (one recompile
    per new host) and keeps the CPU entries safe.
    """
    import hashlib
    import platform as _platform
    feats = _platform.machine()
    try:
        with open('/proc/cpuinfo') as f:
            for line in f:
                if line.startswith(('flags', 'Features')):
                    feats = ' '.join(sorted(line.split(':', 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(
        f'{jax.__version__}|{feats}'.encode()).hexdigest()[:12]


def _enable_compilation_cache():
    """Persistent XLA compilation cache: first-compile of the fused graph can
    take tens of seconds on TPU; cache it across processes. Partitioned per
    host microarchitecture (see _host_cache_key)."""
    import os
    if jax.config.jax_compilation_cache_dir is None:
        base = os.environ.get(
            'BUZZDETECT_XLA_CACHE',
            os.path.join(os.path.expanduser('~'), '.cache',
                         'buzzdetect_tpu', 'xla'))
        try:
            cache = os.path.join(base, _host_cache_key())
            os.makedirs(cache, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache)
            jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        except Exception:
            pass  # cache is an optimization, never a requirement


_enable_compilation_cache()


def _frontend_patches(waveform, cfg, frontend: str):
    """waveform -> log-mel patches via the selected frontend implementation:
    'xla' (default) or 'pallas' (the fused kernel in ops/pallas_frontend)."""
    if frontend == 'pallas':
        from buzzdetect_tpu.ops.pallas_frontend import log_mel_spectrogram_pallas
        return patches_from_log_mel(
            log_mel_spectrogram_pallas(waveform, cfg), cfg)
    return log_mel_patches(waveform, cfg)


def _frontend_patches_batch(wavs, cfg, frontend: str):
    """(B, L) waveforms -> (B, P, 96, 64) patches via the selected frontend.
    The pallas kernel is 1-D; B is static under jit, so stacking B kernel
    instances compiles cleanly (B = batch_chunks, single digits)."""
    if frontend == 'pallas':
        from buzzdetect_tpu.ops.pallas_frontend import log_mel_spectrogram_pallas
        log_mel = jnp.stack([log_mel_spectrogram_pallas(wavs[i], cfg)
                             for i in range(wavs.shape[0])])
        return patches_from_log_mel(log_mel, cfg)
    return log_mel_patches(wavs, cfg)


def _resample_in_graph(wav, cfg, resample_from, resample_to, valid_len):
    """Rational-resample the float waveform to the model rate INSIDE the jit
    graph (ops/resample.py: polyphase-as-one-strided-conv, MXU-friendly),
    then fix the static output length to ``resample_to`` (the model-rate
    padded target the shape-bucketing planned for).

    ``valid_len`` (traced scalar, or (B,1) for batches — no recompile per
    chunk length) is the chunk's true model-rate sample count: samples past
    it are forced to exact zero, matching the host path's zero padding —
    the anti-aliasing filter otherwise rings ~half a filter width of
    low-level energy into the padding, which the log-mel of near-silent
    frames amplifies."""
    from buzzdetect_tpu.ops.resample import resample
    wav = resample(wav, resample_from, cfg.sample_rate)
    n = wav.shape[-1]
    if n < resample_to:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, resample_to - n)]
        wav = jnp.pad(wav, pad)
    else:
        wav = wav[..., :resample_to]
    return jnp.where(jnp.arange(resample_to) < valid_len, wav, 0.0)


@partial(jax.jit,
         static_argnames=('cfg', 'compute_dtype', 'mesh', 'frontend', 'conv',
                          'conv_precision', 'resample_from', 'resample_to'))
def _classify_padded(params, waveform, cfg: FrontendConfig,
                     compute_dtype=jnp.float32, mesh=None, frontend='xla',
                     conv='xla', conv_precision='highest',
                     resample_from=None, resample_to=None,
                     valid_len=None):
    """Already-padded 1-D waveform -> (n_patches, n_classes) activations.

    With ``resample_from``, the waveform arrives at its native rate and is
    resampled to the model rate on-device (host ships native-rate wire bytes
    and spends zero CPU on resampling). With a mesh, the patch axis is
    sharded over 'data' (pure data parallelism: patches are independent, so
    the conv stack partitions with zero collectives; XLA only all-gathers
    the small activation rows at the output). The cheap frontend stays
    replicated — sharding the raw waveform would force halo exchanges
    across the overlapping STFT frames.
    """
    wav = _to_float(waveform)
    if resample_from is not None:
        wav = _resample_in_graph(wav, cfg, resample_from, resample_to,
                                 valid_len)
    patches = _frontend_patches(wav, cfg, frontend)
    if mesh is not None:
        patches = _shard_patches(patches, mesh)
    embeddings = yamnet_lib.embed(params['yamnet'], patches,
                                  compute_dtype=compute_dtype, conv=conv,
                                  conv_precision=conv_precision)
    return apply_head(params['head'], embeddings)


@partial(jax.jit, static_argnames=('cfg', 'compute_dtype', 'mesh', 'frontend',
                                   'conv', 'conv_precision', 'resample_from',
                                   'resample_to'))
def _classify_padded_batch(params, waveforms, cfg: FrontendConfig,
                           compute_dtype=jnp.float32, mesh=None,
                           frontend='xla', conv='xla',
                           conv_precision='highest', resample_from=None,
                           resample_to=None, valid_len=None):
    """(B, L) padded waveforms -> (B, n_patches, n_classes).

    Batching chunks from different files into one dispatch amortizes per-call
    overhead and gives the MXU larger effective batches; with a mesh, the
    flattened (B*n_patches) axis shards over 'data'.
    """
    wavs = _to_float(waveforms)
    if resample_from is not None:
        wavs = _resample_in_graph(wavs, cfg, resample_from, resample_to,
                                  valid_len)
    patches = _frontend_patches_batch(wavs, cfg, frontend)  # (B, P, 96, 64)
    b, p = patches.shape[0], patches.shape[1]
    flat = patches.reshape(b * p, *patches.shape[2:])
    if mesh is not None:
        flat = _shard_patches(flat, mesh)
    embeddings = yamnet_lib.embed(params['yamnet'], flat,
                                  compute_dtype=compute_dtype, conv=conv,
                                  conv_precision=conv_precision)
    scores = apply_head(params['head'], embeddings)
    return scores.reshape(b, p, -1)


@partial(jax.jit, static_argnames=('cfg', 'compute_dtype', 'conv',
                                   'conv_precision'))
def _embed_padded(params, waveform, cfg: FrontendConfig,
                  compute_dtype=jnp.float32, conv='xla',
                  conv_precision='highest'):
    patches = log_mel_patches(_to_float(waveform), cfg)
    return yamnet_lib.embed(params['yamnet'], patches,
                            compute_dtype=compute_dtype, conv=conv,
                            conv_precision=conv_precision)


def _execution_target_is_tpu(device=None, devices=None):
    """Whether the classifier's jit graphs will actually execute on a TPU.

    A device= pin wins; else an ambient jax.default_device(...) (how
    tools/tpu_numerics_probe.py builds its CPU reference in a TPU process)
    wins; only then does "some TPU exists in jax.devices()" decide.
    ``devices`` is injectable for tests.
    """
    target = device if device is not None else getattr(
        jax.config, 'jax_default_device', None)
    if target is not None:
        # jax accepts a platform STRING for jax_default_device too
        platform = target if isinstance(target, str) else target.platform
        return platform == 'tpu'
    devs = jax.devices() if devices is None else devices
    return any(d.platform == 'tpu' for d in devs)


def resolve_conv_auto(on_tpu, compute_dtype, mesh=None, sharding=None):
    """conv='auto' resolution rule (kept pure so tests can pin it).

    The fused Pallas conv blocks win only where their premise holds: TPU
    backend, f32 compute (in bf16 the kernels' f32 VPU depthwise work
    dominates — measured embed 1.95 ms all-XLA vs 3.27 ms fused on v5e),
    and no GSPMD partitioning (a pallas_call can't be sharded along the
    patch axis it blocks over).
    """
    f32 = jnp.dtype(compute_dtype) == jnp.float32
    return ('pallas' if on_tpu and f32 and mesh is None and sharding is None
            else 'xla')


class ChunkClassifier:
    """Callable classifier over variable-length chunks with compile caching.

    Parameters are a flat dict: ``yamnet/...`` folded conv weights and
    ``head/kernel``, ``head/bias``. ``sharding`` (optional) is a
    ``jax.sharding.NamedSharding`` applied to the padded waveform for
    multi-chip data parallelism (see buzzdetect_tpu.parallel).
    """

    # pad a ragged chunk into a cached length if the waste stays under this
    MAX_PAD_WASTE = 2.0

    def __init__(self, arrays: dict, framehop_prop: float = 1.0,
                 compute_dtype=jnp.float32, device=None, sharding=None,
                 mesh=None, transfer_dtype='float32', frontend='auto',
                 conv='auto', conv_precision='auto'):
        self.cfg = FrontendConfig().with_framehop(framehop_prop)
        self.compute_dtype = compute_dtype
        if frontend not in ('auto', 'xla', 'pallas'):
            raise ValueError("frontend must be 'auto', 'xla' or 'pallas'")
        # 'pallas' selects the fused kernel (ops/pallas_frontend.py) on both
        # the single-chunk and batch paths (no silent substitution).
        # 'auto' (the default) currently resolves to 'xla' on every backend:
        # the frontend dominates the classify graph, and after the hop-banked
        # (gather-free) rewrite the XLA frontend out-measures the fused
        # pallas kernel on a real v5e — 13.6 vs 16.9 ms per 960 s chunk in
        # f32, 6.0 vs 9.6 ms in bf16 (dispatch-slope method; the original
        # gather formulation took 343 ms). 'auto' is kept as the stable
        # default name so the resolution can be re-tuned per backend without
        # touching callers.
        self._frontend_auto = frontend == 'auto'
        if self._frontend_auto:
            frontend = 'xla'
        self.frontend = frontend
        if conv not in ('auto', 'xla', 'pallas'):
            raise ValueError("conv must be 'auto', 'xla' or 'pallas'")
        # conv stack implementation. 'pallas' fuses MobileNet layers 2-7
        # (lane-packed front + mid, yamnet.PALLAS_FRONT) and
        # 8-14+pooling into two VMEM-resident kernels (ops/pallas_conv.py)
        # — measured 1.37x on the whole embed for the tail blocks plus
        # ~1-2.5% full-graph for the front, at f32-rounding parity on a
        # v5e, so 'auto' resolves to it on TPU. It stays 'xla' under a mesh or an
        # input sharding: GSPMD cannot partition a pallas_call along the
        # patch axis it blocks over. Explicit 'pallas' + mesh/sharding
        # fails loudly rather than silently substituting; on non-TPU
        # backends explicit 'pallas' requires interpret mode (tests wrap in
        # pltpu.force_tpu_interpret_mode()). Under bfloat16 compute 'auto'
        # stays 'xla': the fused kernels' depthwise taps are f32 VPU work
        # (Mosaic can't rotate 16-bit vectors), which dominates once XLA's
        # matmuls drop from 6-pass HIGHEST to 1-pass bf16 — measured embed
        # 1.95 ms all-XLA vs 2.84/3.27 ms fused on v5e (tuning.md).
        self._conv_auto = conv == 'auto'
        if self._conv_auto:
            conv = resolve_conv_auto(_execution_target_is_tpu(device),
                                     compute_dtype, mesh, sharding)
        elif conv == 'pallas' and (mesh is not None or sharding is not None):
            raise ValueError(
                "conv='pallas' does not compose with mesh/sharding "
                "(GSPMD cannot partition the fused kernel); use conv='xla'")
        self.conv = conv
        # MXU emulation depth for the conv stack's f32 dots (bf16 compute
        # ignores it — its dots run 1-pass DEFAULT). 'auto' resolves
        # PER CONV PATH from round-5 hardware measurements on the real
        # bundle (docs/tuning.md "round-5 conv precision"):
        # * conv='xla' -> 'high' (3-pass): measured 1.166x (29.0->24.9 ms
        #   classify) at max |dscore| 7.3-8.5e-4 — inside the 1e-3 parity
        #   budget, though with only ~1.3x headroom (the round-3 "1.5e-4,
        #   7x headroom" figure did not survive the real head's
        #   amplification). This is the path mesh/sharded runs and
        #   pallas-compile-failure fallbacks take — the only place the
        #   knob both wins and holds the budget. (An AUTO precision
        #   re-resolves to 'high' when the fallback flips conv to 'xla'
        #   — _dispatch — so the documented per-path rule holds there
        #   too; an EXPLICIT 'highest' survives the flip.)
        # * conv='pallas' -> 'highest': Mosaic's in-kernel dot lowering
        #   refuses Precision.HIGH outright, and the in-kernel 3-pass
        #   EMULATION (ops/pallas_conv.py::_pw_dot — hi/lo bf16 splits,
        #   zero extra VMEM) measures 1.128-1.167x but moves real-bundle
        #   scores ~1e-2: its math is near-exact (interpret parity
        #   2.5e-6) but the compiled MXU's accumulation-order seeds are
        #   amplified by relu gating through the stack — 10x over budget,
        #   and any user tolerating >1e-3 is strictly better served by
        #   --bf16 (2.2x at ~6e-3). Explicit 'high' + pallas still
        #   selects the emulated kernels (measured, documented) for
        #   study and for future toolchains with native in-kernel HIGH.
        # 'highest' everywhere (6-pass exact f32) is the --strict_f32
        # escape; the frontend's DFT/mel matmuls ship at HIGH on their own
        # measurement (ops/frontend.py::DFT_PRECISION) and the head stays
        # HIGHEST (one tiny dot producing the user-visible scores).
        if conv_precision not in ('auto', 'high', 'highest'):
            raise ValueError(
                "conv_precision must be 'auto', 'high' or 'highest'")
        self._conv_precision_auto = conv_precision == 'auto'
        self.conv_precision = (
            ('highest' if conv == 'pallas' else 'high')
            if conv_precision == 'auto' else conv_precision)
        if conv == 'pallas':
            # resolve the BUZZDETECT_PALLAS_FRONT env override NOW, so a
            # malformed knob fails loudly at model init (its ValueError
            # names the variable) instead of surfacing mid-dispatch —
            # where conv-auto's compile-failure fallback would demote the
            # operator's requested experiment to all-XLA with only a
            # warning. Import stays clean either way (yamnet parses the
            # env lazily), keeping doctor/GUI runnable for diagnosis.
            yamnet_lib.resolve_front()
        # 'mulaw' rides int8 on the wire; linear int8 is deliberately not
        # offered (mu-law strictly dominates it for audio at the same size)
        self.transfer_name = str(transfer_dtype)
        if self.transfer_name not in ('float32', 'int16', 'mulaw'):
            raise ValueError('transfer_dtype must be float32, int16 or mulaw')
        self.transfer_dtype = np.dtype(
            'int8' if self.transfer_name == 'mulaw' else self.transfer_name)
        self.device = device
        self.sharding = sharding
        self.mesh = mesh
        # where inputs land: an explicit sharding wins; else the device pin
        # (replica mode — transferring to the default device and letting
        # dispatch forward it would hop through chip 0 on every chunk);
        # else None (default device, the single-chip case)
        self._placement = sharding if sharding is not None else device

        yam = {k.split('/', 1)[1]: np.asarray(v, np.float32)
               for k, v in arrays.items() if k.startswith('yamnet/')}
        if not yam:
            # bundles store only the raw (unfolded) embedder weights; fold
            # BatchNorm into conv+bias here, once, at load time
            raw = {k.split('/', 1)[1]: np.asarray(v, np.float32)
                   for k, v in arrays.items() if k.startswith('yamnet_raw/')}
            if raw:
                yam = yamnet_lib.fold_batchnorm(raw)
        head = {k: np.asarray(v, np.float32)
                for k, v in arrays.items() if k.startswith('head/')}
        if not yam:
            raise ValueError('bundle missing yamnet/ or yamnet_raw/ parameters')
        # head is optional: an embedder-only bundle still supports embed()
        self.params = {'yamnet': yam, 'head': head} if head else {'yamnet': yam}
        self._params_device = None
        self._compiled_lengths = []
        # predict may be called from several dispatch threads; guard the
        # mutable caches (device params, compiled-length list)
        self._cache_lock = threading.Lock()

    # --- device residency -------------------------------------------------
    def _device_params(self):
        with self._cache_lock:
            if self._params_device is None:
                put = (partial(jax.device_put, device=self.device)
                       if self.device is not None else jax.device_put)
                self._params_device = jax.tree.map(put, self.params)
            return self._params_device

    # --- shape bucketing ----------------------------------------------------
    def _target_length(self, n_samples: int) -> int:
        need = padded_length(n_samples, self.cfg)
        with self._cache_lock:
            fits = [L for L in self._compiled_lengths
                    if L >= need and L <= need * self.MAX_PAD_WASTE]
            if fits:
                return min(fits)
            self._compiled_lengths.append(need)
            self._compiled_lengths.sort()
            return need

    def to_wire(self, samples: np.ndarray) -> np.ndarray:
        """Convert host samples to this classifier's wire dtype (no-op when
        the decode stage already emitted it — the pipeline's normal case).
        int8 input is always mu-law (the only int8 producer is the wire
        encoder itself); int16 is linear PCM."""
        if samples.dtype == self.transfer_dtype:
            return samples
        if samples.dtype == np.int16:
            samples = samples.astype(np.float32) * (1.0 / 32768.0)
        elif samples.dtype == np.int8:
            y = samples.astype(np.float32) * (1.0 / 127.0)
            samples = np.sign(y) * np.expm1(np.abs(y) * _LN256,
                                            dtype=np.float32) * (1.0 / 255.0)
        elif samples.dtype != np.float32:
            samples = samples.astype(np.float32)
        if self.transfer_name == 'int16':
            return quantize_int16(samples)
        if self.transfer_name == 'mulaw':
            return encode_mulaw(samples)
        return samples

    def _pad_to(self, samples: np.ndarray, target: int):
        """Pad to the compiled length, converting to the wire dtype."""
        samples = self.to_wire(samples)
        if len(samples) == target:
            return samples
        out = np.zeros(target, dtype=samples.dtype)
        out[:len(samples)] = samples
        return out

    def _plan_native(self, n_native: int, input_rate: int):
        """Shape plan for a native-rate chunk resampled on-device: the valid
        patch count and padded target in the MODEL-rate domain (sharing the
        same compiled-length buckets as 16 kHz inputs), plus the native-rate
        length the host must pad the wire buffer to so the in-graph
        resampler produces at least ``target_model`` samples."""
        sr = self.cfg.sample_rate
        n_model = -(-n_native * sr // input_rate)  # ceil
        n_valid = num_patches(n_model, self.cfg)
        target_model = self._target_length(n_model)
        target_native = -(-target_model * input_rate // sr)
        return n_valid, n_model, target_model, target_native

    def _dispatch(self, thunk):
        """Run a jitted-graph thunk; if the AUTO-resolved fused Pallas conv
        fails to compile (Mosaic constraints vary across TPU generations and
        toolchain versions), degrade once to the portable XLA conv with a
        warning instead of crashing the product. An EXPLICIT conv='pallas'
        still fails loudly — no silent substitution, same contract as the
        frontend knob. The thunk must read self.conv at call time so the
        retry picks up the flip."""
        try:
            return thunk()
        except Exception as e:
            if not (self._conv_auto and self.conv == 'pallas'):
                raise
            import warnings
            warnings.warn(
                f'fused Pallas conv failed to compile on this backend '
                f'({type(e).__name__}: {str(e)[:300]}); conv=auto falling '
                f'back to the XLA conv stack', RuntimeWarning)
            # precision BEFORE conv: concurrent dispatch threads key off
            # self.conv — flipping conv first would let another thread
            # score a chunk at (xla, highest) mid-transition, breaking
            # the run's byte-determinism vs its own resume
            if self._conv_precision_auto:
                # the per-path auto rule follows the flip: the XLA path's
                # measured-default is HIGH (1.166x at 7-9e-4, in budget);
                # an EXPLICIT 'highest' (--strict_f32) is preserved
                self.conv_precision = 'high'
            self.conv = 'xla'
            return thunk()

    def _classify(self, wav_device, *resample_args):
        """Run the jitted classify graph with the selected frontend. An
        explicit frontend choice fails loudly — no silent substitution."""
        return self._dispatch(lambda: _classify_padded(
            self._device_params(), wav_device, self.cfg, self.compute_dtype,
            self.mesh, self.frontend, self.conv, self.conv_precision,
            *resample_args))

    # --- public API ------------------------------------------------------------
    def predict(self, samples: np.ndarray,
                input_rate: int = None) -> np.ndarray:
        """Mono float32 samples -> (n_patches, n_classes) activations.

        Samples are 16 kHz unless ``input_rate`` says otherwise, in which
        case they ship native and resample on-device."""
        if 'head' not in self.params:
            raise ValueError('this bundle has no classifier head; use embed()')
        out, n_valid = self.predict_async(samples, input_rate=input_rate)
        return np.asarray(out)[:n_valid]

    def predict_async(self, samples: np.ndarray, input_rate: int = None):
        """Dispatch without blocking; returns (device_array, n_valid).

        JAX dispatch is asynchronous — the returned array materializes on
        first host access, letting the pipeline overlap host decode with
        device compute (the TPU version of the reference's bounded
        stream->infer queue overlap).
        """
        samples = np.asarray(samples)
        if input_rate and input_rate != self.cfg.sample_rate:
            n_valid, n_model, t_model, t_native = self._plan_native(
                len(samples), input_rate)
            wav = jax.device_put(self._pad_to(samples, t_native),
                                 self._placement)
            out = self._classify(wav, int(input_rate), int(t_model),
                                 jnp.int32(n_model))
            return out, n_valid
        n_valid = num_patches(len(samples), self.cfg)
        wav = self._pad_to(samples, self._target_length(len(samples)))
        # explicit async device_put: the transfer enters the stream now and
        # overlaps with earlier chunks' compute/downloads; the jit call then
        # only dispatches
        wav = jax.device_put(wav, self._placement)
        out = self._classify(wav)
        return out, n_valid

    def predict_async_batch(self, samples_list, input_rate: int = None):
        """Dispatch several chunks as ONE device call.

        All chunks pad to a common compiled length (the largest needed) and,
        when ``input_rate`` is given, share that native rate.
        Returns (scores_device (B, P, C), [n_valid per chunk]).
        """
        if 'head' not in self.params:
            raise ValueError('this bundle has no classifier head')
        arrs = [np.asarray(s) for s in samples_list]
        if input_rate and input_rate != self.cfg.sample_rate:
            sr = self.cfg.sample_rate
            n_models = [-(-len(a) * sr // input_rate) for a in arrs]
            n_valids = [num_patches(n, self.cfg) for n in n_models]
            t_model = self._target_length(max(n_models))
            t_native = -(-t_model * input_rate // sr)
            batch = np.stack([self._pad_to(a, t_native) for a in arrs])
            batch = jax.device_put(batch, self._placement)
            valid = jnp.asarray(n_models, jnp.int32)[:, None]  # (B, 1)
            out = self._dispatch(lambda: _classify_padded_batch(
                self._device_params(), batch, self.cfg, self.compute_dtype,
                self.mesh, self.frontend, self.conv, self.conv_precision,
                int(input_rate), int(t_model), valid))
            return out, n_valids
        n_valids = [num_patches(len(a), self.cfg) for a in arrs]
        target = self._target_length(max(len(a) for a in arrs))
        batch = np.stack([self._pad_to(a, target) for a in arrs])
        batch = jax.device_put(batch, self._placement)
        out = self._dispatch(lambda: _classify_padded_batch(
            self._device_params(), batch, self.cfg, self.compute_dtype,
            self.mesh, self.frontend, self.conv, self.conv_precision))
        return out, n_valids

    def classify_resident(self, wav_device):
        """Dispatch the classify graph on an already device-resident padded
        wire-format waveform — no host staging or transfer. This is the
        compute-bound path: callers that keep data on-device (and bench.py,
        which uses it to separate link transfer from graph time) skip the
        host->device copy that predict_async performs."""
        return self._classify(wav_device)

    def embed(self, samples: np.ndarray) -> np.ndarray:
        """16 kHz mono samples -> (n_patches, 1024) embeddings."""
        samples = np.asarray(samples)
        n_valid = num_patches(len(samples), self.cfg)
        wav = self._pad_to(samples, self._target_length(len(samples)))
        out = self._dispatch(lambda: _embed_padded(
            self._device_params(), wav, self.cfg, self.compute_dtype,
            self.conv, self.conv_precision))
        return np.asarray(out)[:n_valid]

    def warmup(self, chunk_samples: int):
        """Pre-compile for the nominal chunk length (avoids first-chunk stall)."""
        self.predict(np.zeros(chunk_samples, np.float32))
