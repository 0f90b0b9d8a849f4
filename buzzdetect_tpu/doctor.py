"""Environment self-check: ``python -m buzzdetect_tpu.doctor``.

Verifies everything an analysis run needs — the accelerator, the native
decode stage, the model bundle, and a tiny end-to-end inference — and prints
one line per check so field deployments can triage quickly.

``--json`` emits one machine-readable object instead (schema
``buzzdetect_doctor/1``: overall ``ok``, per-check results, warnings), the
fleet-health counterpart of the run's ``buzzdetect_run_summary.json`` — a
supervisor probing N field boxes parses this instead of scraping the human
lines. The exit code is the same contract in both modes (0 = all checks
passed).
"""

import json
import os
import sys
import traceback

# A dead axon tunnel hangs jax.devices() FOREVER — the one condition a
# triage tool must diagnose, not inherit. The probe itself is shared with
# bench.py's supervised preflight (utils.backend_preflight); the module
# attribute below exists so tests can substitute a hanging probe.
from buzzdetect_tpu.utils import PREFLIGHT_CODE as _PREFLIGHT_CODE  # noqa: E402
from buzzdetect_tpu.utils import backend_preflight  # noqa: E402


def _backend_reachable(timeout: float):
    """(ok, why_not): dispatch one matmul in a watched subprocess."""
    return backend_preflight(timeout, code=_PREFLIGHT_CODE)


def _check(name, fn, results, quiet=False):
    try:
        detail = fn()
        if not quiet:
            print(f'  [ok]   {name}' + (f' — {detail}' if detail else ''))
        results.append({'name': name, 'ok': True, 'detail': detail or ''})
        return True
    except Exception as e:
        err = f'{e.__class__.__name__}: {e}'
        if not quiet:
            print(f'  [FAIL] {name} — {err}')
            if os.environ.get('BUZZDETECT_DOCTOR_TRACE'):
                traceback.print_exc()
        results.append({'name': name, 'ok': False, 'error': err})
        return False


def _skip(name, why, results, quiet=False):
    if not quiet:
        print(f'  [skip] {name} — {why}')
    results.append({'name': name, 'ok': None, 'skipped': True,
                    'detail': why})


def main(modelname: str = None, json_mode: bool = False):
    from buzzdetect_tpu import config as cfg
    modelname = modelname or cfg.DEFAULT_MODEL
    results, warnings_out = [], []
    if not json_mode:
        print('buzzdetect-tpu doctor')
    ok = True

    def finish():
        if json_mode:
            print(json.dumps({
                'schema': 'buzzdetect_doctor/1',
                'modelname': modelname,
                'ok': ok,
                'warnings': warnings_out,
                'checks': results,
            }))
        elif not ok:
            print('SOME CHECKS FAILED')
        elif warnings_out:
            print('all checks passed — WITH WARNINGS (see above)')
        else:
            print('all checks passed')
        return 0 if ok else 1

    # importing the classifier applies the JAX_PLATFORMS pin before any
    # check initializes a backend (the image's preloaded TPU plugin would
    # otherwise override the user's env var — see _honor_platform_env).
    # Guarded: a machine where jax itself fails to import is exactly what
    # the doctor exists to triage — it must print a FAIL line, not die
    # with a raw traceback before the first check
    def check_import():
        import buzzdetect_tpu.models.classifier  # noqa: F401
        return 'jax + classifier importable'
    if not _check('jax import', check_import, results, json_mode):
        ok = False
        if not json_mode:
            print('cannot continue without jax; set BUZZDETECT_DOCTOR_TRACE=1 '
                  'for the full traceback')
        return finish()

    try:
        timeout_s = float(os.environ.get('BUZZDETECT_DOCTOR_TIMEOUT', '60'))
    except ValueError:
        # the triage tool must not die on a malformed env var before it
        # has diagnosed anything
        if not json_mode:
            print('WARN  BUZZDETECT_DOCTOR_TIMEOUT is not a number; using 60')
        warnings_out.append('BUZZDETECT_DOCTOR_TIMEOUT is not a number; '
                            'used 60')
        timeout_s = 60.0
    reachable, why = _backend_reachable(timeout_s)
    if reachable:
        def check_jax():
            import jax
            devs = jax.devices()
            return f'{len(devs)} device(s): {devs[0].platform} {devs[0]}'
        ok &= _check('jax backend', check_jax, results, json_mode)
    else:
        ok = False
        results.append({'name': 'jax backend', 'ok': False, 'error': why})
        if not json_mode:
            print(f'  [FAIL] jax backend — {why}')
            print('         skipping device-bound checks; host-side checks '
                  'continue below.\n'
                  '         To doctor the host stack alone: '
                  'JAX_PLATFORMS=cpu python -m buzzdetect_tpu.doctor')

    def check_decoder():
        from buzzdetect_tpu.audio.ffi import get_lib
        get_lib()
        return 'libbuzz_decode.so loaded'
    ok &= _check('native decoder (libav)', check_decoder, results, json_mode)

    def check_decode_roundtrip():
        import tempfile
        from buzzdetect_tpu.audio.ffi import encode_fixture
        from buzzdetect_tpu.audio import build_track
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, 'probe.mp3')
            encode_fixture(p, 'libmp3lame', 16000, 1, 0.5)
            t = build_track(p, target_rate=16000)
            n = len(t.read(16000))
            t.close()
        return f'mp3 encode/decode round-trip ({n} samples)'
    ok &= _check('codec round-trip', check_decode_roundtrip, results,
                 json_mode)

    def check_model():
        from buzzdetect_tpu.models.registry import load_model
        model = load_model(modelname, initialize=False)
        return (f'{modelname}: {len(model.config["classes"])} classes, '
                f'embedder {model.embeddername}')
    ok &= _check('model bundle', check_model, results, json_mode)

    def check_inference():
        import numpy as np
        from buzzdetect_tpu.models.registry import load_model
        model = load_model(modelname, initialize=True)
        out = model.predict(np.zeros(16000, np.float32))
        clf = getattr(model, 'classifier', None)
        # report which implementations actually ran: frontend 'auto'
        # resolves to 'xla' on every backend (the hop-banked XLA frontend
        # out-measures the fused pallas DSP kernel on real v5e hardware);
        # conv 'auto' resolves to the fused Pallas conv blocks (layers 4-7
        # and 8-14+pool) on TPU and 'xla' elsewhere — see
        # models/classifier.py for the resolution rules
        # conv_precision 'auto' resolves per conv path (HIGHEST on the
        # fused pallas kernels, HIGH on XLA — the measured-per-path
        # defaults, docs/tuning.md "Round-5 conv precision")
        knobs = (f', frontend={clf.frontend}, conv={clf.conv}'
                 f', conv_precision={clf.conv_precision}'
                 if clf is not None else '')
        return f'1 s inference -> {out.shape} scores{knobs}'
    if reachable:
        ok &= _check('end-to-end inference', check_inference, results,
                     json_mode)
    else:
        _skip('end-to-end inference', 'backend unreachable', results,
              json_mode)

    def check_threshold():
        from buzzdetect_tpu.write.thresholds import calculate_threshold
        thr = calculate_threshold(modelname, 0.95)
        return f'precision 0.95 -> threshold {thr:.3f}'
    ok &= _check('threshold calibration (metrics table)', check_threshold,
                 results, json_mode)

    warning = weights_warning(modelname, quiet=json_mode)
    if warning:
        warnings_out.append(warning)

    return finish()


def weights_warning(modelname, quiet=False):
    """WARN when the bundle's provenance says the embedder is untrained.

    A seeded-init embedder makes every downstream number (activations,
    detections, calibrated thresholds) semantically meaningless even though
    the pipeline is numerically healthy — a green doctor without this
    warning would be a false 'ready for the field' light.

    Returns the warning text (for the JSON record), or None."""
    try:
        from buzzdetect_tpu.models.registry import load_model
        model = load_model(modelname, initialize=False)
        provenance = model.config.get('provenance', '')
    except Exception:
        return None
    if 'seeded init' not in provenance:
        return None
    if not quiet:
        print(f'  [WARN] UNTRAINED WEIGHTS — bundle provenance says: '
              f'"{provenance}".\n'
              f'         Scores and detections from this bundle are NOT '
              f'meaningful; install pretrained\n'
              f'         weights (tools/fetch_yamnet_weights.py) before field '
              f'use. The packed metrics\n'
              f'         table describes the reference model, not this bundle.')
    return f'UNTRAINED WEIGHTS — bundle provenance: {provenance}'


if __name__ == '__main__':
    argv = sys.argv[1:]
    as_json = '--json' in argv
    # a typo like --jsn must error, not silently fall back to human
    # output with exit 0 — a supervisor would then misread the parse
    # failure of the non-JSON stdout as a broken machine
    unknown = [a for a in argv if a.startswith('--') and a != '--json']
    if unknown:
        print(f"doctor: unknown flag(s): {' '.join(unknown)} "
              f"(supported: --json)", file=sys.stderr)
        sys.exit(2)
    names = [a for a in argv if not a.startswith('--')]
    sys.exit(main(names[0] if names else None, json_mode=as_json))
