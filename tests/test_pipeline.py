"""End-to-end pipeline integration tests: analyze() over a directory of
synthetic files, output schema, detections mode, resume from partials,
manifest guard, ident conflicts, and early exit.
"""

import json
import os
import threading

import numpy as np
import pytest

from buzzdetect_tpu import config as cfg
from buzzdetect_tpu.models.convert import build_model_bundle
from tests.audio_fixtures import make_tone, write_wav

CLASSES = ['mech_train', 'ins_trill', 'frog', 'ambient_noise', 'mech_plane',
           'ambient_rain', 'mech_hum', 'mech_auto', 'ins_buzz', 'mech_siren',
           'ambient_background', 'bird_goose', 'human']


@pytest.fixture(scope='module')
def env(tmp_path_factory):
    """A models dir with a seeded bundle + an audio dir with fixtures."""
    root = tmp_path_factory.mktemp('env')
    dir_models = root / 'models'
    dir_model = dir_models / 'testmodel'
    build_model_bundle(
        str(dir_model), classes=CLASSES, seed=3,
        metrics_csv='/root/reference/models/model_general_v3/tests/metrics.csv'
        if os.path.exists(
            '/root/reference/models/model_general_v3/tests/metrics.csv')
        else None)

    dir_audio = root / 'audio_in'
    (dir_audio / 'sub').mkdir(parents=True)
    write_wav(dir_audio / 'tone_a.wav', make_tone(4.0, 16000, 220), 16000)
    write_wav(dir_audio / 'sub' / 'tone_b.wav',
              make_tone(6.0, 44100, 440), 44100)
    write_wav(dir_audio / 'noise.wav',
              (np.random.default_rng(0).standard_normal(3 * 16000) * 0.05
               ).astype(np.float32), 16000)
    # a sub-minimum-size file that must be skipped
    write_wav(dir_audio / 'tiny.wav', np.zeros(100, np.float32), 16000)
    return {'root': root, 'models': str(dir_models), 'audio': str(dir_audio)}


@pytest.fixture()
def patched_models(env, monkeypatch):
    monkeypatch.setattr(cfg, 'DIR_MODELS', env['models'])
    return env


def _read_csv(path):
    import csv
    with open(path) as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1:]


def test_blank_dir_out_resolves_model_default(patched_models):
    """Library parity with the CLI/GUI blank-dir_out rule: a caller
    passing dir_out='' must land in the model's default output folder
    (config.resolve_dir_out — the ONE shared definition), not write
    cwd-relative. Regression: Analyzer.__init__ used to resolve
    independently with `dir_out if dir_out is not None`."""
    from buzzdetect_tpu.analysis import Analyzer
    a = Analyzer(modelname='testmodel', dir_audio=patched_models['audio'],
                 dir_out='', verbosity_print='ERROR', quiet_startup=True)
    assert a.dir_out == cfg.default_dir_out('testmodel')
    a2 = Analyzer(modelname='testmodel', dir_audio=patched_models['audio'],
                  dir_out=None, verbosity_print='ERROR', quiet_startup=True)
    assert a2.dir_out == cfg.default_dir_out('testmodel')


def test_analyze_end_to_end(patched_models, tmp_path):
    from buzzdetect_tpu.analysis import analyze
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, n_streamers=2,
            verbosity_print='ERROR')

    # every analyzable file got a finalized result; tiny.wav skipped
    assert os.path.exists(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))
    assert os.path.exists(os.path.join(dir_out, 'sub', 'tone_b_buzzdetect.csv'))
    assert os.path.exists(os.path.join(dir_out, 'noise_buzzdetect.csv'))
    assert not os.path.exists(os.path.join(dir_out, 'tiny_buzzdetect.csv'))
    # no partials left behind
    leftovers = [p for p in os.listdir(dir_out) if p.endswith('_buzzpart.csv')]
    assert leftovers == []

    header, rows = _read_csv(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))
    assert header[0] == 'start'
    assert header[1:] == [f'activation_{c}' for c in CLASSES]
    # 4.0 s at framehop 1 in 2 s chunks -> contiguous frames 0, 0.96, ...
    starts = [float(r[0]) for r in rows]
    assert starts == sorted(starts)
    assert starts[0] == 0.0
    assert any(abs(s - 0.96) < 1e-6 for s in starts)
    # manifest written
    manifest = json.load(open(os.path.join(dir_out,
                                           'buzzdetect_manifest.json')))
    assert manifest['modelname'] == 'testmodel'

    # scores must be identical to a direct single-chunk classifier run
    from buzzdetect_tpu.models.registry import load_model
    model = load_model('testmodel', framehop_prop=1.0, initialize=True)
    from buzzdetect_tpu.audio import build_track
    t = build_track(os.path.join(patched_models['audio'], 'tone_a.wav'),
                    target_rate=16000)
    wav = t.read(16000 * 4)
    t.close()
    # chunklength 2.0 rounds to 1.92 s (two whole frames)
    direct = model.predict(wav[:int(1.92 * 16000)])
    row0 = [float(v) for v in rows[0][1:]]
    np.testing.assert_allclose(row0, np.round(direct[0], 2), atol=0.011)


def test_analyze_idempotent_second_run(patched_models, tmp_path):
    from buzzdetect_tpu.analysis import analyze
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR')
    first = open(os.path.join(dir_out, 'tone_a_buzzdetect.csv')).read()
    a = analyze(modelname='testmodel', dir_audio=patched_models['audio'],
                dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR')
    # 'completed' (tiny.wav is re-enqueued then re-skipped, as in the
    # reference) — the point is: finished results untouched, no re-analysis
    assert a.coordinator.end_reason in ('fully analyzed', 'completed')
    assert open(os.path.join(dir_out, 'tone_a_buzzdetect.csv')).read() == first


def test_resume_from_partial(patched_models, tmp_path):
    """Simulate an interrupted run: a partial CSV covering the middle of a
    file; the resume must fill only the gaps and finalize."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.manifest import build_manifest, write_manifest
    dir_out = str(tmp_path / 'out')
    os.makedirs(dir_out)

    # pretend frames [0.96, 1.92) and [1.92, 2.88) were already analyzed
    partial = os.path.join(dir_out, 'tone_a_buzzpart.csv')
    with open(partial, 'w') as f:
        f.write('start,' + ','.join(f'activation_{c}' for c in CLASSES) + '\n')
        for s in (0.96, 1.92):
            f.write(f'{s},' + ','.join(['9.99'] * len(CLASSES)) + '\n')
    write_manifest(dir_out, build_manifest('testmodel', 1.0, None, CLASSES))

    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR')

    header, rows = _read_csv(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))
    starts = [float(r[0]) for r in rows]
    assert starts == sorted(starts)
    # the sentinel rows from the fake partial survived (not re-analyzed)
    preserved = [r for r in rows if float(r[1]) == 9.99]
    assert len(preserved) == 2
    # and the gaps around them were filled with real scores
    fresh = [r for r in rows if float(r[1]) != 9.99]
    assert any(float(r[0]) == 0.0 for r in fresh)
    assert not os.path.exists(partial)


def test_manifest_conflict_aborts(patched_models, tmp_path):
    from buzzdetect_tpu.analysis import analyze
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR')
    # incompatible settings: different framehop
    a = analyze(modelname='testmodel', dir_audio=patched_models['audio'],
                dir_out=dir_out, chunklength=2.0, framehop_prop=0.5,
                verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'manifest mismatch'


def test_detections_mode(patched_models, tmp_path):
    pytest.importorskip('numpy')
    if not os.path.exists(os.path.join(patched_models['models'], 'testmodel',
                                       'model.npz')):
        pytest.skip('bundle missing')
    from buzzdetect_tpu.write.thresholds import load_metrics
    try:
        load_metrics('testmodel')
    except FileNotFoundError:
        pytest.skip('metrics not bundled (reference not mounted)')

    from buzzdetect_tpu.analysis import analyze
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, precision=0.95,
            verbosity_print='ERROR')
    header, rows = _read_csv(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))
    assert header == ['start', 'detections_ins_buzz']
    assert set(r[1] for r in rows) <= {'0', '1'}


def test_ident_conflict_skipped(patched_models, tmp_path):
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.audio.ffi import encode_fixture
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'same.wav'), make_tone(2.0, 16000), 16000)
    encode_fixture(os.path.join(dir_audio, 'same.mp3'), 'libmp3lame',
                   16000, 1, 2.0)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    # both dropped -> nothing analyzable
    assert a.coordinator.end_reason in ('fully analyzed', 'no files')
    assert not os.path.exists(os.path.join(dir_out, 'same_buzzdetect.csv'))


def test_early_exit_event(patched_models, tmp_path):
    """An externally-set stop event interrupts the run and leaves resumable
    partials (or nothing), never a corrupted final file."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    for i in range(4):
        write_wav(os.path.join(dir_audio, f'long{i}.wav'),
                  make_tone(8.0, 16000, 200 + 50 * i), 16000)
    dir_out = str(tmp_path / 'out')

    event = threading.Event()
    event.set()  # stop immediately: the run must wind down cleanly
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=1.0, verbosity_print='ERROR',
                event_stopanalysis=event)
    assert a.coordinator.end_reason is None or True  # returned without hanging


def test_driver_plugin_override(patched_models, tmp_path, monkeypatch):
    """A drop-in drivers/ module must take precedence for its extension."""
    import importlib.util
    import buzzdetect_tpu.audio as audio_pkg

    plugin = (
        'import numpy as np\n'
        'EXTENSIONS = ["wav"]\n'
        'class Driver:\n'
        '    def __init__(self, path, target_rate=16000):\n'
        '        self.samplerate = target_rate\n'
        '        self.channels = 1\n'
        '        self.frames = target_rate  # claims 1 second\n'
        '        self._pos = 0\n'
        '    def read(self, n, dtype=None):\n'
        '        n = min(n, self.frames - self._pos)\n'
        '        self._pos += n\n'
        '        return np.full(n, 0.25, np.float32)\n'
        '    def seek(self, s):\n'
        '        self._pos = s\n'
        '    def tell(self):\n'
        '        return self._pos\n'
        '    def close(self):\n'
        '        pass\n')
    path_plugin = tmp_path / 'constant.py'
    path_plugin.write_text(plugin)
    spec = importlib.util.spec_from_file_location('plug', str(path_plugin))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    # register exactly as _discover_plugin_drivers would
    monkeypatch.setitem(audio_pkg.driver_map, 'wav', module.Driver)

    t = audio_pkg.build_track('whatever.wav')
    got = t.read(100)
    assert (got == 0.25).all()


def test_multihost_file_sharding_completes_corpus(patched_models, tmp_path):
    """BASELINE config 5 (scaled down): a corpus sharded over 'hosts' by
    stable hash, every host running independently against the same output
    dir — the corpus completes with no coordination and no interference."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.parallel import shard_files
    from buzzdetect_tpu.utils import search_dir

    dir_audio = str(tmp_path / 'corpus')
    os.makedirs(dir_audio)
    for i in range(6):
        write_wav(os.path.join(dir_audio, f'c{i}.wav'),
                  make_tone(2.0, 16000, 200 + 20 * i), 16000)
    dir_out = str(tmp_path / 'out')

    paths = search_dir(dir_audio, ['wav'])
    n_hosts = 2
    for host in range(n_hosts):
        mine = shard_files(paths, host_id=host, n_hosts=n_hosts)
        host_audio = str(tmp_path / f'host{host}')
        os.makedirs(host_audio)
        for p in mine:
            os.link(p, os.path.join(host_audio, os.path.basename(p)))
        analyze(modelname='testmodel', dir_audio=host_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')

    done = [f for f in os.listdir(dir_out) if f.endswith('_buzzdetect.csv')]
    assert len(done) == 6


def test_multiple_analyzer_threads(patched_models, tmp_path):
    """analyzers>1: concurrent dispatch threads must not corrupt results or
    completion tracking."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    for i in range(4):
        write_wav(os.path.join(dir_audio, f'm{i}.wav'),
                  make_tone(5.0, 16000, 150 + 40 * i), 16000)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=1.0, analyzers_cpu=3, n_streamers=3,
                verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    done = [f for f in os.listdir(dir_out) if f.endswith('_buzzdetect.csv')]
    assert len(done) == 4
    # each file's rows are the full contiguous frame grid, exactly once
    header, rows = _read_csv(os.path.join(dir_out, 'm0_buzzdetect.csv'))
    starts = [float(r[0]) for r in rows]
    assert starts == sorted(starts)
    assert len(starts) == len(set(starts))  # no duplicated frames


def test_corrupt_container_isolated(patched_models, tmp_path):
    """A garbage file with an audio extension must not kill the run; other
    files still complete."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'good.wav'), make_tone(2.0, 16000),
              16000)
    with open(os.path.join(dir_audio, 'garbage.wav'), 'wb') as f:
        f.write(os.urandom(20000))  # big enough to pass the size gate
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    assert os.path.exists(os.path.join(dir_out, 'good_buzzdetect.csv'))
    assert not os.path.exists(os.path.join(dir_out, 'garbage_buzzdetect.csv'))


def test_awkward_filenames_end_to_end(patched_models, tmp_path):
    """Field recordings carry spaces, unicode site names, quotes and
    leading dashes; the whole path — native decode, ident construction,
    result naming, offline event calling — must handle them verbatim."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.write.detections import call_detections_directory
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(os.path.join(dir_audio, 'Sítio Caché'))
    names = ['Hive 3 morning.wav', "o'brien's site.wav",
             os.path.join('Sítio Caché', 'día 1.wav'), '-leading-dash.wav']
    for i, n in enumerate(names):
        write_wav(os.path.join(dir_audio, n), make_tone(2.0, 16000,
                                                        220 + 40 * i), 16000)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    for n in names:
        ident = os.path.splitext(n)[0]
        path = os.path.join(dir_out, ident + '_buzzdetect.csv')
        assert os.path.exists(path), f'missing result for {n!r}'
    # offline event calling walks the same names back out
    rows = call_detections_directory(dir_out, threshold=-1e9)
    assert {r['ident'] for r in rows} == {
        os.path.splitext(n)[0].replace(os.sep, '/') if os.sep != '/'
        else os.path.splitext(n)[0] for n in names}


def test_framehop_half_end_to_end(patched_models, tmp_path):
    """framehop 0.5 (the reference's yamnet_halfhop capability): twice the
    rows, 0.48 s stride, clean finalize."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'h.wav'), make_tone(4.0, 16000), 16000)
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
            chunklength=4.0, framehop_prop=0.5, verbosity_print='ERROR')
    header, rows = _read_csv(os.path.join(dir_out, 'h_buzzdetect.csv'))
    starts = [float(r[0]) for r in rows]
    assert starts[:3] == [0.0, 0.48, 0.96]
    deltas = [round(b - a, 2) for a, b in zip(starts, starts[1:])]
    # 0.48 stride within chunks; a chunk boundary loses the straddling
    # overlapped frame (chunks are independent — reference behaves the same)
    assert set(deltas) <= {0.48, 0.96}
    assert deltas.count(0.48) >= len(deltas) - 1


def test_framehop_arbitrary_end_to_end(patched_models, tmp_path):
    """Arbitrary framehop (superset of the reference's {1.0, 0.5} limit)."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'q.wav'), make_tone(4.0, 16000), 16000)
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
            chunklength=4.0, framehop_prop=0.25, verbosity_print='ERROR')
    header, rows = _read_csv(os.path.join(dir_out, 'q_buzzdetect.csv'))
    starts = [float(r[0]) for r in rows]
    assert starts[:3] == [0.0, 0.24, 0.48]


def test_batched_dispatch_matches_unbatched(patched_models, tmp_path):
    """batch_chunks>1 stacks chunks from different files into one device
    call; results must equal the unbatched run exactly."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    for i in range(4):
        write_wav(os.path.join(dir_audio, f'b{i}.wav'),
                  make_tone(3.0, 16000, 180 + 30 * i), 16000)

    analyze(modelname='testmodel', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'plain'), chunklength=3.0,
            verbosity_print='ERROR')
    analyze(modelname='testmodel', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'batched'), chunklength=3.0,
            batch_chunks=4, n_streamers=4, verbosity_print='ERROR')

    for i in range(4):
        a = open(os.path.join(tmp_path, 'plain', f'b{i}_buzzdetect.csv')).read()
        b = open(os.path.join(tmp_path, 'batched', f'b{i}_buzzdetect.csv')).read()
        assert a == b, f'file b{i} differs'


def test_failed_chunk_leaves_resumable_partial(patched_models, tmp_path,
                                               monkeypatch):
    """A chunk whose inference fails must leave the file as a resumable
    partial — never a finalized result with a silent hole."""
    from buzzdetect_tpu import config as cfg2
    from buzzdetect_tpu.analysis import analyze

    d = tmp_path / 'models' / 'flaky'
    d.mkdir(parents=True)
    (d / 'config_model.json').write_text(json.dumps(
        {'classes': ['a', 'b'], 'embeddername': 'yamnet',
         'digits_results': 2}))
    (d / 'model.py').write_text(
        'import numpy as np\n'
        'from buzzdetect_tpu.models.registry import BaseModel\n\n'
        'class Flaky(BaseModel):\n'
        '    modelname = "flaky"\n'
        '    def initialize(self):\n'
        '        pass\n'
        '    def predict(self, samples):\n'
        '        if len(samples) < 30000:\n'
        '            raise RuntimeError("boom on the short tail chunk")\n'
        '        return np.zeros((2, 2))\n')
    monkeypatch.setattr(cfg2, 'DIR_MODELS', str(tmp_path / 'models'))

    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    # 3 s file in 1.92 s chunks -> chunk 2 is short (1.08 s) and will fail
    write_wav(os.path.join(dir_audio, 'f.wav'), make_tone(3.0, 16000), 16000)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='flaky', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    # the good chunk's rows are checkpointed; the file is NOT finalized
    assert os.path.exists(os.path.join(dir_out, 'f_buzzpart.csv'))
    assert not os.path.exists(os.path.join(dir_out, 'f_buzzdetect.csv'))


def test_doctor_all_checks_pass(patched_models, monkeypatch, capsys):
    from buzzdetect_tpu import doctor
    ret = doctor.main('testmodel')
    out = capsys.readouterr().out
    assert ret == 0, out
    assert 'all checks passed' in out
    # the fixture bundle is seeded-init: doctor must flag it loudly rather
    # than print a clean green light (false field-readiness signal)
    assert 'UNTRAINED WEIGHTS' in out
    assert 'WITH WARNINGS' in out


def test_doctor_rejects_unknown_flags():
    """A typo like --jsn must error (exit 2, named on stderr), not fall
    back to human output with exit 0 — a supervisor would misread its
    json.loads failure of the non-JSON stdout as a broken machine."""
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, '-m', 'buzzdetect_tpu.doctor', '--jsn'],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 2, (r.returncode, r.stdout, r.stderr)
    assert 'unknown flag' in r.stderr and '--jsn' in r.stderr


def test_doctor_json_mode(patched_models, capsys):
    """--json emits ONE machine-readable object (fleet-health counterpart
    of the run summary) with the same exit-code contract; human lines are
    suppressed so the output parses as-is."""
    from buzzdetect_tpu import doctor
    ret = doctor.main('testmodel', json_mode=True)
    out = capsys.readouterr().out
    rec = json.loads(out)  # the whole stdout must be the one JSON object
    assert ret == 0
    assert rec['schema'] == 'buzzdetect_doctor/1'
    assert rec['ok'] is True
    names = {c['name'] for c in rec['checks']}
    assert {'jax import', 'jax backend', 'native decoder (libav)',
            'codec round-trip', 'model bundle', 'end-to-end inference',
            'threshold calibration (metrics table)'} <= names
    assert all(c['ok'] for c in rec['checks'] if not c.get('skipped'))
    # the seeded-init bundle must surface in warnings, not vanish
    assert any('UNTRAINED WEIGHTS' in w for w in rec['warnings'])


def test_resume_reference_written_partial(patched_models, tmp_path):
    """Result folders written by the REFERENCE implementation must be
    resumable: its pandas-written partials carry full-precision floats and
    the same schema. (Reference writes e.g. '0.96,-1.2300000000000002'.)"""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.manifest import build_manifest, write_manifest
    dir_out = str(tmp_path / 'out')
    os.makedirs(dir_out)

    partial = os.path.join(dir_out, 'tone_a_buzzpart.csv')
    with open(partial, 'w') as f:
        f.write('start,' + ','.join(f'activation_{c}' for c in CLASSES) + '\n')
        # pandas-style full-precision float reprs
        f.write('0.96,' + ','.join(['-1.2300000000000002'] * len(CLASSES))
                + '\n')
        f.write('1.92,' + ','.join(['0.10000000000000003'] * len(CLASSES))
                + '\n')
    write_manifest(dir_out, build_manifest('testmodel', 1.0, None, CLASSES))

    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR')

    header, rows = _read_csv(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))
    starts = [float(r[0]) for r in rows]
    assert starts == sorted(starts)
    # the imported rows survived untouched
    preserved = [r for r in rows if r[1] == '-1.2300000000000002']
    assert len(preserved) == 1
    assert not os.path.exists(partial)


@pytest.mark.parametrize('codec,ext', [
    ('libmp3lame', 'mp3'),   # SEEK_PTS + bit-reservoir preroll
    ('ac3', 'mts'),          # SEEK_REOPEN: fresh-open + count-forward
    ('wmav2', 'wma'),        # SEEK_REOPEN: pts drift makes pts untrustable
])
def test_resume_seeks_into_compressed_codec(patched_models, tmp_path,
                                            codec, ext):
    """Interrupt/resume whose gap-fill seeks into a COMPRESSED file
    mid-stream: the resume rides the native seek machinery (preroll for
    mp3, reopen-and-count for ac3/wma — the invariants the reference
    drivers document in `src/stream/drivers/{mp4,wma,mts}.py`) and must
    reproduce the uninterrupted run byte for byte. The WAV soak covers
    the coverage algebra; this covers the seek-accuracy integration."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.audio.ffi import encode_fixture
    from buzzdetect_tpu.manifest import build_manifest, write_manifest
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    encode_fixture(os.path.join(dir_audio, f'rec.{ext}'),
                   codec, 44100, 2, 10.0)

    golden_dir = str(tmp_path / 'golden')
    analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=golden_dir,
            chunklength=2.0, verbosity_print='ERROR')
    golden = open(os.path.join(golden_dir, 'rec_buzzdetect.csv')).read()
    lines = golden.splitlines(keepends=True)
    assert len(lines) > 8  # header + ~10 frames

    # simulate an interrupted run: one complete middle chunk already on
    # disk (chunklength 2.0 rounds to 1.92 s = frames {1.92, 2.88}), so the
    # resume decodes [0, 1.92) and then SEEKS to 3.84 s for the tail gap.
    # The covered span must be chunk-grid-aligned: a partial chunk would
    # re-chunk the file on different boundaries, and boundary frames
    # legitimately score differently (their patch tail sees zero padding
    # instead of the next chunk's audio — same behavior as the reference's
    # pad_waveform)
    resume_dir = str(tmp_path / 'resume')
    os.makedirs(resume_dir)
    with open(os.path.join(resume_dir, 'rec_buzzpart.csv'), 'w') as f:
        f.write(lines[0])
        f.writelines(lines[3:5])
    write_manifest(resume_dir, build_manifest('testmodel', 1.0, None,
                                              CLASSES))
    analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=resume_dir,
            chunklength=2.0, verbosity_print='ERROR')
    resumed = open(os.path.join(resume_dir, 'rec_buzzdetect.csv')).read()
    assert resumed == golden


def test_profile_dir_captures_trace(patched_models, tmp_path):
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'p.wav'), make_tone(2.0, 16000), 16000)
    profile_dir = str(tmp_path / 'trace')
    analyze(modelname='testmodel', dir_audio=dir_audio,
            dir_out=str(tmp_path / 'out'), chunklength=2.0,
            verbosity_print='ERROR', profile_dir=profile_dir)
    # a trace directory with at least one event file was produced
    found = [f for root, _d, files in os.walk(profile_dir) for f in files]
    assert found, 'no profiler artifacts written'


def test_stream_scores_api(patched_models, tmp_path):
    """The notebook API matches the pipeline's CSV output."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.api import score_file
    from buzzdetect_tpu.models.registry import load_model

    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 's.wav'), make_tone(4.0, 16000), 16000)
    dir_out = str(tmp_path / 'out')
    analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
            chunklength=2.0, verbosity_print='ERROR')
    _header, rows = _read_csv(os.path.join(dir_out, 's_buzzdetect.csv'))

    model = load_model('testmodel', initialize=True)
    starts, scores, classes = score_file(os.path.join(dir_audio, 's.wav'),
                                         model=model, chunklength=2.0)
    assert classes == CLASSES
    assert len(starts) == len(rows)
    np.testing.assert_allclose(starts, [float(r[0]) for r in rows])
    csv_scores = np.array([[float(v) for v in r[1:]] for r in rows])
    np.testing.assert_allclose(np.round(scores, 2), csv_scores, atol=0.011)


def test_api_framehop_conflict_with_preloaded_model(patched_models, tmp_path):
    """framehop_prop + a pre-loaded model must agree — silently ignoring the
    argument would return scores at the wrong stride."""
    from buzzdetect_tpu.api import score_file, stream_scores
    from buzzdetect_tpu.models.registry import load_model

    path = str(tmp_path / 'f.wav')
    write_wav(path, make_tone(3.0, 16000), 16000)
    model = load_model('testmodel', initialize=True)  # framehop 1.0

    with pytest.raises(ValueError, match='framehop_prop'):
        score_file(path, framehop_prop=0.5, model=model)
    with pytest.raises(ValueError, match='framehop_prop'):
        next(iter(stream_scores(path, framehop_prop=0.5, model=model)))
    # matching value is accepted; omitted is accepted
    starts, _s, _c = score_file(path, framehop_prop=1.0, model=model)
    assert len(starts) > 0


def test_stream_scores_reads_streamer_sample_spans(tmp_path):
    """stream_scores must read int(t1*rate)-int(t0*rate) samples per chunk
    (the pipeline streamer's span math): the subtraction form
    int((t1-t0)*rate) loses one boundary sample on the 1.13 s
    counterexample's final chunk, scoring different samples than
    analyze() does for the same file."""
    from buzzdetect_tpu.api import stream_scores

    path = str(tmp_path / 'odd.wav')
    write_wav(path, make_tone(1.13, 16000), 16000)

    reads = []

    class Emb:
        framelength_s = 0.96
        framehop_s = 0.96
        samplerate = 16000
        digits_time = 2
        framehop_prop = 1.0

    class Capturing:
        embedder = Emb()

        def predict(self, samples):
            reads.append(len(samples))
            return np.zeros((max(1, len(samples) // 15360), 3), np.float32)

    list(stream_scores(path, model=Capturing(), chunklength=0.96))
    assert reads == [15360, 2720], \
        f'chunk sample spans diverge from the streamer: {reads}'


def test_compressed_formats_through_pipeline(patched_models, tmp_path):
    """m4a + wma + ogg files flow through the full pipeline to finalized
    results (compressed-codec decode inside the worker stack)."""
    from buzzdetect_tpu.analysis import analyze
    from buzzdetect_tpu.audio.ffi import encode_fixture
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    encode_fixture(os.path.join(dir_audio, 'a.m4a'), 'aac', 44100, 2, 3.0)
    encode_fixture(os.path.join(dir_audio, 'b.wma'), 'wmav2', 44100, 1, 3.0)
    encode_fixture(os.path.join(dir_audio, 'c.ogg'), 'libvorbis', 48000, 1, 3.0)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    for ident in ('a', 'b', 'c'):
        path = os.path.join(dir_out, f'{ident}_buzzdetect.csv')
        assert os.path.exists(path), ident
        _h, rows = _read_csv(path)
        assert len(rows) >= 3


def test_framehop_above_one_runs_with_warning(patched_models, tmp_path):
    """framehop > 1 (sparse sampling) is valid but leaves inter-frame gaps;
    the run must complete and emit the documented warning."""
    from buzzdetect_tpu.analysis import analyze
    dir_audio = str(tmp_path / 'audio')
    os.makedirs(dir_audio)
    write_wav(os.path.join(dir_audio, 'sparse.wav'), make_tone(6.0, 16000),
              16000)
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=dir_audio, dir_out=dir_out,
                chunklength=6.0, framehop_prop=1.5, verbosity_print='ERROR')
    assert a.coordinator.end_reason == 'completed'
    # a results file exists (partial or complete) with 1.44 s stride
    produced = [f for f in os.listdir(dir_out) if f.startswith('sparse')
                and f.endswith('.csv')]
    assert produced
    _h, rows = _read_csv(os.path.join(dir_out, produced[0]))
    starts = [float(r[0]) for r in rows]
    assert starts[1] - starts[0] == pytest.approx(1.44)
    # the warning was logged to the run's log file
    logs = [f for f in os.listdir(dir_out) if f.endswith('.log')]
    text = open(os.path.join(dir_out, logs[0])).read()
    assert 'framehop > 1' in text


def test_package_exports_are_functions():
    """Regression: the analyze submodule import must never shadow the
    analyze() function at the package level (CPython sets submodules as
    package attributes during from-imports)."""
    import importlib
    import buzzdetect_tpu
    importlib.reload(buzzdetect_tpu)
    from buzzdetect_tpu import analyze as first
    import buzzdetect_tpu.analysis  # noqa: F401 — forces the shadow attr
    from buzzdetect_tpu import analyze as second
    assert callable(first) and callable(second)
    assert first is second
    # attribute access on the package always yields the function (the
    # orchestrator module is named `analysis`, so no name collision exists)
    assert callable(buzzdetect_tpu.analyze)


def test_mulaw_transfer_end_to_end(patched_models, tmp_path):
    """analyze(transfer_dtype='mulaw') produces scores within one rounding
    digit of the float32 wire — the 8-bit wire format is usable end to end."""
    from buzzdetect_tpu.analysis import analyze

    out_f32 = str(tmp_path / 'f32')
    out_mu = str(tmp_path / 'mu')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=out_f32, chunklength=2.0, verbosity_print='ERROR',
            transfer_dtype='float32')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=out_mu, chunklength=2.0, verbosity_print='ERROR',
            transfer_dtype='mulaw')

    import csv

    def read_scores(path):
        with open(path) as f:
            rows = list(csv.reader(f))
        return np.array([[float(v) for v in r] for r in rows[1:]])

    # noise-like audio (the field-recording case): mu-law's ~-48 dB noise
    # floor sits below the signal in every mel band, so scores barely move
    a = read_scores(os.path.join(out_f32, 'noise_buzzdetect.csv'))
    b = read_scores(os.path.join(out_mu, 'noise_buzzdetect.csv'))
    assert a.shape == b.shape
    np.testing.assert_allclose(b[:, 0], a[:, 0])  # timestamps exact
    assert np.abs(b[:, 1:] - a[:, 1:]).max() <= 0.15

    # synthetic pure tones are the worst case: most mel bands are digitally
    # silent, so the quantization noise floor dominates log(mel + 1e-3)
    # there and logits move visibly — documented limitation of the 8-bit
    # wire (docs/tuning.md); assert sane, not tight
    a = read_scores(os.path.join(out_f32, 'tone_a_buzzdetect.csv'))
    b = read_scores(os.path.join(out_mu, 'tone_a_buzzdetect.csv'))
    assert a.shape == b.shape
    assert np.abs(b[:, 1:] - a[:, 1:]).max() <= 1.5


def test_transfer_dtype_validation():
    from buzzdetect_tpu.validation import validate_map
    assert validate_map['transfer_dtype']('mulaw').valid
    assert validate_map['transfer_dtype'](None).valid
    assert not validate_map['transfer_dtype']('int8').valid


def test_keyboard_interrupt_before_writer_launch(patched_models, tmp_path,
                                                 monkeypatch):
    """A Ctrl-C landing before the writer thread exists (e.g. during a slow
    queue_assignments over a huge tree) must produce an orderly interrupted
    stop, not an AttributeError on thread_writer=None in the handler."""
    from buzzdetect_tpu.analysis import Analyzer

    a = Analyzer(modelname='testmodel', dir_audio=patched_models['audio'],
                 dir_out=str(tmp_path / 'out'), verbosity_print='ERROR')

    def boom():
        raise KeyboardInterrupt

    monkeypatch.setattr(a, 'queue_assignments', boom)
    a.run()  # must not raise
    assert a.coordinator.end_reason == 'interrupted'
    assert a.thread_writer is None


def test_analyze_single_file_path(patched_models, tmp_path):
    """dir_audio may be a single FILE (superset of the reference, which
    only walks directories): just that recording is analyzed, the ident is
    its basename, and the result matches a directory-mode run of the same
    file byte for byte."""
    from buzzdetect_tpu.analysis import analyze
    path = os.path.join(patched_models['audio'], 'tone_a.wav')
    dir_out = str(tmp_path / 'out')
    a = analyze(modelname='testmodel', dir_audio=path, dir_out=dir_out,
                chunklength=2.0, verbosity_print='ERROR')
    assert a.coordinator.end_reason in ('fully analyzed', 'completed')
    result = os.path.join(dir_out, 'tone_a_buzzdetect.csv')
    assert os.path.exists(result)
    # no sibling from the same directory leaked in
    assert not os.path.exists(os.path.join(dir_out, 'noise_buzzdetect.csv'))

    dir_ref = str(tmp_path / 'ref_out')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_ref, chunklength=2.0, verbosity_print='ERROR')
    assert (open(result).read()
            == open(os.path.join(dir_ref, 'tone_a_buzzdetect.csv')).read())


def test_analyze_single_file_unsupported_format(patched_models, tmp_path):
    """A file path with an unsupported extension exits with an explicit
    diagnostic, not a silent empty output directory."""
    from buzzdetect_tpu.analysis import analyze
    bogus = tmp_path / 'notes.txt'
    bogus.write_text('not audio')
    a = analyze(modelname='testmodel', dir_audio=str(bogus),
                dir_out=str(tmp_path / 'out'), chunklength=2.0,
                verbosity_print='ERROR')
    # a distinct FATAL end_reason: the watch loop's healthy set includes
    # 'no files' (an empty recorder directory heals), but a wrong
    # extension never can — a watcher must stop, not warn forever
    assert a.coordinator.end_reason == 'unsupported input'

    a = analyze(modelname='testmodel', dir_audio=str(bogus),
                dir_out=str(tmp_path / 'out2'), chunklength=2.0,
                verbosity_print='ERROR', watch=True, watch_cycles=50)
    assert a.coordinator.end_reason == 'unsupported input'


def test_analyze_backend_timeout(patched_models, tmp_path, monkeypatch):
    """analyze(backend_timeout=...) turns a dead accelerator link into a
    fast loud error instead of a silent forever-hang at first dispatch
    (observed: tunneled-backend outages hang even jax.devices()). With a
    live backend the same preflight passes and the run proceeds."""
    import time
    from buzzdetect_tpu import utils
    from buzzdetect_tpu.analysis import analyze

    monkeypatch.setattr(utils, 'PREFLIGHT_CODE',
                        'import time; time.sleep(999)')
    t0 = time.time()
    with pytest.raises(RuntimeError, match='backend preflight failed'):
        analyze(modelname='testmodel', dir_audio=patched_models['audio'],
                dir_out=str(tmp_path / 'out'), backend_timeout=2,
                verbosity_print='ERROR')
    assert time.time() - t0 < 60, 'preflight did not bound the hang'
    assert not os.path.exists(tmp_path / 'out' / 'buzzdetect_manifest.json'),\
        'a failed preflight must not start the run'

    monkeypatch.undo()
    monkeypatch.setattr(cfg, 'DIR_MODELS', patched_models['models'])
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=str(tmp_path / 'out'), backend_timeout=120,
            verbosity_print='ERROR')
    assert any(f.endswith(cfg.SUFFIX_RESULT_COMPLETE)
               for f in os.listdir(tmp_path / 'out'))


def test_analyze_backend_timeout_must_be_positive(tmp_path):
    """A non-positive backend_timeout is a caller bug and must fail as
    one — fed to the preflight it would expire instantly and be
    misdiagnosed as a dead accelerator (same contract as stall_timeout)."""
    from buzzdetect_tpu.analysis import analyze
    for bad in (0, -5):
        with pytest.raises(ValueError, match='backend_timeout must be '
                                             'positive'):
            analyze(modelname='whatever', dir_audio=str(tmp_path),
                    dir_out=str(tmp_path / 'out'), backend_timeout=bad)


def test_doctor_survives_unreachable_backend(patched_models, monkeypatch,
                                             capsys):
    """The triage tool must DIAGNOSE a hung device backend, not inherit
    the hang (a dead tunnel stalls jax.devices() forever): the preflight
    probe times out, device-bound checks are skipped with a reason, and
    host-side checks still run."""
    from buzzdetect_tpu import doctor
    monkeypatch.setattr(doctor, '_PREFLIGHT_CODE',
                        'import time; time.sleep(999)')
    monkeypatch.setenv('BUZZDETECT_DOCTOR_TIMEOUT', '2')
    ret = doctor.main('testmodel')
    out = capsys.readouterr().out
    assert ret == 1
    assert 'backend unreachable' in out or 'no dispatch completed' in out
    assert '[skip] end-to-end inference' in out
    # host-side stack still checked
    assert '[ok]   native decoder' in out
    assert '[ok]   threshold calibration' in out
    assert 'SOME CHECKS FAILED' in out


def test_live_alerts_end_to_end(patched_models, tmp_path):
    """alert_classes= announces detections in the run's log channel the
    moment scores land; result files are unaffected; misconfiguration
    fails fast at analyze() time, not per-chunk inside the writer."""
    from buzzdetect_tpu.analysis import analyze

    dir_out = str(tmp_path / 'out')
    # threshold below every activation: every chunk alerts
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_out, chunklength=2.0, verbosity_print='ERROR',
            alert_classes=['ins_buzz'], alert_threshold=-1e9)
    logs = [p for p in os.listdir(dir_out) if p.endswith('.log')]
    assert logs
    text = ''.join(open(os.path.join(dir_out, p)).read() for p in logs)
    assert 'DETECTED ins_buzz in tone_a' in text
    assert '(peak activation' in text
    # alerts never change the result files
    assert os.path.exists(os.path.join(dir_out, 'tone_a_buzzdetect.csv'))

    # threshold above every activation: run is alert-silent
    dir_quiet = str(tmp_path / 'quiet')
    analyze(modelname='testmodel', dir_audio=patched_models['audio'],
            dir_out=dir_quiet, chunklength=2.0, verbosity_print='ERROR',
            alert_classes=['ins_buzz'], alert_threshold=1e9)
    text = ''.join(open(os.path.join(dir_quiet, p)).read()
                   for p in os.listdir(dir_quiet) if p.endswith('.log'))
    assert 'DETECTED' not in text

    # alert_threshold defaults to the precision-calibrated detection
    # threshold when one exists (the bundle carries a metrics table when
    # the reference snapshot provides one)
    if os.path.exists(
            '/root/reference/models/model_general_v3/tests/metrics.csv'):
        dir_det = str(tmp_path / 'det')
        analyze(modelname='testmodel', dir_audio=patched_models['audio'],
                dir_out=dir_det, chunklength=2.0, verbosity_print='ERROR',
                precision=0.95, alert_classes=['ins_buzz'])
        assert os.path.exists(os.path.join(dir_det,
                                           'tone_a_buzzdetect.csv'))

    # detections mode with an explicit alert_threshold different from the
    # calibrated detections threshold warns: alerts and d_ rows will
    # disagree by design
    if os.path.exists(
            '/root/reference/models/model_general_v3/tests/metrics.csv'):
        with pytest.warns(UserWarning, match='differs from the detections'):
            analyze(modelname='testmodel',
                    dir_audio=patched_models['audio'],
                    dir_out=str(tmp_path / 'mismatch'), chunklength=2.0,
                    verbosity_print='ERROR', precision=0.95,
                    alert_classes=['ins_buzz'], alert_threshold=-1e9)

    # alerting on a class the archive won't record still works (live
    # monitoring is the point) but warns: those alerts can't be re-derived
    # from the result files afterward
    dir_un = str(tmp_path / 'unarchived')
    with pytest.warns(UserWarning, match='not archived'):
        analyze(modelname='testmodel', dir_audio=patched_models['audio'],
                dir_out=dir_un, chunklength=2.0, verbosity_print='ERROR',
                classes_out=['ins_buzz'],
                alert_classes=['frog'], alert_threshold=-1e9)
    text = ''.join(open(os.path.join(dir_un, p)).read()
                   for p in os.listdir(dir_un) if p.endswith('.log'))
    assert 'DETECTED frog' in text
    # the warning ALSO rides the run's log channel: a GUI child's stderr is
    # invisible, so the log queue (pane + .log file) must carry it
    assert 'not archived' in text

    # misconfigurations fail fast
    common = dict(modelname='testmodel', dir_audio=patched_models['audio'],
                  dir_out=str(tmp_path / 'bad'), verbosity_print='ERROR')
    with pytest.raises(ValueError, match='alert_classes'):
        analyze(alert_classes=['not_a_class'], alert_threshold=0.0, **common)
    with pytest.raises(ValueError, match='threshold'):
        analyze(alert_classes=['ins_buzz'], **common)  # nothing to calibrate
    with pytest.raises(ValueError, match='alert_classes'):
        analyze(alert_threshold=0.0, **common)  # classes missing
    with pytest.raises(ValueError, match='empty'):
        analyze(alert_classes=[], alert_threshold=0.0, **common)


def test_generator_arguments_materialized(patched_models):
    """classes_out / alert_classes given as one-shot iterators must be
    materialized before the emptiness/typo scans — exhaustion used to
    yield zero-column result files and silently disabled alerts."""
    from buzzdetect_tpu.analysis import Analyzer
    an = Analyzer(modelname='testmodel',
                  classes_out=iter(['ins_buzz', 'human']),
                  alert_classes=(c for c in ['ins_buzz']),
                  alert_threshold=0.5,
                  dir_audio=patched_models['audio'],
                  verbosity_print='ERROR')
    assert an.classes_out == ['ins_buzz', 'human']
    names, idxs, thr, _fl = an.alert
    assert names == ['ins_buzz']
    assert idxs == [CLASSES.index('ins_buzz')] and thr == 0.5


def test_bare_filename_log_path(patched_models, tmp_path, monkeypatch):
    """path_log without a directory component must not crash makedirs('')."""
    monkeypatch.chdir(tmp_path)
    from buzzdetect_tpu.analysis import Analyzer
    an = Analyzer(modelname='testmodel',
                  dir_audio=patched_models['audio'],
                  dir_out=str(tmp_path / 'out'),
                  path_log='run.log', verbosity_print='ERROR')
    an.run()
    assert (tmp_path / 'run.log').exists()
    assert an.coordinator.end_reason == 'completed'
