"""Training/eval subsystem tests: threshold sweep math, metrics.csv
round-trip through the runtime calibrator, label translation, class weights,
and result trimming."""

import os

import numpy as np
import pytest

from buzzdetect_tpu.train.evaluate import (threshold_sweep, evaluate_scores,
                                           write_metrics_csv)
from buzzdetect_tpu.train.data import (load_translation, translate_labels,
                                       class_weights_from_counts)


def test_threshold_sweep_perfect_separation():
    scores = np.array([-2.0, -1.5, -1.0, 1.0, 1.5, 2.0])
    labels = np.array([0, 0, 0, 1, 1, 1])
    m = threshold_sweep(scores, labels, thresholds=np.array([-1.2, 0.0]))
    # at threshold 0: all 3 positives detected, no false positives
    i = list(m['threshold']).index(0.0)
    assert m['precision'][i] == 1.0
    assert m['sensitivity'][i] == 1.0
    assert m['fpr'][i] == 0.0
    # at threshold -1.2: one false positive leaks in
    i = list(m['threshold']).index(-1.2)
    assert m['precision'][i] == pytest.approx(3 / 4)
    assert m['fpr'][i] == pytest.approx(1 / 3)


def test_metrics_roundtrip_to_calibrator(tmp_path, monkeypatch):
    """A sweep written by the evaluator must be consumable by the runtime's
    threshold calibration — the full capability the reference only ships as
    a static artifact."""
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.write.thresholds import calculate_threshold

    rng = np.random.default_rng(0)
    labels = rng.random(2000) < 0.3
    scores = np.where(labels, rng.normal(1.0, 1.0, 2000),
                      rng.normal(-1.0, 1.0, 2000))
    m = threshold_sweep(scores, labels)

    d = tmp_path / 'models' / 'em' / 'tests'
    write_metrics_csv(str(d / 'metrics.csv'), m)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(tmp_path / 'models'))

    precisions = m['precision']
    target = float(precisions[len(precisions) // 2].round(2))
    thr = calculate_threshold('em', target, tolerance=0.02)
    assert np.isfinite(thr)
    # the calibrated threshold must actually deliver ~the requested precision
    pred = scores > thr
    achieved = (pred & labels).sum() / pred.sum()
    assert abs(achieved - target) < 0.1


def test_evaluate_scores_selects_class():
    scores = np.zeros((10, 3))
    scores[:, 1] = np.linspace(-1, 1, 10)
    labels = np.zeros((10, 3))
    labels[5:, 1] = 1
    m = evaluate_scores(scores, labels, ['a', 'ins_buzz', 'c'])
    assert len(m['threshold']) > 0
    assert m['precision'].max() == 1.0


def test_translation_and_multihot(tmp_path):
    path = tmp_path / 'translation.csv'
    path.write_text('raw,class\nbee,ins_buzz\nbumble,ins_buzz\n'
                    'car,mech_auto\njunk,drop\n')
    tr = load_translation(str(path))
    assert tr['bee'] == 'ins_buzz'
    assert tr['junk'] is None

    classes = ['ins_buzz', 'mech_auto']
    hot = translate_labels([['bee'], ['car', 'bumble'], ['junk'], ['what']],
                           tr, classes)
    np.testing.assert_array_equal(hot, [[1, 0], [1, 1], [0, 0], [0, 0]])


def test_class_weights_from_counts():
    w = class_weights_from_counts([100, 100, 10])
    assert w[2] > w[0]
    assert w.mean() == pytest.approx(1.0)


def test_trim_directory_roundtrip(tmp_path):
    from buzzdetect_tpu.write.trim import (trim_directory, read_trimmed,
                                           SUFFIX_TRIMMED)
    d = tmp_path / 'results'
    d.mkdir()
    rng = np.random.default_rng(0)
    n = 2000
    starts = np.arange(n) * 0.96
    acts = rng.normal(-2, 1, (n, 2)).round(2)
    with open(d / 'x_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz,activation_human\n')
        for s, (a, b) in zip(starts, acts):
            f.write(f'{round(s, 2)},{a},{b}\n')

    n_files, before, after = trim_directory(str(d),
                                            classes_keep=('ins_buzz',),
                                            decimals=1)
    assert n_files == 1
    assert before / after > 5  # strong compression
    got_starts, cols = read_trimmed(str(d / ('x' + SUFFIX_TRIMMED)))
    assert list(cols) == ['activation_ins_buzz']
    np.testing.assert_allclose(got_starts, starts, atol=0.01)
    np.testing.assert_allclose(cols['activation_ins_buzz'], acts[:, 0],
                               atol=0.051)


def test_trim_start_grid_exact_past_36h(tmp_path):
    """Archived start times must round-trip EXACTLY at any recording
    length: a float32 grid drifts past the 2-decimal rounding half-step
    beyond ~36 h (t > 131072 s), so starts are stored as scaled integers
    of the CSV's rounded column. Old float32 archives still read."""
    from buzzdetect_tpu.write.trim import (trim_directory, read_trimmed,
                                           SUFFIX_TRIMMED)
    d = tmp_path / 'results'
    d.mkdir()
    # a 40 h recording's tail: starts far past the float32-exact range
    starts = [round(140000.0 + k * 0.96, 2) for k in range(50)]
    with open(d / 'long_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n')
        for s in starts:
            f.write(f'{s},-1.23\n')
    trim_directory(str(d), classes_keep=('ins_buzz',), decimals=1)
    got, _cols = read_trimmed(str(d / ('long' + SUFFIX_TRIMMED)))
    assert got.tolist() == starts, 'start grid not exact past 36 h'
    assert float(np.float32(starts[1])) != starts[1], \
        'fixture no longer exercises the float32-inexact range'

    # pre-scaled-grid archives (starts stored float32) still read
    np.savez_compressed(d / ('old' + SUFFIX_TRIMMED),
                        starts=np.array([0.0, 0.96], np.float32),
                        decimals=np.int16(1),
                        activation_ins_buzz=np.array([-12, -10], np.int16))
    got_old, cols_old = read_trimmed(str(d / ('old' + SUFFIX_TRIMMED)))
    np.testing.assert_allclose(got_old, [0.0, 0.96], atol=1e-6)
    np.testing.assert_allclose(cols_old['activation_ins_buzz'],
                               [-1.2, -1.0], atol=1e-9)


def test_trim_results_cli(tmp_path):
    """The trim tool compacts a directory from the command line and is
    honest about expansion on tiny files."""
    import subprocess
    import sys as _sys
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'trim_results.py')
    d = tmp_path / 'results'
    d.mkdir()
    with open(d / 'big_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz,activation_human\n')
        for k in range(3000):
            f.write(f'{round(k * 0.96, 2)},-1.23,-0.5\n')
    proc = subprocess.run(
        [_sys.executable, tool, '--dir_results', str(d),
         '--remove_original'],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert 'trimmed 1 file(s)' in proc.stdout
    assert 'EXPANDED' not in proc.stdout  # 3000 rows compress well
    assert not (d / 'big_buzzdetect.csv').exists()
    assert (d / 'big_buzztrim.npz').exists()

    # empty directory: loud error, not a silent 0-file success
    proc = subprocess.run(
        [_sys.executable, tool, '--dir_results', str(tmp_path / 'nope')],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0 and 'no finalized' in proc.stderr


def test_embed_directory_roundtrip(tmp_path, monkeypatch):
    """Corpus embedding extraction: correct frame grid, resumable skips."""
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from buzzdetect_tpu.train.embed_corpus import (embed_directory,
                                                   load_embeddings)
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'em'), classes=['a', 'b'], seed=1)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    write_wav(dir_audio / 'x.wav', make_tone(3.0, 16000), 16000)

    out = tmp_path / 'emb'
    written = embed_directory(str(dir_audio), str(out), modelname='em',
                              log=lambda *_: None)
    assert len(written) == 1
    starts, emb = load_embeddings(written[0])
    assert emb.shape[1] == 1024
    assert len(starts) == len(emb)
    assert starts[0] == 0.0
    import numpy as np
    np.testing.assert_allclose(np.diff(starts), 0.96, atol=1e-6)

    # second call skips (resumable)
    assert embed_directory(str(dir_audio), str(out), modelname='em',
                           log=lambda *_: None) == []


def test_embed_directory_single_file(tmp_path, monkeypatch):
    """A single recording as dir_audio — same superset as
    analyze(dir_audio=<file>): ident is the basename, and an unsupported
    extension fails loudly instead of 'embedded 0 files'."""
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from buzzdetect_tpu.train.embed_corpus import (embed_directory,
                                                   load_embeddings)
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'em'), classes=['a', 'b'], seed=1)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))

    wav = tmp_path / 'solo.wav'
    write_wav(wav, make_tone(2.0, 16000), 16000)
    out = tmp_path / 'emb'
    # RELATIVE path: build_ident's containment check compares prefixes, so
    # an un-abspathed file against an absolute root would leak the
    # directory into the ident ('sub/solo' instead of 'solo')
    monkeypatch.chdir(tmp_path)
    written = embed_directory('solo.wav', str(out), modelname='em',
                              log=lambda *_: None)
    assert [os.path.basename(p) for p in written] == [
        'solo_embeddings.npz']
    assert os.path.dirname(os.path.relpath(written[0], out)) == '', \
        'relative input leaked a directory component into the ident'
    starts, emb = load_embeddings(written[0])
    assert emb.shape == (len(starts), 1024) and len(starts) > 0
    # float64 grid: float32 spacing exceeds the 0.005 rounding half-step
    # beyond ~36 h, which would break byte parity on days-long recordings
    assert starts.dtype == np.float64

    bogus = tmp_path / 'notes.txt'
    bogus.write_text('not audio')
    with pytest.raises(ValueError, match='unsupported audio format'):
        embed_directory(str(bogus), str(tmp_path / 'emb2'), modelname='em',
                        log=lambda *_: None)


def test_annotations_to_frame_labels():
    from buzzdetect_tpu.train.annotations import frames_to_labels
    starts = np.arange(10) * 0.96
    events = [(1.0, 2.5, 'bee'), (5.0, 5.05, 'human')]
    labels = frames_to_labels(
        starts, events, ['ins_buzz', 'human'],
        translation={'bee': 'ins_buzz'}, overlap_prop=0.2)
    # frames at 0.96 and 1.92 overlap [1.0, 2.5) by >= 0.192s
    assert labels[1, 0] == 1 and labels[2, 0] == 1
    assert labels[0, 0] == 0 and labels[3, 0] == 0
    # a 50 ms event never reaches the 0.192 s overlap bar
    assert labels[:, 1].sum() == 0


def test_load_events(tmp_path):
    from buzzdetect_tpu.train.annotations import load_events
    p = tmp_path / 'ann.csv'
    p.write_text('file,start,end,label\nrec1,0.5,2.0,bee\nrec1,4,5,car\n'
                 'rec2,1,2,bee\n')
    ev = load_events(str(p))
    assert len(ev['rec1']) == 2
    assert ev['rec2'] == [(1.0, 2.0, 'bee')]


def test_train_model_tool_end_to_end(tmp_path, monkeypatch):
    """The full offline loop: corpus + annotations -> trained bundle that
    the analyzer can load and run."""
    import subprocess, sys, json
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'base'), classes=['x'], seed=2)

    dir_audio = tmp_path / 'corpus'
    dir_audio.mkdir()
    # two clips: a buzzy tone and noise
    write_wav(dir_audio / 'buzzy.wav', make_tone(4.0, 16000, 220), 16000)
    write_wav(dir_audio / 'quiet.wav',
              (np.random.default_rng(1).standard_normal(4 * 16000) * 0.02
               ).astype(np.float32), 16000)
    ann = tmp_path / 'events.csv'
    ann.write_text('ident,start,end,label\nbuzzy,0,4,ins_buzz\n')

    env = dict(os.environ, BUZZDETECT_DIR_MODELS=str(dir_models),
               JAX_PLATFORMS='cpu')
    ret = subprocess.run(
        [sys.executable, 'tools/train_model.py', '--name', 'trained',
         '--dir-audio', str(dir_audio), '--annotations', str(ann),
         '--classes', 'ins_buzz', 'ambient_background',
         '--base-model', 'base', '--epochs', '5', '--holdout', '0'],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert ret.returncode == 0, ret.stdout + ret.stderr

    # the produced bundle loads and predicts
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))
    from buzzdetect_tpu.models.registry import load_model
    model = load_model('trained', initialize=True)
    out = model.predict(make_tone(2.0, 16000, 220))
    assert out.shape[1] == 2


def test_read_results(tmp_path):
    from buzzdetect_tpu.write.trim import read_results
    p = tmp_path / 'x_buzzdetect.csv'
    p.write_text('start,activation_ins_buzz,activation_human\n'
                 '0.0,-1.2,0.3\n0.96,0.5,-2.0\n')
    starts, cols = read_results(str(p))
    np.testing.assert_allclose(starts, [0.0, 0.96])
    np.testing.assert_allclose(cols['activation_ins_buzz'], [-1.2, 0.5])


def test_clip_extraction_and_full_train(tmp_path):
    """Full-model path: annotations -> labeled clips -> end-to-end train step
    reduces loss on real extracted audio."""
    from buzzdetect_tpu.train.clips import (clip_spans, build_clip_dataset,
                                            train_full_model)
    from tests.audio_fixtures import make_tone, write_wav

    # clip planning: positives tile the event, negatives avoid it
    spans = clip_spans([(1.0, 3.0, 'bee')], duration=10.0, clip_seconds=0.975,
                       negatives_per_positive=1.0)
    pos = [s for s in spans if s[1]]
    neg = [s for s in spans if not s[1]]
    # tiles at 1.0 and 1.975 overlap the event substantially; the third
    # tile at 2.95 would cover only a 0.05 s sliver (< the 0.2-overlap
    # rule) and is dropped — a positive label on 95% unannotated audio
    # would only add label noise
    assert len(pos) == 2
    assert len(neg) == 2
    # a short transient event still yields its clip (full containment
    # overrides the proportional rule)
    short = clip_spans([(5.0, 5.05, 'tick')], duration=10.0,
                       clip_seconds=0.975, negatives_per_positive=0.0)
    assert [s for s in short if s[1]] == [(5.0, ['tick'])]
    for start, _ in neg:
        assert start + 0.975 <= 1.0 or start >= 3.0

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    write_wav(dir_audio / 'rec.wav', make_tone(8.0, 16000, 220), 16000)
    clips, labels = build_clip_dataset(
        str(dir_audio), {'rec': [(0.5, 2.5, 'bee'), (5.0, 6.0, 'car')]},
        classes=['ins_buzz', 'mech_auto'],
        translation={'bee': 'ins_buzz', 'car': 'mech_auto'},
        log=lambda *_: None)
    assert clips.shape[1] == 15600
    assert labels.sum() > 0

    raw, head, losses = train_full_model(clips, labels, epochs=8,
                                         batch_size=4, learning_rate=1e-3,
                                         log=lambda *_: None)
    # single-batch losses are noisy (tiny batches, live BatchNorm):
    # compare epoch averages
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert raw['layer1/conv/kernel'].shape == (3, 3, 1, 32)
    assert head['head/kernel'].shape == (1024, 2)


def test_trim_survives_header_only_csv(tmp_path):
    """Regression: a header-only result CSV used to crash trim (max() on a
    zero-size array), aborting compaction for the whole directory."""
    from buzzdetect_tpu.write.trim import (trim_directory, read_trimmed,
                                           SUFFIX_TRIMMED)
    d = tmp_path / 'results'
    d.mkdir()
    with open(d / 'empty_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n')
    with open(d / 'real_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n0.0,-1.25\n0.96,-2.5\n')

    n_files, _before, _after = trim_directory(str(d), decimals=2)
    assert n_files == 2
    starts, cols = read_trimmed(str(d / ('empty' + SUFFIX_TRIMMED)))
    assert len(starts) == 0
    assert len(cols['activation_ins_buzz']) == 0
    starts, cols = read_trimmed(str(d / ('real' + SUFFIX_TRIMMED)))
    np.testing.assert_allclose(cols['activation_ins_buzz'], [-1.25, -2.5])


def test_train_full_model_rejects_empty_dataset():
    """Regression: zero clips used to reach range(..., 0) deep in the epoch
    loop; the public API must fail with a clear message instead."""
    from buzzdetect_tpu.train.clips import train_full_model
    clips = np.zeros((0, 15600), np.float32)
    labels = np.zeros((0, 3), np.float32)
    with pytest.raises(ValueError, match='no clips'):
        train_full_model(clips, labels, epochs=1)


def test_negative_only_files_contribute_clips(tmp_path):
    """Regression: negatives used to be sized per-file from that file's OWN
    positive count, so a file with no events — the standard way to provide
    background examples — contributed zero clips to full-model training.
    The budget is now corpus-wide, distributed by un-annotated duration."""
    from buzzdetect_tpu.train.clips import build_clip_dataset
    from tests.audio_fixtures import make_tone, write_wav

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    # annotated file: a tone, fully covered by one event -> no gaps at all
    write_wav(dir_audio / 'buzz.wav', make_tone(4.0, 16000, 220), 16000)
    # background-only file: silence, no annotations
    write_wav(dir_audio / 'amb.wav',
              np.zeros(int(4.0 * 16000), np.float32), 16000)

    clips, labels = build_clip_dataset(
        str(dir_audio), {'buzz': [(0.0, 4.0, 'ins_buzz')]},
        classes=['ins_buzz'], log=lambda *_: None)

    n_pos = int((labels.sum(axis=1) > 0).sum())
    n_neg = int((labels.sum(axis=1) == 0).sum())
    assert n_pos > 0
    # corpus-wide balance: negatives_per_positive defaults to 1.0
    assert n_neg == n_pos
    # every negative must come from the silent background file (the buzz
    # file is fully annotated): all-zero waveforms
    neg_clips = clips[labels.sum(axis=1) == 0]
    assert np.abs(neg_clips).max() == 0.0
    # and positives from the tone file are non-silent
    pos_clips = clips[labels.sum(axis=1) > 0]
    assert np.abs(pos_clips).max() > 0.1


def test_clip_dataset_negative_sampling_deterministic(tmp_path):
    """Same corpus + seed -> bit-identical dataset (negatives sample from
    per-file seeded rngs derived from (seed, ident), so training runs and
    their checkpoints reproduce across hosts and orderings)."""
    from buzzdetect_tpu.train.clips import build_clip_dataset
    from tests.audio_fixtures import make_tone, write_wav

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    rng = np.random.default_rng(3)
    # two same-duration background files: per-file seeds must differ, so
    # their negative offsets differ
    for name in ('a', 'b'):
        write_wav(dir_audio / f'{name}.wav',
                  (rng.standard_normal(8 * 16000) * 0.1).astype(np.float32),
                  16000)
    write_wav(dir_audio / 'ev.wav', make_tone(4.0, 16000, 200), 16000)
    events = {'ev': [(0.0, 2.0, 'ins_buzz')]}

    got1 = build_clip_dataset(str(dir_audio), events, classes=['ins_buzz'],
                              negatives_per_positive=2.0, seed=11,
                              log=lambda *_: None)
    got2 = build_clip_dataset(str(dir_audio), events, classes=['ins_buzz'],
                              negatives_per_positive=2.0, seed=11,
                              log=lambda *_: None)
    np.testing.assert_array_equal(got1[0], got2[0])
    np.testing.assert_array_equal(got1[1], got2[1])
    # a different seed moves the sampled negatives
    got3 = build_clip_dataset(str(dir_audio), events, classes=['ins_buzz'],
                              negatives_per_positive=2.0, seed=12,
                              log=lambda *_: None)
    assert got3[0].shape == got1[0].shape
    assert not np.array_equal(got3[0], got1[0])


def test_fully_annotated_corpus_underdelivers_negatives_loudly(tmp_path):
    """When NO file can host a negative (everything annotated), the
    allocator must deliver zero negatives and say so — not hand the budget
    to files that reject every sample (largest-remainder ties at quota 0
    used to do exactly that)."""
    from buzzdetect_tpu.train.clips import build_clip_dataset
    from tests.audio_fixtures import make_tone, write_wav

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    for name in ('a', 'b'):
        write_wav(dir_audio / f'{name}.wav', make_tone(3.0, 16000, 220),
                  16000)
    events = {n: [(0.0, 3.0, 'ins_buzz')] for n in ('a', 'b')}

    lines = []
    clips, labels = build_clip_dataset(
        str(dir_audio), events, classes=['ins_buzz'],
        log=lambda *a: lines.append(' '.join(str(x) for x in a)))

    assert int((labels.sum(axis=1) > 0).sum()) > 0
    assert int((labels.sum(axis=1) == 0).sum()) == 0
    assert any('under-delivered' in ln for ln in lines)


def test_subclip_background_file_hosts_one_padded_negative(tmp_path):
    """An entirely un-annotated file shorter than one clip still contributes
    exactly one zero-padded negative (and never duplicate clips — every
    sample in a sub-clip file starts at offset 0)."""
    from buzzdetect_tpu.train.clips import build_clip_dataset
    from tests.audio_fixtures import make_tone, write_wav

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    # positives source: fully annotated, so negatives can't come from it
    write_wav(dir_audio / 'buzz.wav', make_tone(6.0, 16000, 220), 16000)
    # background snippet SHORTER than the 0.975 s clip length
    write_wav(dir_audio / 'snip.wav',
              np.full(int(0.5 * 16000), 0.25, np.float32), 16000)

    clips, labels = build_clip_dataset(
        str(dir_audio), {'buzz': [(0.0, 6.0, 'ins_buzz')]},
        classes=['ins_buzz'], negatives_per_positive=3.0,
        log=lambda *_: None)

    neg = clips[labels.sum(axis=1) == 0]
    assert len(neg) == 1  # capped at one despite a 3x budget
    # first 0.5 s decoded, tail zero-padded
    n_body = int(0.5 * 16000)
    assert np.abs(neg[0, :n_body]).max() > 0.2
    assert np.abs(neg[0, n_body:]).max() == 0.0


def test_embed_directory_resume_is_crash_safe(tmp_path, monkeypatch):
    """embed_directory writes via temp+rename so its skip-if-exists resume
    never adopts a truncated npz from a killed run."""
    import buzzdetect_tpu.train.embed_corpus as ec

    calls = {}
    real_replace = os.replace

    def spy_replace(src, dst):
        calls['src'] = src
        calls['dst'] = dst
        return real_replace(src, dst)

    monkeypatch.setattr(ec.os, 'replace', spy_replace)
    monkeypatch.setattr(ec, 'embed_file',
                        lambda clf, path, chunklength: (
                            np.array([0.0]), np.zeros((1, 4), np.float32)))

    class FakeModel:
        classifier = object()

    monkeypatch.setattr('buzzdetect_tpu.models.registry.load_model',
                        lambda *a, **k: FakeModel())

    from tests.audio_fixtures import write_wav, make_tone
    d_audio = tmp_path / 'audio'
    d_audio.mkdir()
    write_wav(str(d_audio / 'a.wav'), make_tone(1.0, 16000), 16000)

    written = ec.embed_directory(str(d_audio), str(tmp_path / 'emb'))
    assert len(written) == 1
    assert calls['src'].endswith('.tmp.npz')  # temp-then-rename happened
    assert calls['dst'] == written[0]
    assert os.path.exists(written[0])
    assert not os.path.exists(calls['src'])
    # second run resumes: nothing re-embedded
    assert ec.embed_directory(str(d_audio), str(tmp_path / 'emb')) == []


def test_embed_directory_settings_pin(tmp_path, monkeypatch):
    """The embeddings manifest pins model+framehop: a rerun with different
    settings fails loudly, and a directory holding npz files but NO
    manifest (pre-pin or hand-mangled) is refused rather than certified
    as matching the requested settings."""
    import pytest
    import buzzdetect_tpu.train.embed_corpus as ec

    monkeypatch.setattr(ec, 'embed_file',
                        lambda clf, path, chunklength: (
                            np.array([0.0]), np.zeros((1, 4), np.float32)))

    class FakeModel:
        classifier = object()

    monkeypatch.setattr('buzzdetect_tpu.models.registry.load_model',
                        lambda *a, **k: FakeModel())

    from tests.audio_fixtures import write_wav, make_tone
    d_audio = tmp_path / 'audio'
    d_audio.mkdir()
    write_wav(str(d_audio / 'a.wav'), make_tone(1.0, 16000), 16000)

    d_emb = tmp_path / 'emb'
    written = ec.embed_directory(str(d_audio), str(d_emb), modelname='em',
                                 framehop_prop=1.0)
    assert len(written) == 1
    assert (d_emb / 'embeddings_manifest.json').exists()

    # same settings: resumes cleanly
    assert ec.embed_directory(str(d_audio), str(d_emb), modelname='em',
                              framehop_prop=1.0) == []
    # different framehop: the starts grid would not match — loud failure
    with pytest.raises(ValueError, match='conflicts'):
        ec.embed_directory(str(d_audio), str(d_emb), modelname='em',
                           framehop_prop=0.5)
    # different model: embeddings would come from another network
    with pytest.raises(ValueError, match='conflicts'):
        ec.embed_directory(str(d_audio), str(d_emb), modelname='other',
                           framehop_prop=1.0)

    # orphaned npz files (manifest lost / pre-pin dir): refuse to adopt —
    # writing a fresh manifest would certify stale files as matching
    (d_emb / 'embeddings_manifest.json').unlink()
    with pytest.raises(ValueError, match='no\\s+embeddings_manifest'):
        ec.embed_directory(str(d_audio), str(d_emb), modelname='em',
                           framehop_prop=1.0)
    # the refusal must not have installed a manifest either
    assert not (d_emb / 'embeddings_manifest.json').exists()


def test_dispatch_slope_arg_guards():
    """dispatch_slope rejects degenerate n_long (zero/negative slope
    denominator) and single-input lists (identical dispatches dedup on the
    tunneled runtime, collapsing the slope)."""
    import pytest
    from buzzdetect_tpu.utils import dispatch_slope

    fn = np.asarray
    with pytest.raises(ValueError, match='n_long'):
        dispatch_slope(fn, [np.zeros(4), np.ones(4)], n_long=2)
    with pytest.raises(ValueError, match='distinct inputs'):
        dispatch_slope(fn, [np.zeros(4)], n_long=8)
    # the valid shape still works end to end (host fn, tiny arrays)
    best, med, worst = dispatch_slope(fn, [np.zeros(4), np.ones(4)],
                                      n_long=4, trials=2)
    assert best <= med <= worst


def test_threshold_calibration_empty_table_raises_cleanly(tmp_path,
                                                          monkeypatch):
    """A header-only metrics.csv (evaluation found no usable rows) must
    produce the real diagnostic, not a zero-size-reduction crash from the
    error message's own min()/max()."""
    import pytest
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.write.thresholds import (calculate_threshold,
                                                 threshold_at_precision)
    d = tmp_path / 'models' / 'emx' / 'tests'
    d.mkdir(parents=True)
    (d / 'metrics.csv').write_text('threshold,precision,sensitivity,fpr\n')
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(tmp_path / 'models'))
    with pytest.raises(ValueError, match='no rows'):
        calculate_threshold('emx', 0.95)
    with pytest.raises(ValueError):
        threshold_at_precision('emx', 0.95)


def test_threshold_at_precision_reports_achieved_when_clamped(tmp_path,
                                                              monkeypatch):
    """Requesting a precision past the table's top must report the edge
    row's MEASURED precision, not echo back an unachieved request."""
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.write.thresholds import threshold_at_precision
    d = tmp_path / 'models' / 'emy' / 'tests'
    d.mkdir(parents=True)
    (d / 'metrics.csv').write_text(
        'threshold,precision,sensitivity,fpr\n'
        '-1.0,0.90,0.5,0.1\n'
        '0.0,0.95,0.3,0.05\n')
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(tmp_path / 'models'))
    out = threshold_at_precision('emy', 0.999)
    assert out['precision'] == 0.95  # the model was only measured to 0.95
    assert out['threshold'] == 0.0


def test_embed_directory_chunk_grid_and_fault_containment(tmp_path,
                                                          monkeypatch):
    """Chunk boundaries round to whole frames (no padding-contaminated
    boundary embeddings, uniform start grid), and one corrupt file must
    not abort the rest of the corpus."""
    from buzzdetect_tpu import config as cfg
    from buzzdetect_tpu.models.convert import build_model_bundle
    from buzzdetect_tpu.train.embed_corpus import (embed_directory,
                                                   load_embeddings)
    from tests.audio_fixtures import make_tone, write_wav

    dir_models = tmp_path / 'models'
    build_model_bundle(str(dir_models / 'em'), classes=['a', 'b'], seed=1)
    monkeypatch.setattr(cfg, 'DIR_MODELS', str(dir_models))

    dir_audio = tmp_path / 'audio'
    dir_audio.mkdir()
    write_wav(dir_audio / 'good.wav', make_tone(4.0, 16000), 16000)
    (dir_audio / 'corrupt.wav').write_bytes(b'not audio' * 1000)  # > 5 KB
    (dir_audio / 'tiny.wav').write_bytes(b'RIFF')  # below size minimum

    logs = []
    out = tmp_path / 'emb'
    written = embed_directory(str(dir_audio), str(out), modelname='em',
                              chunklength=2.0, log=logs.append)
    # the good file embedded despite the corrupt sibling
    assert len(written) == 1 and written[0].endswith('good_embeddings.npz')
    assert any('ERROR' in m and 'corrupt' in m for m in logs)
    assert any('tiny' in m and 'skipping' in m for m in logs)
    # 2.0 s chunks round to 1.92 s: the start grid stays on one uniform
    # 0.96 s stride across every chunk boundary
    starts, emb = load_embeddings(written[0])
    np.testing.assert_allclose(np.diff(starts), 0.96, atol=1e-6)
    assert starts[0] == 0.0 and starts[-1] >= 3.8 - 0.96


def test_full_train_checkpoint_resume_bit_identical(tmp_path):
    """Kill-anytime resumability, extended to training: interrupt a full
    fine-tune after 2 of 4 epochs, resume from the checkpoint, and land on
    BIT-identical parameters and loss history (state includes the shuffle
    rng, so the resumed run replays the exact batches)."""
    from buzzdetect_tpu.train.clips import train_full_model
    rng = np.random.default_rng(5)
    clips = (rng.standard_normal((6, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((6, 2)) > 0.5).astype(np.float32)
    kw = dict(batch_size=3, learning_rate=1e-3, log=lambda *_: None)

    raw_gold, head_gold, losses_gold = train_full_model(
        clips, labels, epochs=4, **kw)

    ckpt = str(tmp_path / 'work')
    # "interrupted" run: stops after 2 epochs, leaving a checkpoint
    train_full_model(clips, labels, epochs=2, checkpoint_dir=ckpt, **kw)
    assert os.path.exists(os.path.join(ckpt, 'finetune_ckpt.npz'))
    # resumed run: must pick up at epoch 2 and finish identically
    raw, head, losses = train_full_model(
        clips, labels, epochs=4, checkpoint_dir=ckpt, **kw)

    assert losses == losses_gold
    for k in raw_gold:
        np.testing.assert_array_equal(raw[k], raw_gold[k], err_msg=k)
    for k in head_gold:
        np.testing.assert_array_equal(head[k], head_gold[k], err_msg=k)


def test_train_checkpoint_rejects_foreign_state(tmp_path):
    """A checkpoint from a different run (changed seed/dataset), a torn
    file, or arbitrary garbage must be IGNORED (train fresh), never
    half-loaded."""
    from buzzdetect_tpu.train.clips import train_full_model
    rng = np.random.default_rng(5)
    clips = (rng.standard_normal((4, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((4, 2)) > 0.5).astype(np.float32)
    kw = dict(batch_size=2, learning_rate=1e-3, log=lambda *_: None)

    ckpt = str(tmp_path / 'work')
    train_full_model(clips, labels, epochs=1, seed=0,
                     checkpoint_dir=ckpt, **kw)
    path = os.path.join(ckpt, 'finetune_ckpt.npz')
    assert os.path.exists(path)

    gold_raw, _, gold_losses = train_full_model(clips, labels, epochs=1,
                                                seed=1, **kw)
    # different seed: the epoch-1 state on disk must not be adopted
    raw, _, losses = train_full_model(clips, labels, epochs=1, seed=1,
                                      checkpoint_dir=ckpt, **kw)
    assert losses == gold_losses
    for k in gold_raw:
        np.testing.assert_array_equal(raw[k], gold_raw[k], err_msg=k)

    # garbage file: ignored, not crashed on
    with open(path, 'wb') as f:
        f.write(b'not an npz at all')
    raw, _, losses = train_full_model(clips, labels, epochs=1, seed=1,
                                      checkpoint_dir=ckpt, **kw)
    assert losses == gold_losses


def test_train_checkpoint_ahead_of_requested_epochs_trains_fresh(tmp_path):
    """A leftover checkpoint from a LONGER completed run must not be
    returned as if it were the shorter requested run."""
    from buzzdetect_tpu.train.clips import train_full_model
    rng = np.random.default_rng(5)
    clips = (rng.standard_normal((4, 15600)) * 0.1).astype(np.float32)
    labels = (rng.random((4, 2)) > 0.5).astype(np.float32)
    kw = dict(batch_size=2, learning_rate=1e-3, seed=0,
              log=lambda *_: None)

    ckpt = str(tmp_path / 'work')
    train_full_model(clips, labels, epochs=3, checkpoint_dir=ckpt, **kw)
    gold_raw, _, gold_losses = train_full_model(clips, labels, epochs=1,
                                                **kw)
    raw, _, losses = train_full_model(clips, labels, epochs=1,
                                      checkpoint_dir=ckpt, **kw)
    assert losses == gold_losses  # 1 epoch of losses, not 3
    for k in gold_raw:
        np.testing.assert_array_equal(raw[k], gold_raw[k], err_msg=k)


def test_trim_skips_nonfinite_and_keeps_original(tmp_path):
    """A CSV holding a NaN/inf activation must be skipped+reported, never
    quantized (int casts of NaN are undefined — x86 yields INT_MIN, which
    would read back as -2e8) — and its original must survive even with
    remove_original=True."""
    from buzzdetect_tpu.write.trim import trim_directory
    d = tmp_path / 'res'
    d.mkdir()
    with open(d / 'ok_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n0.0,-1.2\n0.96,-1.0\n')
    with open(d / 'bad_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n0.0,nan\n0.96,-1.0\n')
    skipped = []
    n, _before, _after = trim_directory(
        str(d), classes_keep=('ins_buzz',), remove_original=True,
        on_skip=lambda p, why: skipped.append((p, why)))
    assert n == 1
    assert len(skipped) == 1 and 'non-finite' in skipped[0][1]
    assert (d / 'bad_buzzdetect.csv').exists(), \
        'remove_original deleted the un-archived truth'
    assert not (d / 'ok_buzzdetect.csv').exists()
    assert (d / 'ok_buzztrim.npz').exists()
    assert not (d / 'bad_buzztrim.npz').exists()


def test_embed_file_reads_streamer_sample_spans(tmp_path):
    """embed_file must read EXACTLY int(t1*rate)-int(t0*rate) samples per
    chunk (the streamer's span math, runtime/streamer.py queue_chunk):
    int((t1-t0)*rate) loses one sample on non-frame-aligned final chunks
    (5 s at chunklength 2.0 -> (3.84, 5.0): 18559 vs 18560), silently
    zero-padding the final patch relative to analyze()."""
    from buzzdetect_tpu.train.embed_corpus import embed_file
    from tests.audio_fixtures import make_tone, write_wav

    # 1.13 s is a found counterexample: final chunk (0.96, 1.13) gives
    # int((1.13-0.96)*16000) = 2719 but int(1.13*16000)-int(0.96*16000)
    # = 2720 — float subtraction rounds DOWN across the boundary here
    wav = tmp_path / 'odd.wav'
    write_wav(wav, make_tone(1.13, 16000), 16000)

    class Cfg:
        patch_window_seconds = 0.96
        patch_hop_seconds = 0.96
        sample_rate = 16000

    reads = []

    class Capturing:
        cfg = Cfg()

        def embed(self, samples):
            reads.append(len(samples))
            return np.zeros((max(1, len(samples) // 15360), 1024),
                            np.float32)

    embed_file(Capturing(), str(wav), chunklength=0.96)
    assert reads == [15360, 2720], \
        f'chunk sample spans diverge from the streamer: {reads}'


def test_trim_directory_failed_write_leaves_no_tmp_debris(tmp_path,
                                                          monkeypatch):
    """A savez that dies mid-write (disk full on a season-scale batch)
    must remove its half-written temp archive — leaving it would consume
    exactly the space the trim run exists to reclaim — and must not
    remove the original CSV."""
    from buzzdetect_tpu.write import trim as trim_mod

    d = tmp_path / 'results'
    d.mkdir()
    with open(d / 'x_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n0.0,-1.2\n')

    def boom(path, **arrays):
        with open(path, 'wb') as fh:
            fh.write(b'half-written')
        raise OSError(28, 'No space left on device')

    monkeypatch.setattr(trim_mod.np, 'savez_compressed', boom)
    skips = []
    n, _b, _a = trim_mod.trim_directory(
        str(d), remove_original=True,
        on_skip=lambda path, why: skips.append((path, why)))
    assert n == 0 and len(skips) == 1
    assert 'No space left' in skips[0][1]
    leftovers = [f for f in os.listdir(d) if f != 'x_buzzdetect.csv']
    assert not leftovers, f'debris left behind: {leftovers}'
    assert (d / 'x_buzzdetect.csv').exists()


def test_trim_results_cli_all_skipped_is_a_data_error(tmp_path):
    """CSVs found but every one skipped (non-finite activations): the tool
    must say so — claiming 'no finalized CSVs' would send the operator
    chasing a path problem instead of the data problem already reported."""
    import subprocess
    import sys as _sys
    tool = os.path.join(os.path.dirname(__file__), '..', 'tools',
                        'trim_results.py')
    d = tmp_path / 'results'
    d.mkdir()
    with open(d / 'bad_buzzdetect.csv', 'w') as f:
        f.write('start,activation_ins_buzz\n0.0,nan\n')
    proc = subprocess.run(
        [_sys.executable, tool, '--dir_results', str(d)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0
    assert 'skipping' in proc.stderr and 'non-finite' in proc.stderr
    assert 'were skipped' in proc.stderr
    assert 'no finalized' not in proc.stderr
